"""pylluminator_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of eliopato/pylluminator.

The reference (`/root/reference/`) is a pandas/numpy library for Illumina
DNA-methylation microarray analysis. This package re-expresses its semantics
as Spark DataFrame pipelines designed for multi-executor, 100 TB-scale
execution:

- **Long/tidy data model** — the reference's 2-D MultiIndex pivot
  (reference samples.py:554) becomes a long ``signal`` fact table; every
  per-(sample, probe) kernel is a column expression or a grouped pandas UDF.
- **Catalyst-first** — filters/joins/aggregations are declarative; dimension
  tables (manifest, sample sheet) are broadcast; range joins are bucketed.
- **Immutability** — the reference mutates ``_signal_df`` in place
  (samples.py:1116-1120 cache invalidation); here every transform returns a
  new DataFrame and caching is explicit.

Subpackages:
    sources       IDAT binary scan, sample sheets, manifest ETL
    operators     selectors, masks, range joins, dedup, similarity search
    functions     scalar/aggregate expression helpers (methyl, stats, text, genomic)
    plans         session/lineage management (MethylSession)
    streaming     Structured Streaming surface over event tables
"""

__version__ = "0.1.0"

from pylluminator_spark.session import get_spark  # noqa: F401
