"""Array-type autodetection (S7 gap, reference annotations.py:360-397).

The reference infers the Illumina array generation from the probe count of
each sample's IDAT pair. Same count bands here, expressed twice: a scalar
helper for driver-side use, and a pure Spark CASE expression so the
distributed variant is one hash aggregation + codegen'd projection — no
Python in the per-sample path, and the idat fact table is never collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: reference annotations.py:105-120 — enum value strings
ARRAY_TYPES = (
    "HM27",
    "HM450",
    "MSA",
    "EPIC",
    "EPIC+",
    "EPICv2",
    "MM285",
    "Mammal40",
)

#: (lo, hi, type) count bands, reference annotations.py:360-397. Bounds are
#: inclusive-exclusive normalized from the reference's mixed comparisons.
_BANDS: tuple[tuple[int, int, str], ...] = (
    (1_070_001, 1_200_000, "EPICv2"),
    (1_053_001, 1_070_000, "EPIC+"),
    (1_050_000, 1_053_000, "EPIC"),
    (622_000, 623_000, "HM450"),
    (370_000, 400_000, "MSA"),
    (315_000, 362_000, "MM285"),
    (54_000, 56_000, "HM27"),
    (35_000, 45_000, "Mammal40"),
)

#: the reference's fallback when no band matches (mixed/unknown inputs)
DEFAULT_ARRAY_TYPE = "EPICv2"


def detect_array(probe_count: int) -> str:
    """Scalar band lookup (reference annotations.py:360-397 exactly)."""
    for lo, hi, name in _BANDS:
        if lo <= probe_count <= hi:
            return name
    return DEFAULT_ARRAY_TYPE


def array_type_expr(count_col: str = "probe_count") -> F.Column:
    """The same band lookup as a codegen'd CASE expression."""
    c = F.col(count_col)
    expr = F.lit(DEFAULT_ARRAY_TYPE)
    for lo, hi, name in reversed(_BANDS):
        expr = F.when((c >= lo) & (c <= hi), F.lit(name)).otherwise(expr)
    return expr


def detect_array_types(
    idata: DataFrame, id_col: str = "illumina_id", sample_col: str = "sample"
) -> DataFrame:
    """Per-sample array-type inference from the long idata table: one
    distributed count-distinct per sample, then the band expression.

    Returns (sample, probe_count, array_type). At 100 TB this is a single
    partial-aggregated shuffle on the sample key (samples are few; counts
    are per-sample scalars).
    """
    return (
        idata.groupBy(sample_col)
        .agg(F.count_distinct(F.col(id_col)).alias("probe_count"))
        .withColumn("array_type", array_type_expr("probe_count"))
    )


def consensus_array_type(idata: DataFrame) -> str:
    """Majority array type across samples (ties broken by most-recent =
    later in ARRAY_TYPES), mirroring the reference's one-type-per-Samples
    assumption with a deterministic resolution for mixed inputs."""
    counts = detect_array_types(idata).groupBy("array_type").count().collect()
    if not counts:
        return DEFAULT_ARRAY_TYPE
    # recency order, non-human arrays lowest (the reference's fallback
    # philosophy is "most recent human type")
    recency = ("MM285", "Mammal40", "HM27", "HM450", "EPIC", "EPIC+", "MSA", "EPICv2")
    rank = {name: i for i, name in enumerate(recency)}
    return max(
        counts, key=lambda r: (r["count"], rank.get(r["array_type"], -1))
    )["array_type"]
