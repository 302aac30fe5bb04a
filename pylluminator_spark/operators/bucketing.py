"""Bucketed-table helpers: shuffle-free co-located joins (100 TB scale path).

Every probe-keyed join in the engine (signal ⨝ betas, betas ⨝ dmp, masks ⨝
signal) shuffles both sides on ``probe_id`` unless the tables were written
pre-partitioned on that key. Hive-style bucketing persists the hash
partitioning with the data: two tables bucketed by the same key into the
same bucket count sort-merge-join WITHOUT exchanging either side — at 100 TB
that deletes the two largest shuffles in the pipeline. (On a real deployment
the saveAsTable metastore is durable; in local tests it's the
session-scoped in-memory catalog + a warehouse dir.)

The reference has no analogue — single-process pandas never pays a shuffle —
so this module is pure Spark physical design, cited to SURVEY §4's "what
needs custom work" list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 32


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | list[str],
    num_buckets: int = DEFAULT_BUCKETS,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) managed table."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *cols)
    if sort_cols is not None:
        s = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        writer = writer.sortBy(*s)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; Catalyst picks up the bucket spec from the
    catalog, so joins/aggregations on the bucket key skip their Exchange."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — verifiably
    exchange-free (see tests/test_bucketing.py, which asserts the physical
    plan contains no Exchange on either side)."""
    return read_bucketed(spark, left_table).join(
        read_bucketed(spark, right_table), on, how
    )
