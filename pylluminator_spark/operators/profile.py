"""One-pass table profiling: the "what is in this corpus" primitive every
large-scale data pipeline runs before and after each transformation stage
(row counts, null rates, cardinalities, value ranges per column).

Scale design: ALL statistics for ALL requested columns come from a single
aggregation over one scan — 4 expressions per column, partial (map-side)
combine throughout, one 1-row result unpivoted driver-side to the long
(col_name, stat...) shape. ``countDistinct`` is exact (Spark expands it to
an expand+two-phase aggregate); pass ``approx=True`` to swap in HLL
``approx_count_distinct`` when the corpus is 100 TB and +-2% is fine —
that keeps the profile a true single pass with bounded memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    approx: bool = False,
) -> DataFrame:
    """Profile ``columns`` (default: all) into a long DataFrame
    ``(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)``;
    min/max are rendered as strings so heterogeneous column types share one
    schema."""
    cols = columns or df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs += [
            # coalesce: SUM over zero rows is NULL, but "no rows" means
            # zero nulls, not unknown
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0)
            ).alias(f"_nulls_{c}"),
            distinct(c).alias(f"_dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs)
    # unpivot the single stats row to long form — a per-column stack over a
    # 1-row input, not a data operation
    parts = []
    for c in cols:
        parts.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n_rows").alias("n_rows"),
                F.col(f"_nulls_{c}").alias("n_nulls"),
                F.col(f"_dist_{c}").cast("long").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
        )
    return row.select(
        F.explode(F.array(*parts)).alias("_p")
    ).select("_p.*")


def numeric_histogram(
    df: DataFrame,
    column: str,
    bins: int = 20,
    *,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Fixed-width histogram of a numeric column: (bin, lo_edge, hi_edge,
    n_rows). Two scans when the range is not given (one min/max aggregate,
    then the bucketed count) or ONE when ``lo``/``hi`` are passed — both
    are plain hash aggregates with map-side combine, no sort, no collect
    of values.

    Bucketing matches ANSI ``width_bucket`` semantics: ``bins`` equal
    intervals over [lo, hi); values equal to ``hi`` fall in the last bin,
    values outside [lo, hi] are clamped to the edge bins (so the counts
    always sum to the row count). NULLs are excluded.
    """
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    col = F.col(column).cast("double")
    if lo is None or hi is None:
        row = df.agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        ).collect()[0]
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if not hi > lo:
        hi = lo + 1.0  # degenerate single-value column: one bin holds all
    width = (hi - lo) / bins
    raw = F.floor((col - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))
    return (
        df.filter(col.isNotNull())
        .groupBy(bin_.cast("long").alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("lo_edge"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("hi_edge"),
            "n_rows",
        )
    )
