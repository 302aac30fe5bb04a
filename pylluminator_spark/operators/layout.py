"""Physical data layout for scan pruning: Z-order (Morton) clustering and
per-file zone maps.

Beyond-reference operators (driver north star): at 100 TB the cheapest
query is the one that never reads most files. Two standard layout tools:

- **Z-ordering**: interleave the bits of several columns into one Morton
  key and range-partition + sort on it, so every output file covers a
  small hyper-rectangle of the key space. Min/max footer stats on ANY of
  the z-ordered columns then prune multi-dimensionally — the same layout
  trick Delta/Iceberg `OPTIMIZE ZORDER BY` applies. The key is pure
  integer bit arithmetic (shift/and/or), whole-stage codegen, and the
  clustering itself is one `repartitionByRange` + within-partition sort —
  exactly one shuffle.
- **Zone maps**: the per-file (min, max, count) stats table over selected
  columns — one aggregation keyed on `input_file_name()` — that a query
  planner (or an auditor checking whether z-ordering worked) reads
  instead of the data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(cols: Sequence[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integer)
    column into one Morton/Z-order key: bit i of column j lands at
    position ``i * len(cols) + j``. Total bits must fit a long.

    Pure shift/and/or expression — whole-stage codegen, no UDF.
    """
    if not cols:
        raise ValueError("morton_key needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"{bits} bits x {len(cols)} cols exceeds a 63-bit key"
        )
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, i * len(cols) + j))
    return key


def normalize_to_bits(
    col: Column, lo: Column | float, hi: Column | float, bits: int
) -> Column:
    """Map a numeric column onto the integer grid [0, 2^bits) by min/max
    scaling (values at ``hi`` land on the top cell; a degenerate
    ``lo == hi`` range maps everything to 0)."""
    cells = (1 << bits) - 1
    lo_c = lo if isinstance(lo, Column) else F.lit(float(lo))
    hi_c = hi if isinstance(hi, Column) else F.lit(float(hi))
    span = hi_c - lo_c
    scaled = F.floor(
        (col.cast("double") - lo_c) / F.nullif(span, F.lit(0)) * cells
    )
    return F.coalesce(
        F.least(F.greatest(scaled, F.lit(0)), F.lit(cells)), F.lit(0)
    ).cast("long")


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    *,
    bits: int = 16,
    num_partitions: int | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Cluster ``df`` for multi-dimensional scan pruning: min/max-scan the
    layout columns once (one tiny aggregate), normalize each onto a
    ``bits``-bit grid, Morton-interleave, then ``repartitionByRange`` +
    ``sortWithinPartitions`` on the key so each output file covers a
    compact hyper-rectangle. Write the result partition-preserving
    (``.write.parquet``) to materialize the layout.

    ``key_col`` keeps the key as a named column (for inspection); default
    drops it. One shuffle total; the stats scan reads only ``cols``.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
            F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
        ]
    stats = df.agg(*aggs).collect()[0]
    parts = [
        normalize_to_bits(
            F.col(c), stats[f"_lo_{c}"], stats[f"_hi_{c}"], bits
        )
        for c in cols
    ]
    keyed = df.withColumn("_zkey", morton_key(parts, bits))
    if num_partitions:
        keyed = keyed.repartitionByRange(num_partitions, "_zkey")
    else:
        keyed = keyed.repartitionByRange("_zkey")
    out = keyed.sortWithinPartitions("_zkey")
    if key_col:
        return out.withColumnRenamed("_zkey", key_col)
    return out.drop("_zkey")


def zone_map(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-file (count, min, max per column) stats over a file-backed
    DataFrame — the table a planner prunes with, and the audit artifact
    that shows whether a layout pass worked (small per-file ranges =>
    prunable). One aggregation keyed on ``input_file_name()``."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        ]
    return (
        df.withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(*aggs)
        .withColumnRenamed("_file", "file")
    )


def zone_prune_fraction(
    zones: DataFrame, col: str, lo, hi
) -> DataFrame:
    """One-row pruning audit: of all files in a ``zone_map`` result, how
    many could be skipped for the predicate ``col BETWEEN lo AND hi``
    (their [min, max] range misses the interval), and what fraction of
    rows that saves."""
    overlaps = (F.col(f"max_{col}") >= F.lit(lo)) & (
        F.col(f"min_{col}") <= F.lit(hi)
    )
    return zones.agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum((~overlaps).cast("long")).alias("n_files_skipped"),
        F.round(
            F.sum(F.when(~overlaps, F.col("n_rows")).otherwise(0))
            / F.sum("n_rows"),
            4,
        ).alias("row_fraction_skipped"),
    )
