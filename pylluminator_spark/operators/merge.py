"""Sample / probe merging operators (SURVEY §2.4 A2-A4).

Reference semantics:

- ``merge_samples_by`` — samples.py:604-664: group samples by a sample-sheet
  column and average their signal (per signal cell) and beta values; the
  sheet itself collapses via the type-dispatched ``merge_dataframe_by``.
- ``remove_probes_suffix`` — samples.py:666-697 + utils.py:126-141: strip
  the trailing ``_``-part of each probe id and average duplicate probes.
- ``merge_dataframe_by`` — utils.py:516-564: per-column type dispatch —
  numeric -> mean, string -> ``;``-join of non-empty distinct values,
  boolean -> any/all, all-NULL group -> NULL.

Spark-first shape: every merge is a hash aggregation on the grouping key
(map-side partial agg, no window, no collect); the sample-sheet join is a
broadcast. Divergence from the reference (documented): distinct strings are
joined in SORTED order — the reference keeps first-appearance order, which
is nondeterministic under shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROBE_KEYS = ["type", "channel", "probe_type", "probe_id"]
SIGNAL_CELLS = ["mg", "mr", "ug", "ur"]


def strip_probe_suffix_expr(probe_id) -> F.Column:
    """Drop the last ``_``-separated part of a probe id (no-op when the id
    has no underscore) — reference utils.py:126-141."""
    col = F.col(probe_id) if isinstance(probe_id, str) else probe_id
    return F.regexp_replace(col, "_[^_]*$", "")


def merge_samples_by(
    signal: DataFrame,
    sheet: DataFrame,
    by: str,
    sample_col: str = "sample",
    cells: list[str] | None = None,
) -> DataFrame:
    """A2 — average signal cells across the samples of each sheet group
    (reference samples.py:604-664). Returns a signal table whose
    ``sample`` column now holds the group value.

    The sheet is dimension-sized and broadcast; the aggregation shuffles
    once on (probe keys, group) with map-side combine. NULL cells are
    skipped (``avg`` ignores nulls), matching the reference's NaN-skipping
    mean over masked values.
    """
    cells = cells or [c for c in SIGNAL_CELLS if c in signal.columns]
    mapping = F.broadcast(
        sheet.select(F.col(sample_col), F.col(by).alias("_grp")).na.drop(
            subset=["_grp"]
        )
    )
    keys = [c for c in PROBE_KEYS if c in signal.columns]
    return (
        signal.join(mapping, sample_col)
        .groupBy(*keys, F.col("_grp").alias(sample_col))
        .agg(*[F.avg(c).alias(c) for c in cells])
    )


def merge_betas_by(
    betas: DataFrame,
    sheet: DataFrame,
    by: str,
    sample_col: str = "sample",
    beta_col: str = "beta",
) -> DataFrame:
    """A2 (betas flavor) — average beta values per sheet group
    (reference samples.py:649-650)."""
    mapping = F.broadcast(
        sheet.select(F.col(sample_col), F.col(by).alias("_grp")).na.drop(
            subset=["_grp"]
        )
    )
    return (
        betas.join(mapping, sample_col)
        .groupBy("probe_id", F.col("_grp").alias(sample_col))
        .agg(F.avg(beta_col).alias(beta_col))
    )


def remove_probes_suffix(
    signal: DataFrame, cells: list[str] | None = None
) -> DataFrame:
    """A3 — strip probe-id suffixes and average the resulting duplicate
    probes (reference samples.py:666-697).

    The reference splits duplicated vs unique rows and concatenates; on
    Spark a single groupBy over the stripped id is the same result with one
    shuffle (unique probes form singleton groups — avg of one value is the
    value)."""
    cells = cells or [c for c in SIGNAL_CELLS if c in signal.columns]
    keys = [c for c in PROBE_KEYS if c in signal.columns]
    extra = [c for c in signal.columns if c not in keys + cells]
    stripped = signal.withColumn("probe_id", strip_probe_suffix_expr("probe_id"))
    return stripped.groupBy(*keys, *extra).agg(
        *[F.avg(c).alias(c) for c in cells]
    )


def merge_dataframe_by(
    df: DataFrame, by: str | list[str], bool_how: str = "any"
) -> DataFrame:
    """A4 — type-dispatched per-column merge (reference utils.py:516-564).

    numeric -> mean; string -> ';'-join of non-empty distinct values
    (sorted for determinism; NULL when the group has none); boolean ->
    any/all; arrays -> sorted distinct union.
    """
    group = [by] if isinstance(by, str) else list(by)
    aggs = []
    for name, dtype in df.dtypes:
        if name in group:
            continue
        c = F.col(f"`{name}`")
        if dtype in ("string",):
            lst = F.array_sort(
                F.array_distinct(
                    F.collect_list(F.when(c != "", c))
                )
            )
            agg = F.when(F.size(lst) > 0, F.array_join(lst, ";")).otherwise(
                F.lit(None)
            )
        elif dtype == "boolean":
            agg = F.bool_or(c) if bool_how == "any" else F.bool_and(c)
        elif dtype.startswith("array"):
            lst = F.array_sort(F.array_distinct(F.flatten(F.collect_list(c))))
            agg = F.when(F.size(lst) > 0, lst)
        else:
            agg = F.avg(c)
        aggs.append(agg.alias(name))
    return df.groupBy(*[F.col(f"`{g}`") for g in group]).agg(*aggs)
