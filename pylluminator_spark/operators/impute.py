"""Missing-value imputation: per-group mean / median / mode / constant.

Beyond-reference operator (driver north star): feature pipelines impute
before training; the scale constraint is that fill values come from ONE
statistics pass (grouped or global) joined back — never a collect of the
data. Strategies:

- ``mean``: exact integer-scaled sum / count (deterministic, no float
  accumulation drift), descaled at the edge;
- ``median``: exact ``percentile(0.5)`` (Spark's exact-interpolation
  aggregate — runs per GROUP, bounded by group size; switch to
  approx_percentile explicitly for giant single groups);
- ``mode``: most frequent value, ties to the smallest (deterministic,
  via ``min_by`` on (-count, value));
- ``("constant", value)``: a literal.

The mean/median stats table is group-cardinality-sized and broadcast
back onto the data; mode adds one per-(group, value) count pass. Each
imputed column gains a ``<col>_imputed`` flag; groups with no observed
value keep their NULLs.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def impute(
    df: DataFrame,
    strategies: Mapping[str, object],
    *,
    group_cols: Sequence[str] = (),
    scale: int = 10**6,
) -> DataFrame:
    """Fill NULLs per ``strategies`` — a mapping column -> ``"mean"`` |
    ``"median"`` | ``"mode"`` | ``("constant", value)``."""
    gcols = list(group_cols)
    out = df

    simple_aggs = []
    for col, strat in strategies.items():
        c = F.col(col)
        if strat == "mean":
            simple_aggs.append(
                (
                    F.sum(F.round(c * scale).cast("long"))
                    / F.count(c)
                    / scale
                ).alias(f"_fill_{col}")
            )
        elif strat == "median":
            simple_aggs.append(
                F.expr(f"percentile({col}, 0.5)").alias(f"_fill_{col}")
            )
        elif strat == "mode" or (
            isinstance(strat, tuple) and strat[0] == "constant"
        ):
            continue
        else:
            raise ValueError(
                f"impute: unknown strategy {strat!r} for {col}"
            )

    if simple_aggs:
        stats = (
            df.groupBy(*gcols).agg(*simple_aggs)
            if gcols
            else df.agg(*simple_aggs)
        )
        out = (
            out.join(F.broadcast(stats), gcols, "left")
            if gcols
            else out.crossJoin(F.broadcast(stats))
        )

    for col, strat in strategies.items():
        if strat != "mode":
            continue
        counts = (
            df.where(F.col(col).isNotNull())
            .groupBy(*gcols, col)
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        pick = counts.groupBy(*gcols).agg(
            F.expr(
                f"min_by({col}, named_struct('negn', -_n, 'v', {col}))"
            ).alias(f"_fill_{col}")
        )
        out = (
            out.join(F.broadcast(pick), gcols, "left")
            if gcols
            else out.crossJoin(F.broadcast(pick))
        )

    for col, strat in strategies.items():
        c = F.col(col)
        if isinstance(strat, tuple):
            fill = F.lit(strat[1])
        else:
            fill = F.col(f"_fill_{col}")
        out = out.withColumn(
            f"{col}_imputed", c.isNull() & fill.isNotNull()
        ).withColumn(col, F.coalesce(c, fill))

    return out.drop(
        *[f"_fill_{c}" for c, s in strategies.items() if not isinstance(s, tuple)]
    )


def winsorize(
    df: DataFrame,
    value_cols: Sequence[str],
    *,
    group_cols: Sequence[str] = (),
    lower: float = 0.01,
    upper: float = 0.99,
    flag: bool = True,
) -> DataFrame:
    """Winsorization (percentile clipping): clamp each column into its
    per-group [``lower``, ``upper``] exact-percentile band — the
    standard outlier treatment before robust statistics / model
    features. Same scale shape as ``impute``: ONE grouped statistics
    pass (Spark's exact ``percentile`` with linear interpolation, per
    group — bounded by group size; substitute ``approx_quantiles`` for
    giant single groups), broadcast back, then a pure codegen
    ``least/greatest`` clamp — no second shuffle, no collect.

    NULLs pass through (nothing to clamp). ``flag`` adds a
    ``<col>_winsorized`` boolean marking clamped rows."""
    gcols = list(group_cols)
    stats = df.groupBy(*gcols).agg(
        *[
            F.expr(
                f"percentile({c}, array({lower}, {upper}))"
            ).alias(f"_b_{c}")
            for c in value_cols
        ]
    )
    # LEFT join (as impute does): a NULL group key must not drop the row
    # — unmatched rows get NULL bounds, and least/greatest skip NULL, so
    # they pass through unclamped with flag=False
    joined = (
        df.join(F.broadcast(stats), gcols, "left")
        if gcols
        else df.crossJoin(F.broadcast(stats))
    )
    out_cols = [c for c in df.columns]
    proj = [F.col(c) for c in df.columns]
    for c in value_cols:
        lo = F.element_at(f"_b_{c}", 1)
        hi = F.element_at(f"_b_{c}", 2)
        v = F.col(c).cast("double")
        clamped = F.when(
            v.isNull(), F.lit(None).cast("double")
        ).otherwise(F.least(F.greatest(v, lo), hi))
        proj[out_cols.index(c)] = clamped.alias(c)
        if flag:
            proj.append(
                F.coalesce((v < lo) | (v > hi), F.lit(False)).alias(
                    f"{c}_winsorized"
                )
            )
    return joined.select(*proj)


def robust_zscore(
    df: DataFrame,
    value_cols: Sequence[str],
    *,
    group_cols: Sequence[str] = (),
    scale_factor: float = 1.4826,
    suffix: str = "_rz",
) -> DataFrame:
    """Median/MAD robust standardization: per group,
    ``rz = (x - median) / (scale_factor * MAD)`` with
    ``MAD = median(|x - median|)`` — the outlier score that survives the
    outliers themselves (mean/std breaks down past 50% contamination;
    1.4826 makes MAD consistent for a normal distribution).

    TWO grouped exact-percentile passes (medians, then abs-deviation
    medians over the median-joined stream), each a broadcast-back stats
    table — the winsorize/impute scale shape doubled; the data never
    collects and the final score is pure codegen. Groups with MAD == 0
    (a majority-constant column) yield NULL scores rather than a
    division error; NULL values pass through as NULL scores."""
    gcols = list(group_cols)
    med = df.groupBy(*gcols).agg(
        *[
            F.expr(f"percentile({c}, 0.5)").alias(f"_med_{c}")
            for c in value_cols
        ]
    )
    # LEFT joins throughout (the winsorize rule): NULL group keys must
    # not drop rows — they surface as NULL scores instead
    j1 = (
        df.join(F.broadcast(med), gcols, "left")
        if gcols
        else df.crossJoin(F.broadcast(med))
    )
    mad = j1.groupBy(*gcols).agg(
        *[
            F.expr(
                f"percentile(abs({c} - _med_{c}), 0.5)"
            ).alias(f"_mad_{c}")
            for c in value_cols
        ]
    )
    j2 = (
        j1.join(F.broadcast(mad), gcols, "left")
        if gcols
        else j1.crossJoin(F.broadcast(mad))
    )
    proj = [F.col(c) for c in df.columns]
    for c in value_cols:
        denom = F.lit(scale_factor) * F.col(f"_mad_{c}")
        rz = (F.col(c).cast("double") - F.col(f"_med_{c}")) / F.nullif(
            denom, F.lit(0.0)
        )
        proj.append(rz.alias(f"{c}{suffix}"))
    return j2.select(*proj)
