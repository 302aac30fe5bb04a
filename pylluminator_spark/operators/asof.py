"""As-of (temporal) join — beyond-reference operator (driver north star).

For each left row, attach the most recent right row with the same key whose
time is <= (backward) or >= (forward) the left time — the trades/quotes,
feature-snapshot-at-event-time primitive.

Spark-first shape (no per-key loops, no broadcast requirement): UNION the
two sides with a side tag, then one window per key ordered by
(time, side-tag) taking ``last(right value, ignorenulls=True)`` over the
preceding frame. One shuffle on the key; per-task state is one row of
carried right-values per partition stream. Works at any key cardinality —
a hot key degrades to that key's row count in one task, the same bound as
any windowed computation, and AQE skew handling applies to the shuffle.

Not in the reference (SURVEY §2.3: "Not present ... as-of joins"); this is
part of the training-data-pipeline surface alongside dedup/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str = "ts",
    right_time: str = "ts",
    value_cols: list[str] | None = None,
    direction: str = "backward",
    suffix: str = "_asof",
    strict: bool = False,
) -> DataFrame:
    """Backward/forward as-of join.

    ``value_cols``: right-side columns to carry (default: all non-key,
    non-time columns). ``strict=True`` excludes equal timestamps
    (``<`` / ``>`` instead of ``<=`` / ``>=``). Unmatched left rows keep
    NULL carried values, like ``pandas.merge_asof``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [on] if isinstance(on, str) else list(on)
    value_cols = value_cols or [
        c for c in right.columns if c not in keys + [right_time]
    ]

    l_tag = left.select(
        *keys,
        F.col(left_time).alias("_t"),
        F.lit(0).alias("_is_r"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_rv_{c}") for c in value_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    r_tag = right.select(
        *keys,
        F.col(right_time).alias("_t"),
        F.lit(1).alias("_is_r"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
        F.lit(None)
        .cast(l_tag.schema["_lrow"].dataType)
        .alias("_lrow"),
    )
    both = l_tag.unionByName(r_tag)

    # Backward: scan time ascending; at equal times the right row must be
    # visible to the left row iff not strict -> right sorts first unless
    # strict. Forward is the mirror (descending).
    asc = direction == "backward"
    t_order = F.col("_t").asc() if asc else F.col("_t").desc()
    # tag order: visible-side-first within equal timestamps
    r_first = not strict
    tag_order = (
        F.col("_is_r").desc() if r_first else F.col("_is_r").asc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(t_order, tag_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.select(
        "*",
        *[
            F.last(
                F.when(F.col("_is_r") == 1, F.col(f"_rv_{c}")), ignorenulls=True
            )
            .over(w)
            .alias(f"_c_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("_is_r") == 0)
    return out.select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col(f"_c_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
