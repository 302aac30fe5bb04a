"""Sequential funnel analysis over an event stream: how many users reach
step 1, then step 2 strictly after their step-1 time, and so on — the
standard product-analytics conversion query.

Semantics (strict-order, earliest-entry funnel): a user completes step i
at the first event of that type with a timestamp strictly greater than
the earliest time they completed step i-1. Ties at identical timestamps do
not advance the funnel.

Scale design: one shuffle (groupBy user), then a single O(n) fold over
each user's time-sorted event array — the fold's lambda references only
its accumulator and element variables, so there is no per-element
re-evaluation of outer expressions (the HOF no-CSE trap let_expr exists
for). Per-user event counts bound the array size, which is the standard
product-analytics assumption; the funnel depth only widens the
accumulator struct. The final counts are a second k-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_user_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user earliest completion time of each funnel step (NULL once a
    step is not reached): ``(user, t_1_<s1>, t_2_<s2>, ...)``."""
    ts_type = events.schema[ts_col].dataType
    names = [f"t_{i + 1}_{s}" for i, s in enumerate(steps)]
    grouped = events.groupBy(user_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col(ts_col).alias("ts"),
                                    F.col(type_col).alias("tp")))
        ).alias("_ev")
    )
    null_ts = F.lit(None).cast(ts_type)
    acc0 = F.struct(*[null_ts.alias(n) for n in names])

    def step_fn(acc, e):
        fields = []
        for i, (s, n) in enumerate(zip(steps, names)):
            cur = acc[n]
            cond = cur.isNull() & (e["tp"] == s)
            if i > 0:
                prev = acc[names[i - 1]]
                cond = cond & prev.isNotNull() & (e["ts"] > prev)
            fields.append(F.when(cond, e["ts"]).otherwise(cur).alias(n))
        return F.struct(*fields)

    folded = grouped.select(
        user_col, F.aggregate(F.col("_ev"), acc0, step_fn).alias("_t")
    )
    return folded.select(user_col, *[F.col(f"_t.{n}").alias(n) for n in names])


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Funnel conversion table: one row per step with the number of users
    who reached it (monotone non-increasing) — ``(step_idx, step,
    n_users)``."""
    per_user = funnel_user_steps(events, steps, user_col, type_col, ts_col)
    names = [f"t_{i + 1}_{s}" for i, s in enumerate(steps)]
    row = per_user.agg(
        *[F.count(F.col(n)).alias(f"n_{i}") for i, n in enumerate(names)]
    )
    parts = [
        F.struct(
            F.lit(i + 1).alias("step_idx"),
            F.lit(step).alias("step"),
            F.col(f"n_{i}").alias("n_users"),
        )
        for i, step in enumerate(steps)
    ]
    return row.select(F.explode(F.array(*parts)).alias("_p")).select("_p.*")


def cohort_retention(
    events: DataFrame,
    *,
    period: str = "week",
    max_offset: int = 8,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-activity
    period (the cohort), counted again in each later period they return —
    ``(cohort, offset, n_users)`` with offset 0 = the cohort size itself.

    Dataflow: distinct (user, period) pairs -> per-user min period (the
    cohort) -> one join back keyed by user -> count per (cohort, offset).
    Two shuffles total, both keyed by user/cohort; no windows, no
    cross-period self-join of the activity table.
    """
    per = events.select(
        user_col, F.date_trunc(period, F.col(ts_col)).alias("_p")
    ).distinct()
    first = per.groupBy(user_col).agg(F.min("_p").alias("_cohort"))
    joined = per.join(first, user_col)
    # integer period offset; weeks are fixed-length so a floor-div of the
    # second delta is exact (month periods would need months_between)
    seconds = {"week": 7 * 86400, "day": 86400, "hour": 3600}
    if period not in seconds:
        raise ValueError(f"unsupported period: {period}")
    # integer `div` (not float divide + cast): truncation semantics match
    # ANSI SQL `//` exactly, and both periods are date_trunc-aligned so the
    # quotient is an exact integer anyway
    off = F.expr(
        "timestampdiff(SECOND, CAST(_cohort AS TIMESTAMP_NTZ),"
        f" CAST(_p AS TIMESTAMP_NTZ)) div {seconds[period]}"
    )
    return (
        joined.withColumn("_off", off)
        .filter(F.col("_off") <= max_offset)
        .groupBy(F.col("_cohort").alias("cohort"), F.col("_off").alias("offset"))
        .agg(F.countDistinct(user_col).alias("n_users"))
    )


def event_transitions(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts between consecutive events of
    each user — the "what do users do next" matrix behind journey analysis
    and next-step prediction features.

    One user-keyed shuffle: a per-user ordered window takes lag(type), then
    a hash aggregate counts (prev_type, event_type) pairs. The window's
    order includes the event id so simultaneous timestamps rank
    deterministically. Rows with no predecessor (each user's first event)
    are counted under prev_type = '<start>'.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = df.select(
        F.coalesce(
            F.lag(type_col).over(w), F.lit("<start>")
        ).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    )
    return pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
