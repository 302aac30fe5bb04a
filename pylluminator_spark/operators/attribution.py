"""Marketing attribution: last-touch and linear multi-touch credit.

Beyond-reference operator (driver north star): "which channel caused the
conversion" over an event stream. Both models stay keyed per user — no
self-cartesian:

- ``last_touch``: union the touch and conversion streams, carry the most
  recent touch forward with one ``last(ignorenulls)`` window per user
  (the as-of idiom), emit conversion rows. Optional lookback discards
  stale touches.
- ``linear_attribution``: every touch inside the lookback window before
  a conversion shares the credit equally. Credits are EXACT scaled
  integers (``ppm div n_touches``) so sums are deterministic: first a
  trailing range-frame count gives each conversion its touch count, then
  a user-keyed interval join emits (touch, conversion) pairs and one
  aggregate sums credit per channel. The pair count is bounded by
  touches-per-window, never n^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(ts_col: str):
    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" CAST({ts_col} AS TIMESTAMP_NTZ))"
    )


def last_touch(
    events: DataFrame,
    *,
    touch_types: list[str],
    conversion_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    lookback_us: int | None = None,
) -> DataFrame:
    """Per conversion: the latest preceding touch (same user, ts <=
    conversion ts). Within the same instant, ALL touches sort before the
    conversion regardless of event id — the window orders by
    (us, _is_conv, eid) — so a same-timestamp touch is attributed even
    when its event id is larger than the conversion's. Among several
    same-instant touches, the largest eid wins. Returns
    (conversion_id, user, conversion_us, touch_id, touch_type, touch_us)
    with NULL touch columns for organic conversions (or stale ones
    outside ``lookback_us``)."""
    us = _epoch_us(ts_col)
    base = events.select(
        F.col(user_col).alias("user"),
        us.alias("us"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("etype"),
    )
    touches = base.where(F.col("etype").isin(touch_types))
    convs = base.where(F.col("etype") == conversion_type)
    stream = touches.select(
        "user", "us", "eid",
        F.struct("us", "eid", "etype").alias("_touch"),
        F.lit(0).alias("_is_conv"),
    ).unionByName(
        convs.select(
            "user", "us", "eid",
            F.lit(None).cast(
                "struct<us:bigint,eid:bigint,etype:string>"
            ).alias("_touch"),
            F.lit(1).alias("_is_conv"),
        )
    )
    w = (
        Window.partitionBy("user")
        .orderBy(F.col("us").asc(), F.col("_is_conv").asc(), F.col("eid").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = stream.withColumn(
        "_last", F.last("_touch", ignorenulls=True).over(w)
    ).where(F.col("_is_conv") == 1)
    fresh = F.col("_last").isNotNull()
    if lookback_us is not None:
        fresh = fresh & (
            F.col("us") - F.col("_last.us") <= F.lit(lookback_us)
        )
    return carried.select(
        F.col("eid").alias("conversion_id"),
        "user",
        F.col("us").alias("conversion_us"),
        F.when(fresh, F.col("_last.eid")).alias("touch_id"),
        F.when(fresh, F.col("_last.etype")).alias("touch_type"),
        F.when(fresh, F.col("_last.us")).alias("touch_us"),
    )


def linear_attribution(
    events: DataFrame,
    *,
    touch_types: list[str],
    conversion_type: str,
    lookback_us: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    ppm: int = 1_000_000,
) -> DataFrame:
    """Linear (equal-share) multi-touch credit per channel: each
    conversion splits ``ppm`` credit units integrally (``ppm div n``)
    across its window's touches. Returns (touch_type, n_conversions,
    credit_ppm) — exact integers; the division remainder is dropped
    (documented: sum over channels <= ppm * conversions)."""
    us = _epoch_us(ts_col)
    base = events.select(
        F.col(user_col).alias("user"),
        us.alias("us"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("etype"),
    )
    touches = base.where(F.col("etype").isin(touch_types)).select(
        "user",
        F.col("us").alias("t_us"),
        F.col("eid").alias("t_eid"),
        F.col("etype").alias("t_type"),
    )
    convs = base.where(F.col("etype") == conversion_type).select(
        "user",
        F.col("us").alias("c_us"),
        F.col("eid").alias("c_eid"),
    )
    pairs = convs.join(touches, "user").where(
        (F.col("t_us") <= F.col("c_us"))
        & (F.col("c_us") - F.col("t_us") <= F.lit(lookback_us))
    )
    counted = pairs.withColumn(
        "_n",
        F.count(F.lit(1)).over(
            Window.partitionBy("user", "c_eid")
        ),
    )
    credited = counted.withColumn(
        "credit", F.expr(f"{ppm} div _n")
    )
    return credited.groupBy(F.col("t_type").alias("touch_type")).agg(
        F.countDistinct("c_eid").alias("n_conversions"),
        F.sum("credit").alias("credit_ppm"),
    )
