"""Slowly-changing-dimension (SCD type 2) history construction.

Beyond-reference operator (driver north star): turning an append-only
change log (key, ts, attributes) into versioned validity intervals —
(key, attrs, valid_from, valid_to, is_current) — is the standard
warehouse pattern for point-in-time joins ("what was this user's segment
when the order was placed?"). Both steps are single partitioned windows:

1. collapse no-op updates: a row opens a new version only when its
   tracked attributes differ from the previous row's (struct inequality
   over one lag);
2. close intervals: valid_to = next version's valid_from (one lead);
   the open version has valid_to NULL.

One user-keyed shuffle total; no self-joins. A point-in-time lookup is
then an interval join (``asof_join`` or ``range_join`` in this repo).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changes(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: Sequence[str],
    *,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Build the SCD2 version table from a change log. ``tiebreak``
    columns disambiguate same-timestamp changes (the LAST row in
    (ts, tiebreak) order wins the instant — earlier same-instant versions
    collapse to zero-length intervals, which are dropped).

    Returns (key, attr_cols..., valid_from, valid_to, is_current).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(key).orderBy(*order)
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    changed = df.withColumn(
        "_new_version",
        F.lag(attrs).over(w).isNull()
        | (F.lag(attrs).over(w) != attrs),
    ).where(F.col("_new_version"))
    wv = Window.partitionBy(key).orderBy(*order)
    versioned = changed.select(
        key,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(wv).alias("valid_to"),
    )
    return (
        versioned
        # same-instant rewrites produce zero-length intervals: drop them
        .where(
            F.col("valid_to").isNull()
            | (F.col("valid_to") > F.col("valid_from"))
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def as_of_lookup(
    history: DataFrame,
    probes: DataFrame,
    key: str,
    ts_col: str,
) -> DataFrame:
    """Point-in-time join: for each probe (key, ts), the version valid at
    that instant (valid_from <= ts < valid_to, open interval = current).
    Equi-join on the key plus an interval predicate — the join stays
    keyed, never cartesian."""
    h = history.alias("h")
    p = probes.alias("p")
    cond = (
        (F.col(f"p.{key}") == F.col(f"h.{key}"))
        & (F.col(f"p.{ts_col}") >= F.col("h.valid_from"))
        & (
            F.col("h.valid_to").isNull()
            | (F.col(f"p.{ts_col}") < F.col("h.valid_to"))
        )
    )
    return p.join(h, cond, "left").select(
        "p.*",
        *[
            F.col(f"h.{c}").alias(c)
            for c in history.columns
            if c not in (key,)
        ],
    )
