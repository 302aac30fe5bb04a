"""Snapshot diff: keyed comparison of two table versions (CDC-style).

Beyond-reference operator (driver north star): pipeline runs are compared
constantly — yesterday's corpus vs today's, pre- vs post-migration, the
staging table vs production. The diff is one keyed full-outer shuffle
join; each row classifies as ``added`` (key only in new), ``removed``
(key only in old), ``changed`` (both present, compared columns differ),
or ``unchanged``. No collect, no row-wise Python; the compare is one
struct inequality, NULL-safe via ``eqNullSafe``.

``snapshot_diff`` returns the row-level classification;
``diff_summary`` the one-row count rollup a CI check asserts on.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff keyed on ``key_cols``. Returns
    (key..., change_type, old_<c>, new_<c> for each compared column).
    ``compare_cols`` defaults to every shared non-key column."""
    keys = list(key_cols)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    o = old.select(
        *keys,
        F.lit(True).alias("_in_old"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("_in_new"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    joined = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), "added")
        .when(F.col("_in_new").isNull(), "removed")
        .when(same, "unchanged")
        .otherwise("changed")
    )
    return joined.select(
        *keys,
        change.alias("change_type"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """One row: (n_added, n_removed, n_changed, n_unchanged)."""
    d = snapshot_diff(old, new, key_cols, compare_cols)
    t = F.col("change_type")
    return d.agg(
        F.sum((t == "added").cast("long")).alias("n_added"),
        F.sum((t == "removed").cast("long")).alias("n_removed"),
        F.sum((t == "changed").cast("long")).alias("n_changed"),
        F.sum((t == "unchanged").cast("long")).alias("n_unchanged"),
    )
