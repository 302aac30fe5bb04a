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

from pyspark.sql import DataFrame, Window
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


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    *,
    version_col: str = "version",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Apply a CDC change batch to a snapshot (the MERGE/upsert primitive a
    lakehouse table maintenance job runs): per key, the HIGHEST-version
    change wins (last-writer-wins; ties break to the delete so replays are
    idempotent), a winning ``delete_op`` removes the key, any other op
    upserts the change row's payload, and snapshot keys without changes
    pass through untouched.

    Payload columns are ``snapshot``'s non-key columns; ``changes`` must
    carry the same payload plus ``version_col`` and ``op_col``.

    Scale shape: ONE keyed window over the change batch (row_number by
    version DESC — the batch, not the snapshot, pays the sort), one
    LEFT ANTI join to drop superseded snapshot keys, one union. The
    snapshot is never windowed or re-sorted; at 100 TB the cost is the
    anti-join shuffle on the keys plus the (usually much smaller) change
    batch's window.
    """
    keys = list(key_cols)
    payload = [c for c in snapshot.columns if c not in keys]
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(),
        # version ties: delete outranks upsert, then op string for
        # total determinism
        (F.col(op_col) == delete_op).cast("int").desc(),
        F.col(op_col).asc(),
    )
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    kept = snapshot.join(latest.select(*keys), keys, "left_anti")
    upserts = latest.where(F.col(op_col) != delete_op).select(*keys, *payload)
    return kept.unionByName(upserts)
