"""Interval / range-join operators (SURVEY §2.3 J7-J10).

The reference uses pyranges (``join_overlaps`` cnv.py:184, ``count_overlaps``
cnv.py:281-320, ``subtract_overlaps`` cnv.py:169, ``cluster_overlaps``
cnv.py:302). Spark expresses an interval overlap as a theta join
(``l.start <= r.end AND l.end >= r.start``), which naively plans as a
broadcast-nested-loop. The helper here injects an **equi bucket key**
(``chrom``, ``floor(pos / bucket)``), turning it into a hash join with a
residual range predicate — the one piece of "physical optimizer" this engine
adds on top of Catalyst (SURVEY §4.1). At 100 TB the bucketed join shuffles
on (chrom, bucket), which is uniform by construction; skew in hot
chromosomes is handled by AQE skew-join splitting.

Interval convention: closed [start, end], matching pyranges' behavior on the
reference's 0-based manifest coordinates; overlap iff
``l.start <= r.end AND l.end >= r.start``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKET = 50_000


def _bucket_explode(
    df: DataFrame, start: str, end: str, bucket: int, out: str = "_bucket"
) -> DataFrame:
    """One output row per bucket the interval [start, end] touches."""
    return df.withColumn(
        out,
        F.explode(
            F.sequence(
                (F.col(start) / bucket).cast("long"),
                (F.col(end) / bucket).cast("long"),
            )
        ),
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on_chrom: str = "chromosome",
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    bucket: int = DEFAULT_BUCKET,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Overlap join of two interval tables sharing a chromosome column.

    Right-side columns are prefixed ``r_`` on name collisions. ``how`` may be
    'inner' or 'left_semi'/'left_anti' (pyranges subtract/filter idioms).
    """
    lcols = set(left.columns)
    renames = {c: (f"r_{c}" if c in lcols and c != on_chrom else c) for c in right.columns}
    r = right.select([F.col(c).alias(renames[c]) for c in right.columns])
    r_start, r_end = renames[right_start], renames[right_end]

    lw = left.withColumn("_lid", F.monotonically_increasing_id())
    lb = _bucket_explode(lw, left_start, left_end, bucket, "_lb")
    rb = _bucket_explode(r, r_start, r_end, bucket, "_rb")
    if broadcast_right:
        rb = F.broadcast(rb)

    # Two overlapping intervals share the bucket containing
    # max(l.start, r.start) (the overlap region's left edge), so restricting
    # the match to exactly that bucket yields each pair once with NO
    # deduplication shuffle — and preserves genuinely duplicate input rows,
    # matching SQL join multiplicity.
    pair_bucket = (
        F.greatest(lb[left_start], rb[r_start]) / bucket
    ).cast("long")
    cond = (
        (lb[on_chrom] == rb[on_chrom])
        & (F.col("_lb") == F.col("_rb"))
        & (lb[left_start] <= rb[r_end])
        & (lb[left_end] >= rb[r_start])
        & (F.col("_lb") == pair_bucket)
    )
    if how == "left_semi":
        # A left row can still match right rows in several of its buckets;
        # collapse on the synthetic row id so duplicate left rows survive.
        return (
            lb.join(rb, cond, "left_semi")
            .dropDuplicates(["_lid"])
            .drop("_lb", "_lid")
        )
    if how == "left_anti":
        # A row survives only if NO bucket produced a match.
        matched = lb.join(rb, cond, "left_semi").select("_lid").distinct()
        return lw.join(matched, "_lid", "left_anti").drop("_lid")
    return lb.join(rb, cond, how).drop("_lb", "_rb", "_lid", rb[on_chrom])


def count_overlaps(
    intervals: DataFrame,
    points_or_intervals: DataFrame,
    group_cols: list[str],
    on_chrom: str = "chromosome",
    bucket: int = DEFAULT_BUCKET,
    out_col: str = "n_overlaps",
) -> DataFrame:
    """J9 — per-interval overlap counts (reference cnv.py:281, 291, 320).

    Keeps zero-count intervals (left join + coalesce)."""
    joined = range_join(intervals, points_or_intervals, on_chrom=on_chrom, bucket=bucket)
    counts = joined.groupBy(*group_cols).agg(F.count(F.lit(1)).alias(out_col))
    return intervals.join(counts, group_cols, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0))
    )


def cluster_overlaps(
    intervals: DataFrame,
    on_chrom: str = "chromosome",
    start: str = "start",
    end: str = "end",
    slack: int = 1,
    out_col: str = "cluster_id",
) -> DataFrame:
    """J10 — assign a cluster id to touching/overlapping intervals
    (reference cnv.py:302 ``cluster_overlaps(slack=1)``).

    Classic gaps-and-islands: per chromosome, order by start, flag rows whose
    start exceeds the running max end (+slack) of preceding rows, and running-
    sum the flags. Partitioned by chromosome — no global sort.
    """
    w_order = Window.partitionBy(on_chrom).orderBy(F.col(start), F.col(end))
    w_run = w_order.rowsBetween(Window.unboundedPreceding, -1)
    df = intervals.withColumn("_prev_max_end", F.max(F.col(end)).over(w_run))
    df = df.withColumn(
        "_new_cluster",
        F.when(
            F.col("_prev_max_end").isNull()
            | (F.col(start) > F.col("_prev_max_end") + slack),
            1,
        ).otherwise(0),
    )
    df = df.withColumn(
        "_cluster_in_chrom",
        F.sum("_new_cluster").over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return df.withColumn(
        out_col, F.concat_ws(":", F.col(on_chrom), F.col("_cluster_in_chrom"))
    ).drop("_prev_max_end", "_new_cluster", "_cluster_in_chrom")


def subtract_overlaps(
    intervals: DataFrame,
    gaps: DataFrame,
    on_chrom: str = "chromosome",
    start: str = "start",
    end: str = "end",
) -> DataFrame:
    """J8 — interval difference: remove from each interval the parts covered
    by any gap (reference cnv.py:169 tiles ∖ gaps).

    Implementation: range-join tiles to gaps, merge each tile's overlapping
    gaps (they are few), and emit the complementary sub-intervals via a
    higher-order ``aggregate`` over the sorted gap list — all JVM-side.
    """
    g = gaps.select(
        F.col(on_chrom),
        F.col(start).alias("_g_start"),
        F.col(end).alias("_g_end"),
    )
    joined = range_join(
        intervals,
        g,
        on_chrom=on_chrom,
        left_start=start,
        left_end=end,
        right_start="_g_start",
        right_end="_g_end",
        broadcast_right=True,
    )
    key_cols = [c for c in intervals.columns]
    clipped = joined.withColumn(
        "_gs", F.greatest(F.col("_g_start"), F.col(start))
    ).withColumn("_ge", F.least(F.col("_g_end"), F.col(end)))
    merged = (
        clipped.groupBy(*key_cols)
        .agg(F.sort_array(F.collect_list(F.struct("_gs", "_ge"))).alias("_gaps"))
    )
    # Walk the sorted gaps, emitting the uncovered pieces.
    pieces = F.aggregate(
        F.col("_gaps"),
        F.struct(
            F.col(start).cast("long").alias("cursor"),
            F.array().cast("array<struct<s:bigint,e:bigint>>").alias("acc"),
        ),
        lambda acc, gp: F.struct(
            F.greatest(acc["cursor"], gp["_ge"] + 1).alias("cursor"),
            F.when(
                gp["_gs"] > acc["cursor"],
                F.concat(
                    acc["acc"],
                    F.array(
                        F.struct(
                            acc["cursor"].alias("s"),
                            (gp["_gs"] - 1).cast("bigint").alias("e"),
                        )
                    ),
                ),
            )
            .otherwise(acc["acc"])
            .alias("acc"),
        ),
        lambda acc: F.when(
            acc["cursor"] <= F.col(end),
            F.concat(
                acc["acc"],
                F.array(
                    F.struct(
                        acc["cursor"].alias("s"), F.col(end).cast("bigint").alias("e")
                    )
                ),
            ),
        ).otherwise(acc["acc"]),
    )
    cut = (
        merged.withColumn("_pieces", pieces)
        .select(*key_cols, F.explode("_pieces").alias("_p"))
        .withColumn(start, F.col("_p.s"))
        .withColumn(end, F.col("_p.e"))
        .drop("_p", "_gaps")
    )
    untouched = intervals.join(
        g,
        (intervals[on_chrom] == g[on_chrom])
        & (intervals[start] <= F.col("_g_end"))
        & (intervals[end] >= F.col("_g_start")),
        "left_anti",
    )
    return untouched.unionByName(cut.select(intervals.columns))
