"""Distributed global ordered computations (rank / running aggregates).

A bare ``Window.orderBy(...)`` with no partitioning moves EVERY row to one
task — the classic Spark scale cliff (WindowExec warns about it). These
helpers compute globally-ordered quantities with bounded per-task state:

1. ``repartitionByRange`` on the sort key — each partition holds a
   contiguous key range, partitions are balanced by sampling;
2. a per-partition window (hash on the partition id — every group is
   one bounded partition);
3. per-partition summaries (count / sum / min) collected to the driver —
   O(num_partitions) scalars — and turned into prefix offsets that are
   joined back.

rank = prefix_count + local_rank, running_sum = prefix_sum + local_running,
running_min = min(prefix_min, local_running_min). Works at any input size
the range partitioner can balance; the only driver data is one row per
partition.

Requirement: no NULLs in the ordering columns (callers filter or impute
first), and the ordering columns must totally order rows that need
deterministic ranks (append unique tie-breakers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "_ord_pid"

# Size-based execution switch (the broadcast-threshold analogue; the
# reference's own serial-vs-joblib switch is dm.py:449-456): below this the
# whole vector fits one task comfortably and a plain global window wins —
# the two-phase machinery pays 2 extra shuffles + a driver collect, which
# only amortizes on large inputs. Callers that already know their row count
# pass it via `n_rows` so no extra count job runs. 100k measured as the
# crossover on local[32]: at 600k rows the single-partition window
# serializes a 600k sort onto one core (3.4 s) while the two-phase path
# runs the per-partition sorts in parallel (1.7 s); at tens of thousands
# of rows the window's single task still wins on fixed cost. Dispatch is
# result-identical for rank/lead/min (order-exact) and for running sums
# of EXACT summands (integers / integer-valued doubles — every current
# caller), where partial sums + offsets are exact in either association.
# A running sum over arbitrary doubles is NOT bit-stable across the
# paths (addition associates differently); a caller gating such a sum
# must pin the path via num_partitions or pre-scale to integers, as
# rolling_zscore does.
SMALL_INPUT_ROWS = 100_000


def _range_partitioned(
    df: DataFrame, order_cols: list[str], num_partitions: int | None
) -> DataFrame:
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    d = df.repartitionByRange(n, *[F.col(c) for c in order_cols])
    # persist: partition boundaries come from sampling; the offsets we
    # collect must describe the SAME partitioning the final query reads.
    return d.withColumn(_PID, F.spark_partition_id()).persist()


def _pid_order(stats, order_cols: list[str]):
    """Partition ids sorted by their minimum key (no assumption that pid
    order survives AQE coalescing)."""
    def key(r):
        lo = r["_lo"]
        return tuple(lo[c] for c in order_cols)

    return [r[_PID] for r in sorted((s for s in stats if s["_n"] > 0), key=key)]


def _offsets_df(df: DataFrame, mapping: dict[int, float], col_name: str, dtype=None):
    """Broadcast (partition-id, offset) table. Pass ``dtype`` when values
    may be None (schema inference cannot handle all-null columns)."""
    spark = df.sparkSession
    rows = [(int(pid), v) for pid, v in mapping.items()]
    if dtype is None and not rows:
        # empty input: nothing to infer a value type from — offsets are
        # integral whenever the caller doesn't say otherwise
        from pyspark.sql.types import LongType

        dtype = LongType()
    if dtype is not None:
        from pyspark.sql.types import IntegerType, StructField, StructType

        schema = StructType(
            [
                StructField(_PID, IntegerType(), False),
                StructField(col_name, dtype, True),
            ]
        )
        return F.broadcast(spark.createDataFrame(rows, schema))
    return F.broadcast(
        spark.createDataFrame(rows, [_PID, col_name])
    )


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    *,
    num_partitions: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Global 1-based row_number over ``order_cols`` (ascending), O(rows /
    num_partitions) per-task state. With ``n_rows`` below the small-input
    threshold, falls back to a plain window (cheaper at that size)."""
    return _ranked_with_total(
        df, order_cols, rank_col,
        num_partitions=num_partitions, n_rows=n_rows,
    )[0]


def _ranked_with_total(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str,
    *,
    num_partitions: int | None = None,
    n_rows: int | None = None,
) -> tuple[DataFrame, int | None]:
    """``with_global_rank`` plus the exact row total the distributed path
    already knows on the driver (the end of its offsets scan) — None on
    the small-window path, where the caller can afford a count()."""
    if n_rows is not None and n_rows < SMALL_INPUT_ROWS:
        w = Window.orderBy(*[F.col(c).asc() for c in order_cols])
        ranked = df.withColumn(
            rank_col, F.row_number().over(w).cast("long")
        )
        return ranked, None
    d = _range_partitioned(df, order_cols, num_partitions)
    stats = (
        d.groupBy(_PID)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(F.struct(*order_cols)).alias("_lo"),
        )
        .collect()
    )
    counts = {r[_PID]: r["_n"] for r in stats}
    offsets, acc = {}, 0
    for pid in _pid_order(stats, order_cols):
        offsets[pid] = acc
        acc += counts[pid]
    w = Window.partitionBy(_PID).orderBy(*[F.col(c).asc() for c in order_cols])
    out = (
        d.withColumn("_local", F.row_number().over(w))
        .join(_offsets_df(d, offsets, "_off"), _PID)
        .withColumn(rank_col, (F.col("_local") + F.col("_off")).cast("long"))
        .drop(_PID, "_local", "_off")
    )
    return out, acc


def with_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: Column | str,
    out_col: str = "running_sum",
    *,
    num_partitions: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Global cumulative sum of ``value_col`` in ``order_cols`` order
    (ties: all rows of an equal key in earlier sort positions are included
    before any strictly-greater key)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    if n_rows is not None and n_rows < SMALL_INPUT_ROWS:
        w = Window.orderBy(*[F.col(c).asc() for c in order_cols]).rowsBetween(
            Window.unboundedPreceding, 0
        )
        return df.withColumn(out_col, F.sum(v).over(w))
    d = _range_partitioned(df.withColumn("_v", v), order_cols, num_partitions)
    stats = (
        d.groupBy(_PID)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_v").alias("_s"),
            F.min(F.struct(*order_cols)).alias("_lo"),
        )
        .collect()
    )
    # preserve integral sums exactly: a float offset silently loses bits
    # past 2^53, which a 100 TB-scale token/byte cumsum exceeds
    vals = [r["_s"] for r in stats if r["_s"] is not None]
    integral = vals and all(isinstance(x, int) for x in vals)
    zero = 0 if integral else 0.0
    sums = {
        r[_PID]: (r["_s"] if r["_s"] is not None else zero)
        if integral
        else float(r["_s"] or 0.0)
        for r in stats
    }
    offsets, acc = {}, zero
    for pid in _pid_order(stats, order_cols):
        offsets[pid] = acc
        acc += sums[pid]
    w = (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.withColumn("_local", F.sum("_v").over(w))
        .join(_offsets_df(d, offsets, "_off"), _PID)
        .withColumn(out_col, F.col("_local") + F.col("_off"))
        .drop(_PID, "_local", "_off", "_v")
    )


def with_running_min(
    df: DataFrame,
    order_cols: list[str],
    value_col: Column | str,
    out_col: str = "running_min",
    *,
    num_partitions: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Global running minimum of ``value_col`` in ``order_cols`` order."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    if n_rows is not None and n_rows < SMALL_INPUT_ROWS:
        w = Window.orderBy(*[F.col(c).asc() for c in order_cols]).rowsBetween(
            Window.unboundedPreceding, 0
        )
        return df.withColumn(out_col, F.min(v).over(w))
    d = _range_partitioned(df.withColumn("_v", v), order_cols, num_partitions)
    stats = (
        d.groupBy(_PID)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min("_v").alias("_m"),
            F.min(F.struct(*order_cols)).alias("_lo"),
        )
        .collect()
    )
    mins = {r[_PID]: r["_m"] for r in stats}
    offsets, acc = {}, None
    for pid in _pid_order(stats, order_cols):
        offsets[pid] = acc
        m = mins[pid]
        if m is not None:
            acc = m if acc is None else min(acc, m)
    # None offset (first partition / all-null prefix) stays NULL — `least`
    # ignores nulls, so no sentinel value can leak into results (a numeric
    # sentinel would pose as a legitimate running min). Integral mins stay
    # int: a float(id) loses bits past 2^53.
    integral = all(
        isinstance(m, int) for m in mins.values() if m is not None
    )
    off_map = {
        p: (o if (o is None or integral) else float(o))
        for p, o in offsets.items()
    }
    off_dtype = d.schema["_v"].dataType
    w = (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        d.withColumn("_local", F.min("_v").over(w))
        .join(_offsets_df(d, off_map, "_off", dtype=off_dtype), _PID)
        .withColumn(out_col, F.least(F.col("_local"), F.col("_off")))
        .drop(_PID, "_local", "_off", "_v")
    )


def with_lead(
    df: DataFrame,
    order_cols: list[str],
    lead_cols: dict[str, str],
    *,
    num_partitions: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Global ``lead(1)`` of each source column in ``order_cols`` order with
    NO single-partition window (the last row overall gets NULL leads).

    ``lead_cols`` maps output column name -> source column name. Scale path:
    range-partition on the sort key, per-partition ``lead``, then patch each
    partition's last row with the *next* partition's first-row values —
    collected per-partition firsts are O(num_partitions) driver rows. The
    ordering columns must be non-null and totally order the rows (append a
    unique tie-breaker), as everywhere in this module.
    """
    if n_rows is not None and n_rows < SMALL_INPUT_ROWS:
        w = Window.orderBy(*[F.col(c).asc() for c in order_cols])
        out = df
        for out_col, src in lead_cols.items():
            out = out.withColumn(out_col, F.lead(src).over(w))
        return out

    from pyspark.sql.types import IntegerType, StructField, StructType

    srcs = sorted(set(lead_cols.values()))
    d = _range_partitioned(df, order_cols, num_partitions)
    # first row (in sort order) of each partition: min of a struct whose
    # leading fields are the full (total) ordering key, trailing fields the
    # source values — lexicographic struct min selects that row's values.
    firsts = (
        d.groupBy(_PID)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.min(F.struct(*order_cols, *srcs)).alias("_lo"),
        )
        .collect()
    )
    ordered_pids = _pid_order(firsts, order_cols)
    lo_by_pid = {r[_PID]: r["_lo"] for r in firsts}
    nxt_rows = []
    for i, pid in enumerate(ordered_pids):
        if i + 1 < len(ordered_pids):
            lo = lo_by_pid[ordered_pids[i + 1]]
            nxt_rows.append((int(pid), *[lo[c] for c in srcs]))
        else:
            nxt_rows.append((int(pid), *[None for _ in srcs]))
    schema = StructType(
        [StructField(_PID, IntegerType(), False)]
        + [StructField(f"_nx_{c}", df.schema[c].dataType, True) for c in srcs]
    )
    nxt_df = F.broadcast(df.sparkSession.createDataFrame(nxt_rows, schema))

    w = Window.partitionBy(_PID).orderBy(*[F.col(c).asc() for c in order_cols])
    # order cols are non-null, so a null local lead of one of them marks the
    # partition's last row (a legitimately-null source value does not).
    out = d.withColumn("_at_end", F.lead(order_cols[0]).over(w).isNull())
    for out_col, src in lead_cols.items():
        out = out.withColumn(f"_lead_{out_col}", F.lead(src).over(w))
    out = out.join(nxt_df, _PID)
    for out_col, src in lead_cols.items():
        out = out.withColumn(
            out_col,
            F.when(F.col("_at_end"), F.col(f"_nx_{src}")).otherwise(
                F.col(f"_lead_{out_col}")
            ),
        ).drop(f"_lead_{out_col}")
    return out.drop(_PID, "_at_end", *[f"_nx_{c}" for c in srcs])


def bh_adjust_global(
    df: DataFrame,
    p_col: str,
    out_col: str = "p_adj",
    tie_cols: list[str] | None = None,
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """Benjamini-Hochberg adjustment with NO single-partition window
    (scale path for functions.stats.bh_adjust; reference dm.py:475-477).

    p_adj_i = min_{j>=i}(p_(j) * n / j), clipped to 1. The reverse running
    minimum over descending p is computed as a running min over ascending
    (-p), using the same range-partitioned machinery.
    """
    ties = tie_cols or []
    n = df.filter(F.col(p_col).isNotNull()).count()
    ranked = with_global_rank(
        df.filter(F.col(p_col).isNotNull()),
        [p_col, *ties],
        "_bh_rank",
        num_partitions=num_partitions,
        n_rows=n,
    ).withColumn("_bh_raw", F.col(p_col) * F.lit(float(n)) / F.col("_bh_rank"))
    # descending order via negated rank (already a total order)
    rev = ranked.withColumn("_neg_rank", -F.col("_bh_rank"))
    out = with_running_min(
        rev, ["_neg_rank"], "_bh_raw", "_bh_min",
        num_partitions=num_partitions, n_rows=n,
    )
    return (
        out.withColumn(out_col, F.least(F.lit(1.0), F.col("_bh_min")))
        .drop("_bh_rank", "_bh_raw", "_neg_rank", "_bh_min")
    )


def quantile_discretize(
    df: DataFrame,
    value_col: str,
    n_bins: int,
    tiebreak_cols: list[str],
    bucket_col: str = "bucket",
    *,
    num_partitions: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Equal-frequency (quantile) binning with EXACT ``NTILE(n_bins)``
    semantics over the global (``value_col``, ``tiebreak_cols``) order —
    the feature-discretization step of GBDT-style pipelines and a
    monotone rank transform for drift monitoring. With ``total = q *
    n_bins + r``, the first ``r`` buckets hold ``q + 1`` rows and the
    rest ``q`` (the ANSI NTILE contract), derived arithmetically from
    the scale-safe two-phase global rank (``with_global_rank``) — NO
    single-partition NTILE window at scale, and the result is
    bit-identical to any engine's NTILE given the same total order
    (ties are broken by ``tiebreak_cols``, so make value+tiebreak a
    total order for determinism).

    Preconditions (module-wide): ``value_col`` and ``tiebreak_cols``
    must be non-NULL — the two-phase partitioner orders partition
    minima driver-side and engines disagree on NULL placement anyway
    (Spark ASC is NULLS FIRST, DuckDB NULLS LAST). Filter or impute
    NULLs first.

    Pure integer LITERAL arithmetic after the rank: the distributed
    rank already collects per-partition counts, so ``total`` is known
    on the driver for free (no second pass, no 1-row aggregate join);
    only the sub-threshold small path pays a count()."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    order = [value_col, *tiebreak_cols]
    ranked, total = _ranked_with_total(
        df, order, "_qd_rank",
        num_partitions=num_partitions, n_rows=n_rows,
    )
    if total is None:  # small-window path: the input is cheap to count
        total = df.count()
    q, r = divmod(total, n_bins)
    cutoff = r * (q + 1)
    qs = max(q, 1)  # q == 0 => cutoff == total, the div is never taken
    # integral `div` over longs — exact, no double round-trip;
    # ceil(a/b) == (a + b - 1) div b for positive a, b
    bucket = F.expr(
        f"CASE WHEN _qd_rank <= {cutoff}L"
        f" THEN (_qd_rank + {q}L) div {q + 1}L"
        f" ELSE {r}L + ((_qd_rank - {cutoff}L + {qs - 1}L) div {qs}L)"
        f" END"
    )
    return ranked.withColumn(bucket_col, bucket.cast("int")).drop(
        "_qd_rank"
    )
