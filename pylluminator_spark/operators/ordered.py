"""Distributed global ordered computations (rank / running aggregates).

A bare ``Window.orderBy(...)`` with no partitioning moves EVERY row to one
task — the classic Spark scale cliff (WindowExec warns about it). These
helpers compute globally-ordered quantities with bounded per-task state:

1. a BOUNDED deterministic sample of the sort key (bottom-k on a value
   hash — one cheap column-pruned pass) gives n-1 range-cut tuples on
   the driver, INLINED AS LITERALS into a bucket expression: every row's
   bucket is a pure function of its own key values;
2. a per-bucket window (``partitionBy(bucket)`` — ONE hash shuffle; each
   bucket is ~rows/n by the sample quantiles, the same balance a range
   partitioner gives);
3. per-bucket summaries (count / sum / min — O(n) rows) turned into
   exclusive-prefix offsets by a window over that TINY stats table
   (single-task over <= n rows at any data scale — the distributed
   analogue of ``RDD.zipWithIndex``'s per-partition-counts step),
   broadcast-joined back.

rank = prefix_count + local_rank, running_sum = prefix_sum + local_running,
running_min = min(prefix_min, local_running_min).

Why literal boundaries and not ``repartitionByRange`` + partition ids
(the previous design, VERDICT r6 #3): range-exchange boundaries come
from sampling seeded by the shuffle RDD id, so the offsets branch and
the data branch only agree if they share ONE physical exchange. That
required a persisted DataFrame (which leaked — every call cached the
full input forever), and the persist-free alternative (ReuseExchange
inside one plan) is real but FRAGILE — it silently stops firing when
the input is a cached relation (observed: AQE compiles separate
TableCacheQueryStages and re-samples per branch → wrong ranks). With
boundaries inlined as literals the bucket column is deterministic
row-local arithmetic: any number of branches, jobs, or recomputes agree
by construction, nothing is persisted, and the range exchange itself
disappears (bucket feeds the one hash shuffle the windows need anyway).

Cost model at scale: one bounded sample pass over the ORDER COLUMNS
only (column-pruned scan + per-partition top-k + driver merge of
<= 100k tuples), then one shuffle of the data. The sample pass
re-reads the input; a caller whose input is an expensive upstream plan
should persist that upstream itself — or skip the pass entirely:
``boundaries=`` hands in precomputed cut tuples (dense ranks, known
quantiles), and ``bucket_expr=`` hands in the whole bucket column (an
order-consistent expression — see ``_bucketized``). Boundary quality
only affects bucket BALANCE, never correctness — heavy ties on one key
value all land in one bucket, same as a range partitioner. The bucket
expression is a BALANCED comparison tree (O(log n_buckets) struct
compares per row), generated as one SQL string for numeric keys
(building it from Column objects costs hundreds of py4j round-trips —
the r8 small-input latency fix).

Requirement: no NULLs (and no NaNs) in the ordering columns — callers
filter or impute first, as the reference pipelines do — and the
ordering columns must totally order rows that need deterministic ranks
(append unique tie-breakers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "_ord_pid"

# Size-based execution switch (the broadcast-threshold analogue; the
# reference's own serial-vs-joblib switch is dm.py:449-456): below this the
# whole vector fits one task comfortably and a plain global window wins —
# the two-phase machinery pays a sample pass + an extra shuffle, which
# only amortizes on large inputs. Callers that already know their row count
# pass it via `n_rows` so no extra count job runs. 100k measured as the
# crossover on local[32]: at 600k rows the single-partition window
# serializes a 600k sort onto one core (3.4 s) while the two-phase path
# runs the per-bucket sorts in parallel (1.7 s); at tens of thousands
# of rows the window's single task still wins on fixed cost. Dispatch is
# result-identical for rank/lead/min (order-exact) and for running sums
# of EXACT summands (integers / integer-valued doubles — every current
# caller), where partial sums + offsets are exact in either association.
# A running sum over arbitrary doubles is NOT bit-stable across the
# paths (addition associates differently); a caller gating such a sum
# must pin the path via num_partitions or pre-scale to integers, as
# rolling_zscore does.
SMALL_INPUT_ROWS = 100_000

# bounded boundary sample: ~100 key tuples per target bucket (the
# RangePartitioner heuristic), capped so the driver merge stays small
_SAMPLE_PER_BUCKET = 100
_SAMPLE_CAP = 100_000


def _bucket_boundaries(
    df: DataFrame, order_cols: list[str], n: int
) -> list[tuple]:
    """n-1 ascending range-cut tuples from a bounded uniform sample.

    The sample is the bottom-k rows by ``xxhash64`` of the key values —
    a uniform draw whose membership depends only on the DATA (never on
    partitioning, RDD ids, or execution order), collected via Spark's
    distributed top-k (per-partition heap + driver merge; k rows total
    on the driver regardless of input size). Sorted driver-side and
    thinned to evenly-spaced cut points. UTF-8 byte order (Spark's
    string comparison) equals code-point order, so Python tuple sort
    agrees with Spark struct ordering for every type the module
    contract admits (no NULLs / NaNs).

    Balance caveat: because the hash is of the key VALUES, all rows of
    one key tuple share a hash — the sample draws DISTINCT key values
    uniformly, not rows. Under duplicate-heavy keys (few distinct
    values, many rows each) the cut points thin out to those few values
    and buckets approach one-per-distinct-value — coarser than a
    row-sampling range partitioner, degrading toward a near-single-task
    window in the extreme. Correctness is unaffected (ties must share a
    bucket anyway); callers with heavy ties who care about balance
    should append a row-unique tie-breaker to ``order_cols`` (which the
    deterministic-rank contract wants anyway) so the hash mixes it in."""
    k = min(_SAMPLE_CAP, _SAMPLE_PER_BUCKET * n)
    h = F.xxhash64(*[F.col(c) for c in order_cols])
    rows = (
        df.select(*[F.col(c) for c in order_cols], h.alias("_ord_smp_h"))
        .orderBy("_ord_smp_h")
        .limit(k)
        .drop("_ord_smp_h")
        .collect()
    )
    keys = sorted(tuple(r) for r in rows)
    if not keys:
        return []
    cuts: list[tuple] = []
    for i in range(1, n):
        b = keys[(i * len(keys)) // n]
        if not cuts or b > cuts[-1]:  # dedupe heavy-tie cut points
            cuts.append(b)
    return cuts


def _bucketized(
    df: DataFrame,
    order_cols: list[str],
    num_partitions: int | None,
    boundaries: list[tuple] | None = None,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Add the range-bucket column ``_PID``: ascending in key order,
    computed from literal boundaries — deterministic per ROW, so every
    branch and every job agrees (see module docstring).

    ``boundaries`` (ascending, strictly increasing cut tuples over
    ``order_cols``) skips the sample pass entirely — callers that KNOW
    the key distribution (dense ranks, fixed grids) hand the cuts in
    and save a full read of the input. Boundary quality is balance-only
    (module contract), so a caller-supplied grid can never change
    results.

    ``bucket_expr`` goes one step further: the caller provides the
    whole bucket column (a non-null integer expression). CONTRACT —
    this one is correctness-bearing: the expression must be
    ORDER-CONSISTENT with ``order_cols`` (every row of bucket i sorts
    <= every row of bucket i+1; rows equal on the full key share a
    bucket). Ids may be sparse (empty buckets are simply absent from
    the stats table); balance remains the caller's problem. Use when a
    literal struct-comparison tree would bloat the plan — a handful of
    scalar comparisons compiles in milliseconds where dozens of
    struct literals cost Catalyst a visible analysis pass."""
    if bucket_expr is not None:
        return df.withColumn(_PID, bucket_expr.cast("int"))
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cuts = (
        list(boundaries)
        if boundaries is not None
        else _bucket_boundaries(df, order_cols, n)
    )
    expr = _bucket_tree_sql(df, order_cols, cuts)
    if expr is not None:
        # numeric keys: the whole balanced tree is generated as ONE SQL
        # string — building the same tree from Column objects costs
        # hundreds of py4j round-trips (~0.9 s for 31 three-column cuts,
        # measured), which dominated small-SF latency
        return df.withColumn(_PID, F.expr(expr))
    key = F.struct(*[F.col(c) for c in order_cols])
    lits = [
        F.struct(
            *[
                F.lit(v).cast(df.schema[c].dataType).alias(c)
                for c, v in zip(order_cols, b)
            ]
        )
        for b in cuts
    ]

    # balanced comparison tree: bucket id in log2(n) struct compares per
    # row instead of a linear n-1 chain (struct comparisons evaluate in
    # the interpreted expression path, so depth is the per-row cost)
    def tree(lo: int, hi: int):
        # rows >= cuts[i] belong to bucket > i; bucket ids lo..hi
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi + 1) // 2
        return (
            F.when(key >= lits[mid - 1], tree(mid, hi))
            .otherwise(tree(lo, mid - 1))
        )

    return df.withColumn(_PID, tree(0, len(cuts)))


_SQL_NUM_TYPES = {
    "tinyint": "TINYINT",
    "smallint": "SMALLINT",
    "int": "INT",
    "bigint": "BIGINT",
    "float": "FLOAT",
    "double": "DOUBLE",
}


def _bucket_tree_sql(
    df: DataFrame, order_cols: list[str], cuts: list[tuple]
) -> str | None:
    """The balanced comparison tree of ``_bucketized`` rendered as one
    SQL CASE string — identical semantics to the Column-object tree
    (same named-struct >= comparisons, same bucket ids), but a single
    py4j call. Returns None (caller falls back to the Column tree) for
    non-numeric key types, non-finite values, or column names outside
    [A-Za-z0-9_] (a quote or backtick in an interpolated identifier
    would mis-parse — the Column tree needs no escaping), where safe SQL
    literal rendering is not worth the escaping risk."""
    import math
    import re

    types = []
    for c in order_cols:
        if not re.fullmatch(r"[A-Za-z0-9_]+", c):
            return None
        t = df.schema[c].dataType.simpleString()
        if t not in _SQL_NUM_TYPES:
            return None
        types.append(_SQL_NUM_TYPES[t])

    def lit(v, t) -> str | None:
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            return None
        if isinstance(v, float) and not math.isfinite(v):
            return None
        if isinstance(v, float) and t not in ("FLOAT", "DOUBLE"):
            # fractional cut for an integer column: SQL CAST and
            # Column.cast may disagree on rounding — let the Column
            # tree (whose semantics are the contract) handle it
            return None
        # repr(float) round-trips exactly through Spark's string->double
        # cast (shortest-repr guarantee); ints are exact as text
        return f"CAST({v!r} AS {t})"

    key = "named_struct(" + ", ".join(
        f"'{c}', `{c}`" for c in order_cols
    ) + ")"
    cut_sql = []
    for b in cuts:
        fields = []
        for c, t, v in zip(order_cols, types, b):
            s = lit(v, t)
            if s is None:
                return None
            fields.append(f"'{c}', {s}")
        cut_sql.append("named_struct(" + ", ".join(fields) + ")")

    def tree(lo: int, hi: int) -> str:
        if lo == hi:
            return str(lo)
        mid = (lo + hi + 1) // 2
        return (
            f"(CASE WHEN {key} >= {cut_sql[mid - 1]} "
            f"THEN {tree(mid, hi)} ELSE {tree(lo, mid - 1)} END)"
        )

    return f"CAST({tree(0, len(cuts))} AS INT)"


def _prefix_window() -> Window:
    """Exclusive-prefix frame over the per-bucket stats table: bucket ids
    are ascending in key order by construction, so ordering by ``_PID``
    IS the key order. Single-task by design — the input is <= n rows
    regardless of data size."""
    return Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    *,
    num_partitions: int | None = None,
    n_rows: int | None = None,
    boundaries: list[tuple] | None = None,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Global 1-based row_number over ``order_cols`` (ascending), O(rows /
    num_partitions) per-task state. With ``n_rows`` below the small-input
    threshold, falls back to a plain window (cheaper at that size)."""
    return _ranked_with_stats(
        df, order_cols, rank_col,
        num_partitions=num_partitions, n_rows=n_rows,
        boundaries=boundaries, bucket_expr=bucket_expr,
    )[0]


def _ranked_with_stats(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str,
    *,
    num_partitions: int | None = None,
    n_rows: int | None = None,
    boundaries: list[tuple] | None = None,
    bucket_expr: Column | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """``with_global_rank`` plus the per-bucket stats table the
    distributed path already declared (``_n`` counts — a row total is one
    tiny aggregate away) — None on the small-window path, where the
    caller can afford a count()."""
    if n_rows is not None and n_rows < SMALL_INPUT_ROWS:
        w = Window.orderBy(*[F.col(c).asc() for c in order_cols])
        ranked = df.withColumn(
            rank_col, F.row_number().over(w).cast("long")
        )
        return ranked, None
    d = _bucketized(df, order_cols, num_partitions, boundaries, bucket_expr)
    w = Window.partitionBy(_PID).orderBy(*[F.col(c).asc() for c in order_cols])
    local = d.withColumn("_local", F.row_number().over(w))
    # stats derive from the WINDOWED frame, not from d: both branches
    # then share the _PID hash exchange (ReuseExchange — an optimization
    # only; buckets are literal-deterministic, so a failed reuse costs a
    # recompute, never correctness). max(_local) == the bucket count.
    stats = local.groupBy(_PID).agg(
        F.max("_local").cast("long").alias("_n")
    )
    offs = stats.select(
        _PID,
        F.coalesce(
            F.sum("_n").over(_prefix_window()), F.lit(0).cast("long")
        ).alias("_off"),
    )
    out = (
        local.join(F.broadcast(offs), _PID)
        .withColumn(rank_col, (F.col("_local") + F.col("_off")).cast("long"))
        .drop(_PID, "_local", "_off")
    )
    return out, stats


def with_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: Column | str,
    out_col: str = "running_sum",
    *,
    num_partitions: int | None = None,
    n_rows: int | None = None,
    boundaries: list[tuple] | None = None,
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
    d = _bucketized(df.withColumn("_v", v), order_cols, num_partitions, boundaries)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = d.withColumn("_local", F.sum("_v").over(w))
    # bucket total = the running sum AT THE BUCKET'S LAST ROW (max_by on
    # the sort key), read off the WINDOWED frame — the stats branch then
    # shares the _PID hash exchange with the data branch (ReuseExchange;
    # an optimization only — buckets are literal-deterministic, so a
    # failed reuse costs a recompute, never correctness). The prefix
    # offsets fold the bucket totals left-to-right in key order — exact
    # for integer sums (stays long: no float offset losing bits past
    # 2^53 on a 100 TB token cumsum); for doubles the totals-of-totals
    # association still differs from one global element fold (the
    # module-head double caveat stands)
    stats = local.groupBy(_PID).agg(
        F.max_by(
            F.col("_local"), F.struct(*[F.col(c) for c in order_cols])
        ).alias("_s")
    )
    zero = F.lit(0).cast(stats.schema["_s"].dataType)
    offs = stats.select(
        _PID,
        F.coalesce(F.sum("_s").over(_prefix_window()), zero).alias("_off"),
    )
    return (
        local.join(F.broadcast(offs), _PID)
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
    boundaries: list[tuple] | None = None,
) -> DataFrame:
    """Global running minimum of ``value_col`` in ``order_cols`` order."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    if n_rows is not None and n_rows < SMALL_INPUT_ROWS:
        w = Window.orderBy(*[F.col(c).asc() for c in order_cols]).rowsBetween(
            Window.unboundedPreceding, 0
        )
        return df.withColumn(out_col, F.min(v).over(w))
    d = _bucketized(df.withColumn("_v", v), order_cols, num_partitions, boundaries)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = d.withColumn("_local", F.min("_v").over(w))
    # stats off the WINDOWED frame (shared _PID exchange — see
    # with_running_sum). NULL offset (first bucket / all-null prefix)
    # stays NULL — `least` ignores nulls, so no sentinel value can leak
    # into results (a numeric sentinel would pose as a legitimate
    # running min); the prefix MIN keeps _v's exact type (no float(id)
    # bit loss past 2^53)
    stats = local.groupBy(_PID).agg(F.min("_v").alias("_m"))
    offs = stats.select(
        _PID, F.min("_m").over(_prefix_window()).alias("_off")
    )
    return (
        local.join(F.broadcast(offs), _PID)
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
    NO single-partition window over the data (the last row overall gets
    NULL leads).

    ``lead_cols`` maps output column name -> source column name. Scale
    path: bucket on the sort key, per-bucket ``lead``, then patch each
    bucket's last row with the *next* non-empty bucket's first-row values
    — an O(n)-row stats branch. The ordering columns must be non-null and
    totally order the rows (append a unique tie-breaker), as everywhere
    in this module.
    """
    if n_rows is not None and n_rows < SMALL_INPUT_ROWS:
        w = Window.orderBy(*[F.col(c).asc() for c in order_cols])
        out = df
        for out_col, src in lead_cols.items():
            out = out.withColumn(out_col, F.lead(src).over(w))
        return out

    srcs = sorted(set(lead_cols.values()))
    d = _bucketized(df, order_cols, num_partitions)
    w = Window.partitionBy(_PID).orderBy(*[F.col(c).asc() for c in order_cols])
    # order cols are non-null, so a null local lead of one of them marks the
    # bucket's last row (a legitimately-null source value does not).
    local = d.withColumn("_at_end", F.lead(order_cols[0]).over(w).isNull())
    for out_col, src in lead_cols.items():
        local = local.withColumn(f"_lead_{out_col}", F.lead(src).over(w))
    # first row (in sort order) of each bucket: min of a struct whose
    # leading fields are the full (total) ordering key, trailing fields
    # the source values — lexicographic struct min selects that row's
    # values. Derived from the WINDOWED frame so the stats branch shares
    # the _PID exchange (see with_running_sum). (dedupe: a source that
    # IS an order column reuses its key field, so getField stays
    # unambiguous)
    extra = [s for s in srcs if s not in order_cols]
    firsts = local.groupBy(_PID).agg(
        F.min(F.struct(*order_cols, *extra)).alias("_lo")
    )
    # each bucket's successor-first-row values: lead(1) over the tiny
    # stats table in bucket order (empty buckets have no stats row, so
    # lead lands on the next NON-EMPTY bucket; NULL for the global last)
    nxt = firsts.select(
        F.col(_PID),
        *[
            F.lead(F.col("_lo").getField(c))
            .over(Window.orderBy(_PID))
            .alias(f"_nx_{c}")
            for c in srcs
        ],
    )
    nxt_df = F.broadcast(nxt)

    out = local.join(nxt_df, _PID)
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
    over the data (scale path for functions.stats.bh_adjust; reference
    dm.py:475-477).

    p_adj_i = min_{j>=i}(p_(j) * n / j), clipped to 1.

    FUSED single-exchange design (VERDICT r7 "what's wrong" #1: the
    rank-then-rerank composition paid a second full data shuffle plus a
    boundary-sample pass that re-executed the whole rank plan): both
    directions run over ONE bucketization of the p-order —
    the ascending row_number gives the rank, and the suffix minimum is
    a RUNNING min over the reversed in-bucket order (min is
    order-insensitive), so suffix-min within bucket + exclusive
    suffix-min over the per-bucket stats (tiny, broadcast back) is
    exactly min_{j>=i}. One data shuffle total; every branch hangs off
    the same ``_PID`` exchange (ReuseExchange; buckets are
    literal-deterministic, so a failed reuse costs a recompute, never
    correctness). The reverse-order window costs one extra in-partition
    sort — never use a (currentRow, unboundedFollowing) frame for this:
    Spark evaluates shrinking frames by re-scanning the remainder per
    row, O(rows^2) per bucket.
    """
    ties = tie_cols or []
    nn = df.filter(F.col(p_col).isNotNull())
    n = nn.count()
    order = [p_col, *ties]
    if n < SMALL_INPUT_ROWS:
        w = Window.orderBy(*[F.col(c).asc() for c in order])
        ranked = nn.withColumn(
            "_bh_rank", F.row_number().over(w).cast("long")
        ).withColumn(
            "_bh_raw",
            F.col(p_col) * F.lit(float(n)) / F.col("_bh_rank"),
        )
        # suffix min as a RUNNING min over the reversed total order —
        # NOT a (currentRow, unboundedFollowing) frame: Spark's
        # shrinking-frame WindowExec re-scans the remaining frame per
        # row, O(rows^2) per partition (measured 27 s vs 1.3 s on a
        # 150 k-row input; count()-timed benches masked it because a
        # cardinality-preserving window is pruned from a count plan).
        # The reverse order MUST be over the unique _bh_rank, not the
        # data columns: when ties in (p, tie_cols) don't totalize the
        # order, a stable DESC sort keeps tied rows in the same relative
        # order as the ASC sort — not the exact reverse — so a tied
        # row's running min would miss its partner's smaller p*n/rank.
        w_rev = Window.orderBy(F.col("_bh_rank").desc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return (
            ranked.withColumn("_bh_min", F.min("_bh_raw").over(w_rev))
            .withColumn(out_col, F.least(F.lit(1.0), F.col("_bh_min")))
            .drop("_bh_rank", "_bh_raw", "_bh_min")
        )
    d = _bucketized(nn, order, num_partitions)
    w = Window.partitionBy(_PID).orderBy(*[F.col(c).asc() for c in order])
    local = d.withColumn("_local", F.row_number().over(w))
    stats = local.groupBy(_PID).agg(
        F.max("_local").cast("long").alias("_n")
    )
    offs = stats.select(
        _PID,
        F.coalesce(
            F.sum("_n").over(_prefix_window()), F.lit(0).cast("long")
        ).alias("_off"),
    )
    ranked = (
        local.join(F.broadcast(offs), _PID)
        .withColumn(
            "_bh_rank", (F.col("_local") + F.col("_off")).cast("long")
        )
        .withColumn(
            "_bh_raw",
            F.col(p_col) * F.lit(float(n)) / F.col("_bh_rank"),
        )
    )
    # suffix min within the bucket (current row included) — a RUNNING
    # min over the REVERSED in-bucket order: same _PID partitioning (no
    # new exchange), one extra in-partition sort. A (currentRow,
    # unboundedFollowing) frame is the wrong tool: Spark's
    # shrinking-frame WindowExec re-scans the remaining frame per row,
    # O(rows^2) per bucket (see the small-path note above). Reverse
    # over the unique in-bucket row_number `_local`, never the data
    # columns — with ties a stable DESC sort is not the exact reverse
    # of the rank order (see the small-path note).
    w_rev = Window.partitionBy(_PID).orderBy(
        F.col("_local").desc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = ranked.withColumn("_bh_sufmin", F.min("_bh_raw").over(w_rev))
    # per-bucket total min -> EXCLUSIVE suffix min over later buckets
    # (tiny stats table; NULL for the last bucket — least() ignores it)
    bstats = ranked.groupBy(_PID).agg(F.min("_bh_raw").alias("_bmin"))
    w_later = Window.orderBy(_PID).rowsBetween(1, Window.unboundedFollowing)
    boffs = bstats.select(
        _PID, F.min("_bmin").over(w_later).alias("_bh_later")
    )
    return (
        ranked.join(F.broadcast(boffs), _PID)
        .withColumn(
            out_col,
            F.least(
                F.lit(1.0),
                F.least(F.col("_bh_sufmin"), F.col("_bh_later")),
            ),
        )
        .drop(
            _PID, "_local", "_off",
            "_bh_rank", "_bh_raw", "_bh_sufmin", "_bh_later",
        )
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
    single-partition NTILE window over the data, and the result is
    bit-identical to any engine's NTILE given the same total order
    (ties are broken by ``tiebreak_cols``, so make value+tiebreak a
    total order for determinism).

    Preconditions (module-wide): ``value_col`` and ``tiebreak_cols``
    must be non-NULL — engines disagree on NULL placement anyway
    (Spark ASC is NULLS FIRST, DuckDB NULLS LAST). Filter or impute
    NULLs first.

    Pure integer arithmetic after the rank. On the scale path the row
    total is one tiny SUM over the rank's own per-bucket stats table,
    broadcast back as a 1-row scalar (no driver round-trip, no second
    data pass); only the sub-threshold small path pays a count() and
    inlines literals."""
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    order = [value_col, *tiebreak_cols]
    ranked, stats = _ranked_with_stats(
        df, order, "_qd_rank",
        num_partitions=num_partitions, n_rows=n_rows,
    )
    # integral `div` over longs — exact, no double round-trip;
    # ceil(a/b) == (a + b - 1) div b for positive a, b
    if stats is None:  # small-window path: the input is cheap to count
        total = df.count()
        q, r = divmod(total, n_bins)
        cutoff = r * (q + 1)
        qs = max(q, 1)  # q == 0 => cutoff == total, div never taken
        bucket = F.expr(
            f"CASE WHEN _qd_rank <= {cutoff}L"
            f" THEN (_qd_rank + {q}L) div {q + 1}L"
            f" ELSE {r}L + ((_qd_rank - {cutoff}L + {qs - 1}L) div {qs}L)"
            f" END"
        )
        return ranked.withColumn(bucket_col, bucket.cast("int")).drop(
            "_qd_rank"
        )
    tot = stats.agg(
        F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("_qd_tot")
    )
    # same NTILE arithmetic with the total as a broadcast scalar column
    # (the 1-row crossJoin plans as a BNLJ by design — SCALAR_AGG shape)
    q = f"(_qd_tot div {n_bins}L)"
    r = f"(_qd_tot % {n_bins}L)"
    cutoff = f"({r} * ({q} + 1L))"
    qs = f"greatest({q}, 1L)"
    bucket = F.expr(
        f"CASE WHEN _qd_rank <= {cutoff}"
        f" THEN (_qd_rank + {q}) div ({q} + 1L)"
        f" ELSE {r} + ((_qd_rank - {cutoff} + {qs} - 1L) div {qs})"
        f" END"
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn(bucket_col, bucket.cast("int"))
        .drop("_qd_rank", "_qd_tot")
    )
