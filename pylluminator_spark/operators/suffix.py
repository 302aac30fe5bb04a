"""Distributed suffix-array machinery and EXACT substring deduplication.

The full Lee et al. 2021 ("Deduplicating Training Data Makes Language
Models Better", ExactSubstr) method, Spark-first: the repo's
`repeated_spans` (operators/corpus.py) is the strided HASHED
approximation — collision-prone and window-stride quantized; this
module is the exact machinery it approximates.

Design — prefix doubling as relational algebra (Manber-Myers):

    rank_1(i)   = code point of S[i]
    rank_2w(i)  = dense_rank( (rank_w(i), rank_w(i+w)) )

Each doubling round is: one positional self-equijoin (shuffled on
(doc, pos) — co-partitioned both sides), one DISTINCT over the rank
pairs, one GLOBAL DENSE RANK of the distinct pairs (the scale-safe
two-phase `with_global_rank` — never a single-partition sort of the
data), and one join back. After ceil(log2 L) - 1 rounds two length-L
windows are equal IFF their (rank_w(i), rank_w(i + L - w)) pairs are
equal — EXACT equality, no hash collisions, decided by integer pairs.

Scale story: rows are per-CHARACTER (the inherent cost of suffix
methods — Lee et al. pay the same O(n)); every stage is a keyed
equi-join / hash aggregate / per-document window, so the plan scales
with partitions. log2(L) rounds of 3-4 shuffles each; ranks never
leave the cluster. Documents are independent suffix universes (windows
never cross documents), while RANKS are global — equal substrings in
different documents compare equal, which is what makes cross-document
duplicate detection work.

Oracle story: on a testable corpus the same flagged-window set is
computable by grouping literal length-L substrings (DuckDB
substr + COUNT OVER) — a cross-check of the entire doubling machinery
against a formulation that shares no code with it.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pylluminator_spark.functions.text import char_grams_expr, let_expr
from pylluminator_spark.operators.ordered import with_global_rank
from pylluminator_spark.plans.checkpoint import stable_checkpoint


# width of the LITERAL-substring base ranking: ranking length-8 grams
# directly replaces the first three doubling rounds (1->2->4->8), each of
# which would cost a checkpoint + rank pass of its own
_BASE_WIDTH = 8


def _base_ranks(
    docs: DataFrame, doc_col: str, text_col: str, w0: int, n_bound: int
) -> DataFrame:
    """(doc, pos 1-based, rank): dense global rank of the LITERAL
    length-``w0`` substring at each position (suffixes shorter than w0
    rank by their actual remainder — a shorter string sorts before any
    extension, exactly like the doubling sentinel). Binary UTF-8 string
    order == code-point order, so the ordering agrees with the integer
    doubling rounds stacked on top.

    Doc rows are rebalanced to cluster parallelism first: the explode
    fans each row into len(text) char positions, so input partitioning
    understates the work by orders of magnitude (a one-row-group corpus
    would build its whole position table on one core). The rebalance is
    unconditional (a plain hint — no ``.rdd`` access, which would force
    plan analysis to RDD conversion): doc rows are tiny next to the
    position explode they feed."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    docs = docs.repartition(par)
    # grams built map-side from ONE char split per document (see
    # functions.text.char_grams_expr: per-position substring is an
    # O(pos) UTF-8 seek — O(len^2)/doc — and the old explode-then-
    # substring shape also copied the FULL text into every exploded
    # row). Tail positions (pos > len - w0 + 1) take their shorter
    # remainder: F.get returns NULL past the end and concat_ws skips
    # NULLs, exactly the shorter-string-sorts-first sentinel semantics.
    tail_grams = let_expr(
        F.split(F.col(text_col), ""),
        lambda a: F.transform(
            F.sequence(F.lit(1), F.size(a)),
            lambda i: F.concat_ws(
                "", *[F.get(a, i - 1 + F.lit(j)) for j in range(w0)]
            ),
        ),
    )
    grams = (
        docs.filter(F.length(text_col) >= 1)  # sequence(1,0) is [1,0]!
        .select(
            F.col(doc_col).alias("_doc"),
            F.posexplode(tail_grams).alias("_p0", "_gram"),
        )
        .select("_doc", (F.col("_p0") + 1).alias("_pos"), "_gram")
    )
    distinct = grams.select("_gram").distinct()
    rank_map = with_global_rank(
        distinct, ["_gram"], "_rank", n_rows=n_bound
    )
    return grams.join(rank_map, "_gram").select("_doc", "_pos", "_rank")


def _double_round(ranks: DataFrame, w: int, n_bound: int) -> DataFrame:
    """One prefix-doubling round: width w -> 2w. ``n_bound`` is an upper
    bound on the distinct-pair count (total positions — computed ONCE by
    the caller), used only for the rank's size dispatch: no per-round
    count job."""
    right = ranks.select(
        F.col("_doc"),
        (F.col("_pos") - w).alias("_pos"),
        F.col("_rank").alias("_r2"),
    )
    paired = (
        ranks.join(right, ["_doc", "_pos"], "left")
        # suffixes shorter than 2w pair with sentinel 0 — real dense
        # ranks are >= 1, so short suffixes can never collide with a
        # full-width substring's pair
        .withColumn("_r2", F.coalesce(F.col("_r2"), F.lit(0)))
    )
    distinct_pairs = paired.select("_rank", "_r2").distinct()
    rank_map = with_global_rank(
        distinct_pairs,
        ["_rank", "_r2"],
        "_new_rank",
        n_rows=n_bound,
    )
    return paired.join(rank_map, ["_rank", "_r2"]).select(
        "_doc", "_pos", F.col("_new_rank").alias("_rank")
    )


def _full_window_ranks(
    docs: DataFrame, doc_col: str, text_col: str, width: int
) -> DataFrame:
    """Rank table restricted to FULL windows: (doc, pos, rank) where
    ``pos`` starts a full length-``width`` window (pos <= len - width + 1)
    and equal ranks decide length-``width`` substring equality exactly.

    Equality-preserving vs ``suffix_ranks``: a dense rank over a SUBSET
    of the strings keeps equality (and order) among the survivors, and
    the windows consumer only ever compares ranks for equality. Dropping
    the short-suffix tail buys three structural savings (r9, VERDICT r8
    #5 — exact_substr_spans was the slowest gate entry at 5.1 s):

    1. the base explode emits len - w0 + 1 positions, not len — and
       needs no sentinel semantics for short remainders;
    2. every doubling round is an INNER join — a row survives to width
       2w iff its +w partner is full at width w, which is exactly the
       full-at-2w predicate, so fullness propagates by construction
       (rank_2w(i) only ever reads rank_w of full positions);
    3. the consumer's document-length join and end-of-document filter
       disappear: the shifted inner join at ``min_len - w`` admits
       exactly the full window starts (i <= len - min_len + 1 iff the
       partner at i + min_len - w is full at width w).

    At 100 TB that removes one corpus-sized doc-keyed shuffle join (the
    old ``lens`` join) and one left-join coalesce per round from the
    hot per-character table.

    The consumer compares ranks for EQUALITY only (never order), so when
    ``width <= _BASE_WIDTH`` — no doubling round at all — the literal
    gram IS the rank (an injective map preserves equality): that skips
    the DISTINCT, the global rank (boundary-sample pass + bucketized
    window + offset join), the rank-map join back, and the corpus-size
    count job — the whole ranking machinery. The shuffled key is then a
    <= _BASE_WIDTH-char string instead of a long: bounded, comparable
    bytes. Doubling rounds still require dense INTEGER ranks (pairing
    strings would double key width per round — the exact blowup prefix
    doubling exists to avoid), so the base is ranked whenever at least
    one round follows."""
    w0 = min(width, _BASE_WIDTH)
    par = docs.sparkSession.sparkContext.defaultParallelism
    docs = docs.repartition(par)
    # one char split per document, O(len) gram build, exploded rows
    # carry only the w0-char gram (see _base_ranks note)
    grams = (
        docs.filter(F.length(text_col) >= w0)
        .select(
            F.col(doc_col).alias("_doc"),
            F.posexplode(
                char_grams_expr(F.col(text_col), w0)
            ).alias("_p0", "_gram"),
        )
        .select("_doc", (F.col("_p0") + 1).alias("_pos"), "_gram")
    )
    if width <= _BASE_WIDTH:
        return grams.select(
            "_doc", "_pos", F.col("_gram").alias("_rank")
        )
    n_bound, _ = _corpus_dims(docs, text_col)
    distinct = grams.select("_gram").distinct()
    rank_map = with_global_rank(distinct, ["_gram"], "_rank", n_rows=n_bound)
    ranks = grams.join(rank_map, "_gram").select("_doc", "_pos", "_rank")
    cur = w0
    while cur < width:
        right = ranks.select(
            F.col("_doc"),
            (F.col("_pos") - cur).alias("_pos"),
            F.col("_rank").alias("_r2"),
        )
        paired = ranks.join(right, ["_doc", "_pos"])
        distinct_pairs = paired.select("_rank", "_r2").distinct()
        pair_map = with_global_rank(
            distinct_pairs, ["_rank", "_r2"], "_new_rank", n_rows=n_bound
        )
        # localCheckpoint per round — see suffix_ranks for the lineage
        # note (each round references the previous ~4 times)
        ranks = stable_checkpoint(
            paired.join(pair_map, ["_rank", "_r2"])
            .select("_doc", "_pos", F.col("_new_rank").alias("_rank"))
        )
        cur *= 2
    return ranks


def _corpus_dims(docs: DataFrame, text_col: str) -> tuple[int, int]:
    """(total positions, longest document) in one aggregate job."""
    row = docs.agg(
        F.sum(F.length(text_col)), F.max(F.length(text_col))
    ).collect()[0]
    return int(row[0] or 0), int(row[1] or 0)


def suffix_ranks(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    width: int = 16,
) -> tuple[DataFrame, int]:
    """Prefix-doubling rank table up to substring width >= ``width``
    (the next power of two; widths up to ``_BASE_WIDTH`` are ranked as
    literal substrings in one pass, no doubling). Returns
    ``((doc, pos, rank), w)`` where two positions with equal ``rank``
    start equal length-``w`` substrings (short suffixes rank by their
    actual remainder, sentinel-padded). One count job total (the
    position total, reused as the rank-dispatch bound every round)."""
    n_bound, _ = _corpus_dims(docs, text_col)
    w = 1
    while w < width:
        w *= 2
    base = min(w, _BASE_WIDTH)
    ranks = _base_ranks(docs, doc_col, text_col, base, n_bound)
    cur = base
    while cur < w:
        # localCheckpoint per round: each round's plan references the
        # previous round ~3 times (self-join + rank-map join), so an
        # unbroken lineage re-executes earlier rounds 3^t times — the
        # standard iterative-algorithm cliff. Eager checkpoint truncates
        # the lineage to the materialized blocks; the previous round's
        # blocks are released by the ContextCleaner once the new round
        # replaces them (nothing references their RDD any more). On a
        # real cluster prefer a reliable checkpoint dir for
        # executor-loss replayability.
        ranks = stable_checkpoint(_double_round(ranks, cur, n_bound))
        cur *= 2
    # NOTE: a base-only result (no doubling) is deliberately NOT
    # checkpointed even though window consumers read it twice — measured
    # at sf0.1, the eager materialization write costs more than the
    # duplicate lazy evaluation of the one-pass gram-rank plan
    return ranks, w


def suffix_array(
    docs: DataFrame,
    doc_col: str = "doc_id",
    text_col: str = "text",
    max_width: int = 1 << 20,
) -> DataFrame:
    """Per-document suffix array: (doc, pos, sa_rank) where ``sa_rank``
    is the 1-based lexicographic rank of suffix ``text[pos:]`` among the
    document's suffixes. Doubling stops once no two suffixes of the SAME
    document share a rank (one tiny aggregate over the just-checkpointed
    table per round) — NOT on global uniqueness: equal full suffixes in
    different documents keep equal global ranks at every width, which is
    correct and must not keep the loop alive. ``w >= longest document``
    is the job-free hard bound (suffixes of one document always differ,
    being distinct lengths of the same tail).

    ``max_width`` is a cost circuit-breaker, not a semantic knob: if the
    cap halts doubling while some document still has duplicate ranks,
    the result would silently fall back to the ``_pos`` tie-break —
    non-lexicographic for those suffixes — so that case RAISES instead
    (one extra tiny aggregate, paid only when the cap actually binds).
    Raise ``max_width`` past the longest repeated prefix to proceed.
    """
    n_pos, max_len = _corpus_dims(docs, text_col)
    ranks = stable_checkpoint(
        _base_ranks(docs, doc_col, text_col, _BASE_WIDTH, n_pos)
    )
    w = _BASE_WIDTH

    def _dup_in_doc() -> int:
        return (
            ranks.groupBy("_doc", "_rank")
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )

    while w < min(max_len, max_width):
        if _dup_in_doc() == 0:
            break
        # per-round checkpoint — see suffix_ranks for the lineage note
        ranks = stable_checkpoint(_double_round(ranks, w, n_pos))
        w *= 2
    if w >= max_width and w < max_len and _dup_in_doc() > 0:
        raise ValueError(
            f"suffix_array: max_width={max_width} reached at w={w} with "
            "duplicate in-document ranks remaining — sa_rank would be "
            "non-lexicographic for the tied suffixes. Raise max_width "
            "past the longest repeated prefix."
        )
    win = Window.partitionBy("_doc").orderBy("_rank", "_pos")
    return ranks.select(
        F.col("_doc").alias(doc_col),
        F.col("_pos").alias("pos"),
        F.row_number().over(win).alias("sa_rank"),
    )


def exact_substring_windows(
    docs: DataFrame,
    min_len: int = 50,
    doc_col: str = "doc_id",
    text_col: str = "text",
    keep_first: bool = True,
) -> DataFrame:
    """Positions whose length-``min_len`` window occurs elsewhere in the
    corpus — EXACTLY (rank-pair equality, zero hash-collision risk).

    ``keep_first=True`` (the Lee et al. dedup semantic) exempts the
    first occurrence of each equality group — the (doc, pos)-minimal
    one — so a later excision keeps one copy; ``False`` flags every
    occurrence (the symmetric "is duplicated" predicate).

    Returns (doc, pos) of flagged window starts.
    """
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    # width w = next power of two with w < min_len <= 2w (w = 1 covers
    # min_len <= 2); windows [i, i+L) compare equal iff the rank pairs
    # (rank_w(i), rank_w(i + L - w)) compare equal
    w = 1 if min_len <= 2 else 1 << (math.ceil(math.log2(min_len)) - 1)
    ranks = _full_window_ranks(docs, doc_col, text_col, w)
    shifted = ranks.select(
        "_doc",
        (F.col("_pos") - (min_len - w)).alias("_pos"),
        F.col("_rank").alias("_rB"),
    )
    # INNER join: the partner at pos + (min_len - w) is full at width w
    # iff pos <= len - min_len + 1, so this join IS the end-of-document
    # filter — no document-length join needed (see _full_window_ranks)
    keyed = ranks.join(shifted, ["_doc", "_pos"]).select(
        "_doc", "_pos", F.col("_rank").alias("_rA"), "_rB"
    )
    groups = keyed.groupBy("_rA", "_rB").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(F.struct("_doc", "_pos")).alias("_first"),
    )
    flagged = keyed.join(groups, ["_rA", "_rB"]).filter(F.col("_n") >= 2)
    if keep_first:
        flagged = flagged.filter(
            (F.col("_doc") != F.col("_first._doc"))
            | (F.col("_pos") != F.col("_first._pos"))
        )
    return flagged.select(
        F.col("_doc").alias(doc_col), F.col("_pos").alias("pos")
    )


def exact_substring_spans(
    docs: DataFrame,
    min_len: int = 50,
    doc_col: str = "doc_id",
    text_col: str = "text",
    keep_first: bool = True,
) -> DataFrame:
    """Maximal duplicated spans per document: the union of the flagged
    length-``min_len`` windows, merged into maximal intervals
    (gaps-and-islands over a per-document keyed window — bounded by
    document length, scale-safe). Returns
    (doc, span_start 1-based, span_end exclusive, n_windows)."""
    flagged = exact_substring_windows(
        docs, min_len, doc_col, text_col, keep_first=keep_first
    )
    return _windows_to_spans(flagged, min_len, doc_col)


def _windows_to_spans(
    flagged: DataFrame, min_len: int, doc_col: str
) -> DataFrame:
    """Merge flagged (doc, pos) window starts into maximal per-document
    spans — gaps-and-islands over a per-document keyed window (bounded
    by document length, scale-safe)."""
    wprev = (
        Window.partitionBy(doc_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # a window [i, i+L) extends the current island iff i <= max prior
    # end; islands = running count of breaks
    brk = (
        F.col("pos")
        > F.coalesce(F.max(F.col("pos") + min_len).over(wprev), F.lit(-1))
    ).cast("int")
    islanded = flagged.withColumn("_brk", brk).withColumn(
        "_island",
        F.sum("_brk").over(
            Window.partitionBy(doc_col)
            .orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        islanded.groupBy(doc_col, "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + min_len).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("_island")
    )


def exact_substring_dedup(
    docs: DataFrame,
    min_len: int = 50,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Excise duplicated spans (keep-first semantics: one occurrence of
    each duplicated substring survives somewhere in the corpus) and
    return every document with a ``deduped`` text column. The rebuild is
    a sorted fold over the document's own spans — pure expressions, at
    most (doc's span count) iterations per row, no UDF."""
    spans = exact_substring_spans(
        docs, min_len, doc_col, text_col, keep_first=True
    )
    return _excise_spans(docs, spans, doc_col, text_col)


def _excise_spans(
    docs: DataFrame, spans: DataFrame, doc_col: str, text_col: str
) -> DataFrame:
    """Every document with a ``deduped`` column: the text minus its
    ``spans`` intervals (sorted fold over the doc's own spans — pure
    expressions, no UDF; shared by in-corpus dedup and cross-corpus
    decontamination)."""
    per_doc = spans.groupBy(doc_col).agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("_spans")
    )
    joined = docs.join(per_doc, doc_col, "left")
    t = F.col(text_col)
    # fold: acc = (cursor, kept-so-far); each span appends the clean gap
    # before it and advances the cursor past the span; finish() appends
    # the tail. Spans are merged+sorted, so cursor only moves forward.
    rebuilt = F.when(F.col("_spans").isNull(), t).otherwise(
        F.aggregate(
            F.col("_spans"),
            F.struct(
                F.lit(1).cast("long").alias("cur"),
                F.lit("").alias("kept"),
            ),
            lambda acc, s: F.struct(
                s["span_end"].cast("long").alias("cur"),
                F.concat(
                    acc["kept"],
                    t.substr(
                        acc["cur"], (s["span_start"] - acc["cur"]).cast("int")
                    ),
                ).alias("kept"),
            ),
            lambda acc: F.concat(
                acc["kept"], t.substr(acc["cur"], F.length(t))
            ),
        )
    )
    return joined.withColumn("deduped", rebuilt).drop("_spans")


def cross_substring_spans(
    train: DataFrame,
    bench: DataFrame,
    min_len: int = 50,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Span-level benchmark decontamination, detection stage (Lee et
    al. 2021 ExactSubstr applied ACROSS corpora): maximal spans of each
    TRAIN document whose every length-``min_len`` window occurs
    literally somewhere in the BENCH corpus. The practical middle
    ground between doc-level decontamination (drop the whole training
    document on n-gram overlap — operators.corpus.decontaminate) and
    ignoring contamination: only the overlapping spans are reported
    (and excised by ``decontaminate_spans``), the rest of the document
    survives.

    Exactness: window equality is decided by the same full-window rank
    machinery as ``exact_substring_windows`` — integer/gram equality
    over a GLOBAL rank universe built on the union of both corpora
    (ranks must be global: a train window and a bench window compare
    equal iff their rank pairs collide), zero hash-collision risk.

    Scale shape: the union adds one tagged column; the per-(rank-pair)
    aggregate carries a 1-bit any-bench flag; everything else is the
    in-corpus spans plan (keyed equi-joins, per-document windows).

    Returns (doc_col, span_start 1-based, span_end exclusive,
    n_windows) for TRAIN documents only. Train/bench doc ids may
    overlap (the corpora are tagged internally).
    """
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    w = 1 if min_len <= 2 else 1 << (math.ceil(math.log2(min_len)) - 1)
    tagged = train.select(
        F.col(doc_col).alias("_orig"),
        F.lit(1).alias("_is_train"),
        F.col(text_col).alias("_txt"),
    ).unionByName(
        bench.select(
            F.col(doc_col).alias("_orig"),
            F.lit(0).alias("_is_train"),
            F.col(text_col).alias("_txt"),
        )
    )
    # composite doc key keeps same-id train/bench docs distinct while
    # flowing through the (single-column) rank machinery
    union = tagged.select(
        F.struct(F.col("_is_train"), F.col("_orig")).alias("_doc"),
        F.col("_txt"),
    )
    ranks = _full_window_ranks(union, "_doc", "_txt", w)
    shifted = ranks.select(
        "_doc",
        (F.col("_pos") - (min_len - w)).alias("_pos"),
        F.col("_rank").alias("_rB"),
    )
    keyed = ranks.join(shifted, ["_doc", "_pos"]).select(
        "_doc", "_pos", F.col("_rank").alias("_rA"), "_rB"
    )
    # 1-bit per rank-pair group: does ANY bench window carry it?
    groups = keyed.groupBy("_rA", "_rB").agg(
        F.max(
            F.when(F.col("_doc._is_train") == 0, 1).otherwise(0)
        ).alias("_has_bench")
    )
    flagged = (
        keyed.filter(F.col("_doc._is_train") == 1)
        .join(groups.filter(F.col("_has_bench") == 1), ["_rA", "_rB"])
        .select(
            F.col("_doc._orig").alias(doc_col), F.col("_pos").alias("pos")
        )
    )
    return _windows_to_spans(flagged, min_len, doc_col)


def decontaminate_spans(
    train: DataFrame,
    bench: DataFrame,
    min_len: int = 50,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Excise every benchmark-overlapping span (``cross_substring_spans``)
    from the training documents: every train document survives, with a
    ``deduped`` column holding the text minus its contaminated spans
    (same sorted-fold rebuild as ``exact_substring_dedup`` — pure
    expressions, no UDF)."""
    spans = cross_substring_spans(
        train, bench, min_len, doc_col, text_col
    )
    return _excise_spans(train, spans, doc_col, text_col)
