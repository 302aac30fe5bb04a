"""Corpus-level training-data operators: quality-rule filtering, repetition
signals, benchmark decontamination, and BM25 relevance ranking.

These are beyond-reference operators (driver north star) modeled on the
published large-corpus pipeline recipes — the Gopher quality rules
(Rae et al. 2021, "Scaling Language Models", §A1.1), C4's heuristics
(Raffel et al. 2020), GPT-3-style n-gram decontamination (Brown et al. 2020,
Appendix C), and BM25 (Robertson & Spärck Jones) — re-expressed as Spark
DataFrame dataflow.

Scale design: every operator is a single explode -> hash-aggregate keyed by
(doc_id[, term]) — partial aggregation map-side, one shuffle on the document
key, no per-row quadratic array ops, no Python in the hot path. The corpus
scalars BM25 needs (N, avgdl) are a 1-row aggregate broadcast back; the
benchmark side of decontamination is dimension-sized (benchmarks are MBs
even when the corpus is 100 TB) and is broadcast-joined.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pylluminator_spark.functions.text import (
    STOPWORDS_EN,
    token_count_expr,
    tokens_expr,
    word_shingles_expr,
)

# ---------------------------------------------------------------------------
# Per-document token statistics (one explode + one doc-keyed aggregation)
# ---------------------------------------------------------------------------


def _token_counts(
    docs: DataFrame, text_col: str = "text", doc_col: str = "doc_id"
) -> DataFrame:
    """(doc, token) -> occurrence count. The shared first stage: explode the
    token stream once, hash-aggregate with map-side partial combine."""
    toks = docs.select(
        doc_col, F.explode(tokens_expr(F.lower(F.col(text_col)))).alias("token")
    )
    return toks.groupBy(doc_col, "token").agg(F.count(F.lit(1)).alias("cnt"))


def gopher_signals(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """Gopher-rule quality signals per document, from ONE token aggregation:

    - ``n_words``, ``n_distinct`` — vocabulary size vs length
    - ``mean_word_len`` — Gopher keeps documents with mean word length 3-10
    - ``alpha_ratio`` — fraction of words containing an alphabetic character
      (Gopher: >= 0.8 must)
    - ``stopword_hits`` — count of English stopwords (Gopher: >= 2 distinct)
    - ``dup_word_fraction`` — 1 - distinct/total (repetition proxy)
    - ``top_word_fraction`` — most frequent word's share of all words

    All signals derive from (token, count) pairs, so the whole operator is a
    single shuffle keyed by the document id.
    """
    sw = [w.lower() for w in (stopwords or STOPWORDS_EN)]
    sw_arr = F.array(*[F.lit(w) for w in sw])
    tc = _token_counts(docs, text_col, doc_col)
    agg = tc.groupBy(doc_col).agg(
        F.sum("cnt").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("_top_cnt"),
        F.sum(F.length("token") * F.col("cnt")).alias("_char_sum"),
        F.sum(
            F.when(F.col("token").rlike("[a-zA-Z]"), F.col("cnt")).otherwise(
                F.lit(0)
            )
        ).alias("_alpha_words"),
        F.sum(
            F.when(F.array_contains(sw_arr, F.col("token")), F.col("cnt"))
            .otherwise(F.lit(0))
        ).alias("stopword_hits"),
    )
    nw = F.col("n_words").cast("double")
    return agg.select(
        doc_col,
        "n_words",
        "n_distinct",
        (F.col("_char_sum") / nw).alias("mean_word_len"),
        (F.col("_alpha_words") / nw).alias("alpha_ratio"),
        "stopword_hits",
        (F.lit(1.0) - F.col("n_distinct") / nw).alias("dup_word_fraction"),
        (F.col("_top_cnt") / nw).alias("top_word_fraction"),
    )


def gopher_keep_expr(
    *,
    n_words: Column | None = None,
    mean_word_len: Column | None = None,
    alpha_ratio: Column | None = None,
    stopword_hits: Column | None = None,
    dup_word_fraction: Column | None = None,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_ratio: float = 0.8,
    min_stopword_hits: int = 2,
    max_dup_word_fraction: float = 0.63,
) -> Column:
    """The Gopher keep/drop decision over the signal columns (thresholds are
    the published defaults; word-count band narrowed from 50..100k)."""
    n_words = n_words if n_words is not None else F.col("n_words")
    mean_word_len = (
        mean_word_len if mean_word_len is not None else F.col("mean_word_len")
    )
    alpha_ratio = alpha_ratio if alpha_ratio is not None else F.col("alpha_ratio")
    stopword_hits = (
        stopword_hits if stopword_hits is not None else F.col("stopword_hits")
    )
    dup_word_fraction = (
        dup_word_fraction
        if dup_word_fraction is not None
        else F.col("dup_word_fraction")
    )
    return (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (alpha_ratio >= min_alpha_ratio)
        & (stopword_hits >= min_stopword_hits)
        & (dup_word_fraction <= max_dup_word_fraction)
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Gopher repetition signals over word n-grams (default bigrams):

    - ``n_ngrams`` — total n-grams in the document
    - ``top_ngram_fraction`` — share taken by the single most frequent n-gram
    - ``dup_ngram_fraction`` — share of n-gram occurrences beyond the first
      occurrence of each distinct n-gram (1 - distinct/total)

    Explode + doc-keyed aggregate: scales linearly, one shuffle. Documents
    shorter than ``n`` tokens are reported with zero fractions.
    """
    toks = tokens_expr(F.lower(F.col(text_col)))
    grams = docs.select(
        doc_col, F.explode(word_shingles_expr(toks, n)).alias("gram")
    )
    per_gram = grams.groupBy(doc_col, "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    agg = per_gram.groupBy(doc_col).agg(
        F.sum("cnt").alias("n_ngrams"),
        F.count(F.lit(1)).alias("_n_distinct"),
        F.max("cnt").alias("_top_cnt"),
    )
    total = F.col("n_ngrams").cast("double")
    stats = agg.select(
        doc_col,
        "n_ngrams",
        (F.col("_top_cnt") / total).alias("top_ngram_fraction"),
        (F.lit(1.0) - F.col("_n_distinct") / total).alias("dup_ngram_fraction"),
    )
    # re-attach docs with < n tokens (they produce no gram rows)
    base = docs.select(doc_col)
    return (
        base.join(stats, doc_col, "left")
        .select(
            doc_col,
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("top_ngram_fraction", F.lit(0.0)).alias(
                "top_ngram_fraction"
            ),
            F.coalesce("dup_ngram_fraction", F.lit(0.0)).alias(
                "dup_ngram_fraction"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination (GPT-3-style n-gram overlap)
# ---------------------------------------------------------------------------


def ngram_overlap(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Training-set decontamination: for each candidate document, count how
    many of its DISTINCT word n-grams also appear anywhere in the benchmark
    set (GPT-3 used 13-grams; ``n`` is a knob because test corpora are
    shorter). Returns only contaminated docs:
    ``(doc_id, n_grams, n_overlapping, overlap_fraction)``.

    The benchmark side is collapsed to its distinct n-gram set and
    broadcast — benchmarks are dimension-sized (MBs) even at a 100 TB
    training corpus, so the probe is a map-side broadcast semi-join; the
    only shuffle is the doc-keyed count aggregation.
    """
    toks = tokens_expr(F.lower(F.col(text_col)))
    # one shuffle dedups grams within each doc; the broadcast left join tags
    # benchmark hits map-side; one more doc-keyed aggregate produces both
    # counts at once (no separate totals/hits branches to re-join)
    doc_grams = docs.select(
        doc_col, F.explode(word_shingles_expr(toks, n)).alias("gram")
    ).distinct()
    bench_grams = (
        benchmark.select(
            F.explode(
                word_shingles_expr(tokens_expr(F.lower(F.col(text_col))), n)
            ).alias("gram")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    tagged = doc_grams.join(F.broadcast(bench_grams), "gram", "left")
    return (
        tagged.groupBy(doc_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce("_hit", F.lit(0))).alias("n_overlapping"),
        )
        .filter(F.col("n_overlapping") > 0)
        .select(
            doc_col,
            "n_grams",
            "n_overlapping",
            (F.col("n_overlapping") / F.col("n_grams").cast("double")).alias(
                "overlap_fraction"
            ),
        )
    )


def ngram_containment_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_containment: float = 0.5,
    text_col: str = "text",
    doc_col: str = "doc_id",
    bench_col: str = "bench_id",
) -> DataFrame:
    """FUZZY decontamination: per-(training doc, benchmark doc) n-gram
    containment — the near-match variant practitioners run after
    ``ngram_overlap``\'s set-level exact screen (the PaLM/Llama-style
    "contaminated if >= X% of the eval doc\'s n-grams appear in a
    training doc" rule; containment rather than Jaccard because a long
    training doc can swallow a short benchmark doc whole while their
    union-based similarity stays near zero). Returns

        (doc_id, bench_id, n_shared, bench_grams, containment)

    with ``containment = |grams(doc) ∩ grams(bench)| / |grams(bench)|``
    over DISTINCT word n-grams, filtered to pairs at or above
    ``min_containment``; a benchmark doc shorter than ``n`` tokens has
    no grams and can never be reported.

    Scale: the benchmark side is dimension-sized (MBs against a 100 TB
    corpus), so its exploded gram table is BROADCAST — the probe is a
    map-side hash join against the training gram stream, and the only
    shuffles are the within-doc gram dedup and the (doc, bench) pair
    aggregation. Pair fan-out is bounded by the benchmark\'s total gram
    volume: a training gram joins at most df_bench(gram) rows, so the
    worst case is |train grams| x max benchmark df, never a cross
    product. Reference analogue: the reference\'s probe-overlap screens
    are single-table; pair-level containment is the corpus-pipeline
    extension (SURVEY §2 beyond-reference block)."""
    toks = tokens_expr(F.lower(F.col(text_col)))
    doc_grams = docs.select(
        doc_col, F.explode(word_shingles_expr(toks, n)).alias("gram")
    ).distinct()
    bench_grams = benchmark.select(
        F.col(doc_col).alias(bench_col),
        F.explode(
            word_shingles_expr(tokens_expr(F.lower(F.col(text_col))), n)
        ).alias("gram"),
    ).distinct()
    bench_sizes = bench_grams.groupBy(bench_col).agg(
        F.count(F.lit(1)).alias("bench_grams")
    )
    shared = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(doc_col, bench_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(F.broadcast(bench_sizes), bench_col)
        .withColumn(
            "containment",
            F.col("n_shared") / F.col("bench_grams").cast("double"),
        )
        .filter(F.col("containment") >= F.lit(float(min_containment)))
        .select(
            doc_col, bench_col, "n_shared", "bench_grams", "containment"
        )
    )


# ---------------------------------------------------------------------------
# Unigram language-model scoring (CCNet-style quality signal)
# ---------------------------------------------------------------------------


def unigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    vocab_size: int | None = None,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document average negative log-likelihood under an add-``alpha``
    unigram LM fit on the corpus itself — the shape of CCNet's
    LM-perplexity quality bucket (Wenzek et al. 2020), with the corpus
    standing in for the clean reference corpus. Low score = typical
    language; high score = rare-token soup.

    ``p(t) = (cnt(t) + alpha) / (T + alpha * (V + 1))``; tokens beyond the
    ``vocab_size`` most frequent (when set) share one OOV estimate —
    that cap is what keeps the broadcast vocabulary dimension-sized on a
    100 TB corpus. Dataflow: one token explode feeding both the vocab
    aggregate and the (doc, term) counts; the per-doc score folds the term
    contributions in SORTED term order, so the float sum is reproducible
    across engines and partitionings.
    """
    dt = _token_counts(docs, text_col, doc_col).select(
        doc_col, F.col("token").alias("term"), F.col("cnt").alias("dcnt")
    )
    vocab = dt.groupBy("term").agg(F.sum("dcnt").alias("cnt"))
    if vocab_size is not None:
        vocab = vocab.orderBy(F.desc("cnt"), "term").limit(vocab_size)
    corpus = vocab.agg(
        F.sum("cnt").alias("t_total"), F.count(F.lit(1)).alias("v_size")
    )
    denom = F.col("t_total") + alpha * (F.col("v_size") + F.lit(1.0))
    contrib = (
        dt.join(F.broadcast(vocab), "term", "left")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "_c",
            F.col("dcnt")
            * F.log((F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(alpha)) / denom),
        )
    )
    agg = contrib.groupBy(doc_col).agg(
        F.sum("dcnt").alias("n_tokens"),
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct(F.col("term"), F.col("_c").alias("c")))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["c"],
        ).alias("_s"),
    )
    return agg.select(
        doc_col,
        "n_tokens",
        (-F.col("_s") / F.col("n_tokens")).alias("avg_nll"),
    )


def _bigram_doc_counts(
    docs: DataFrame, text_col: str, doc_col: str
) -> DataFrame:
    """(doc, u, w, dcnt): per-document bigram counts over the lowercased
    whitespace tokens — the shared base of the model-fit and scoring
    sides of ``bigram_lm_scores``."""
    toks = docs.select(
        doc_col, tokens_expr(F.lower(F.col(text_col))).alias("_t")
    ).withColumn("_n", F.size("_t"))
    big = (
        toks.filter(F.col("_n") >= 2)
        .select(
            doc_col,
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("_t"), 1, F.col("_n") - 1).alias("u"),
                    F.slice(F.col("_t"), 2, F.col("_n") - 1).alias("w"),
                )
            ).alias("_b"),
        )
        .select(doc_col, F.col("_b.u").alias("u"), F.col("_b.w").alias("w"))
    )
    return big.groupBy(doc_col, "u", "w").agg(
        F.count(F.lit(1)).alias("dcnt")
    )


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    *,
    alpha: float = 1.0,
    backoff: float = 0.4,
    min_bigram_count: int = 1,
    reference: DataFrame | None = None,
) -> DataFrame:
    """Per-document average negative log-likelihood under a BIGRAM LM with
    stupid backoff (Brants et al. 2007, the web-scale scheme KenLM-style
    CCNet filters approximate) fit on the corpus itself:

        p(w | u) = c(u, w) / c(u)                  if c(u, w) >= min_count
                 = backoff * (c(w)+alpha)/(T+alpha*(V+1))   otherwise

    (the backed-off term is an add-``alpha`` unigram estimate over
    CONTINUATION positions — c(w), T, V count tokens as they appear in
    the w slot of a bigram, so doc-initial tokens are excluded; this is
    NOT the same distribution as ``unigram_lm_scores``' all-token vocab,
    and the two tables are not interchangeable). Unseen continuation
    words stay finite via the +alpha. Returns (doc_col, n_bigrams,
    avg_nll); documents with fewer than two tokens have no bigrams and
    are absent.

    Scale shape: the BIGRAM model table is corpus-sized, NOT
    dimension-sized, so it is never broadcast — doc bigram counts join it
    with a hash equi-join on (u, w); ``min_bigram_count`` is the standard
    count-prune that shrinks the model table by orders of magnitude at
    100 TB (pruned bigrams fall through to backoff). Only the 1-row
    corpus scalars are hint-broadcast; the vocab-sized unigram table
    joins without a hint so AQE broadcasts it when small and hash-joins
    at web-scale vocabularies. The per-doc float sum folds term
    contributions in SORTED (u, w) order — reproducible across engines
    and partitionings, same discipline as ``unigram_lm_scores``.

    ``reference`` (CCNet, Wenzek et al. 2020): fit the model on a
    DIFFERENT corpus (same ``text_col``/``doc_col`` schema) and score
    ``docs`` under it — perplexity against curated text (CCNet uses
    Wikipedia) rather than self-fit. ``None`` keeps the self-fit
    semantics (model counts roll up from the scored corpus itself).
    """
    doc_big = _bigram_doc_counts(docs, text_col, doc_col)
    # model/u_tot/uni all ROLL UP from the fit-side counts; with
    # reference=None that is doc_big itself, so Spark's ReuseExchange
    # computes the tokenize + explode + (doc,u,w) shuffle ONCE and the
    # three rollups aggregate the much smaller doc_big table — the same
    # exchange-reuse shape unigram_lm_scores uses for its vocab
    ref_big = (
        doc_big
        if reference is None
        else _bigram_doc_counts(reference, text_col, doc_col)
    )
    return _score_doc_bigrams(
        doc_big, ref_big, doc_col,
        alpha=alpha, backoff=backoff, min_bigram_count=min_bigram_count,
    )


def _score_doc_bigrams(
    doc_big: DataFrame,
    ref_big: DataFrame,
    doc_col: str,
    *,
    alpha: float,
    backoff: float,
    min_bigram_count: int,
) -> DataFrame:
    """Stupid-backoff scoring of per-doc bigram counts against a model
    rolled up from ``ref_big`` — the shared tail of ``bigram_lm_scores``,
    exposed so callers scoring the SAME counts under several models
    (DoReMi's reference + self fits) tokenize the corpus once."""
    model = (
        ref_big.groupBy("u", "w")
        .agg(F.sum("dcnt").alias("cuw"))
        .filter(F.col("cuw") >= min_bigram_count)
    )
    u_tot = ref_big.groupBy("u").agg(F.sum("dcnt").alias("cu"))
    model = model.join(u_tot, "u")
    # backoff distribution over CONTINUATION positions (doc-initial
    # tokens never appear as w)
    uni = ref_big.groupBy("w").agg(F.sum("dcnt").alias("cw"))
    corpus = uni.agg(
        F.sum("cw").alias("t_total"), F.count(F.lit(1)).alias("v_size")
    )
    denom = F.col("t_total") + alpha * (F.col("v_size") + F.lit(1.0))
    # uni is vocab-sized: no broadcast hint — AQE broadcasts it when it
    # is actually small, hash-joins at web-scale vocabularies
    scored = (
        doc_big.join(model, ["u", "w"], "left")
        .join(uni.withColumnRenamed("cw", "_cw"), "w", "left")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "_p",
            F.when(
                F.col("cuw").isNotNull(), F.col("cuw") / F.col("cu")
            ).otherwise(
                F.lit(backoff)
                * (
                    (F.coalesce(F.col("_cw"), F.lit(0)) + F.lit(alpha))
                    / denom
                )
            ),
        )
        .withColumn("_c", F.col("dcnt") * F.log("_p"))
    )
    agg = scored.groupBy(doc_col).agg(
        F.sum("dcnt").alias("n_bigrams"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("u"), F.col("w"), F.col("_c").alias("c")
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["c"],
        ).alias("_s"),
    )
    return agg.select(
        doc_col,
        "n_bigrams",
        (-F.col("_s") / F.col("n_bigrams")).alias("avg_nll"),
    )


def _score_doc_bigrams_dual(
    doc_big: DataFrame,
    ref_big: DataFrame,
    self_big: DataFrame,
    doc_col: str,
    *,
    alpha: float,
    backoff: float,
    min_bigram_count: int,
) -> DataFrame:
    """Score per-doc bigram counts under TWO stupid-backoff models in
    ONE pass over ``doc_big`` — the DoReMi shape (reference fit +
    self fit over the same corpus). ``_score_doc_bigrams`` twice walks
    the corpus-sized count table twice and sorts/folds each document's
    bigrams twice; here the two models are full-outer-joined on (u, w)
    first (model-sized, not corpus-sized), so the corpus table is
    joined, sorted, and folded ONCE, with a two-double struct
    accumulator. Each document's two sums run in the same sorted (u, w)
    order over the same per-element terms as the separate scorers, so
    both NLLs are BIT-IDENTICAL to ``_score_doc_bigrams``'s (a struct
    fold updating two independent accumulators equals two separate
    folds element-for-element).

    Returns (doc_col, n_bigrams, nll_ref, nll_self)."""

    def _parts(big, tag):
        model = (
            big.groupBy("u", "w")
            .agg(F.sum("dcnt").alias(f"cuw_{tag}"))
            .filter(F.col(f"cuw_{tag}") >= min_bigram_count)
        )
        u_tot = big.groupBy("u").agg(F.sum("dcnt").alias(f"cu_{tag}"))
        model = model.join(u_tot, "u")
        uni = big.groupBy("w").agg(F.sum("dcnt").alias(f"cw_{tag}"))
        corpus = uni.agg(
            F.sum(f"cw_{tag}").alias(f"t_{tag}"),
            F.count(F.lit(1)).alias(f"v_{tag}"),
        )
        return model, uni, corpus

    m_r, uni_r, corp_r = _parts(ref_big, "r")
    m_s, uni_s, corp_s = _parts(self_big, "s")
    model = m_r.join(m_s, ["u", "w"], "full_outer")
    uni = uni_r.join(uni_s, "w", "full_outer")

    def _p(tag):
        denom = F.col(f"t_{tag}") + alpha * (F.col(f"v_{tag}") + F.lit(1.0))
        return F.when(
            F.col(f"cuw_{tag}").isNotNull(),
            F.col(f"cuw_{tag}") / F.col(f"cu_{tag}"),
        ).otherwise(
            F.lit(backoff)
            * ((F.coalesce(F.col(f"cw_{tag}"), F.lit(0)) + F.lit(alpha)) / denom)
        )

    scored = (
        doc_big.join(model, ["u", "w"], "left")
        .join(uni, "w", "left")
        .crossJoin(F.broadcast(corp_r))
        .crossJoin(F.broadcast(corp_s))
        .withColumn("_c_r", F.col("dcnt") * F.log(_p("r")))
        .withColumn("_c_s", F.col("dcnt") * F.log(_p("s")))
    )
    # one sorted collect, then TWO scalar folds over it: a scalar
    # accumulator's lambda is one field access + one add per element,
    # where the struct accumulator allocated a named_struct per step —
    # measured 1.8s -> 1.3s on the 256k-row sf0.1 count table. Two
    # independent scalar folds over the same sorted array are
    # element-for-element the same additions as the struct fold
    # (bit-identical, verified exact-equal on the full corpus).
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.col("u"),
                F.col("w"),
                F.col("_c_r").alias("cr"),
                F.col("_c_s").alias("cs"),
            )
        )
    )
    agg = scored.groupBy(doc_col).agg(
        F.sum("dcnt").alias("n_bigrams"), arr.alias("_a")
    )
    return agg.select(
        doc_col,
        "n_bigrams",
        (
            -F.aggregate("_a", F.lit(0.0), lambda acc, x: acc + x["cr"])
            / F.col("n_bigrams")
        ).alias("nll_ref"),
        (
            -F.aggregate("_a", F.lit(0.0), lambda acc, x: acc + x["cs"])
            / F.col("n_bigrams")
        ).alias("nll_self"),
    )


# ---------------------------------------------------------------------------
# Cross-document repeated-substring detection
# ---------------------------------------------------------------------------


def repeated_spans(
    docs: DataFrame,
    *,
    window: int = 40,
    stride: int = 20,
    min_docs: int = 2,
    text_col: str = "text",
    doc_col: str = "doc_id",
    fingerprint: bool = True,
) -> DataFrame:
    """Detection stage of exact substring dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): slide a
    ``window``-char window with ``stride`` over every document, key each
    span, and flag spans whose exact content recurs in >= ``min_docs``
    distinct documents. Returns ``(doc_id, offset, key, n_docs)`` — the
    offsets downstream removal would cut.

    The full suffix-array construction is replaced by strided windows: a
    repeated region of length >= window + stride is guaranteed to produce
    at least one flagged span, shorter repeats are caught with probability
    proportional to their length. Dataflow: one explode (L/stride rows per
    doc) and one key-hashed aggregate + join — linear, no quadratic pair
    generation. ``fingerprint=True`` keys spans by xxhash64 (8-byte
    shuffle keys at corpus scale); ``False`` keys by the raw span string
    (exact, ANSI-SQL-replicable — what the driver gate uses).
    """
    text = F.col(text_col)

    def _spans(t: Column) -> Column:
        idx = F.sequence(
            F.lit(0),
            F.floor((F.length(t) - window) / stride).cast("int"),
        )
        return F.when(
            F.length(t) >= window,
            F.transform(
                idx,
                lambda i: F.struct(
                    (i.cast("long") * stride).alias("offset"),
                    F.substring(t, i * stride + 1, window).alias("span"),
                ),
            ),
        ).otherwise(
            F.array().cast("array<struct<offset:bigint,span:string>>")
        )

    from pylluminator_spark.functions.text import let_expr

    key = (
        F.xxhash64(F.col("_s.span")) if fingerprint else F.col("_s.span")
    ).alias("key")
    spans = docs.select(
        doc_col, F.explode(let_expr(text, _spans)).alias("_s")
    ).select(doc_col, F.col("_s.offset").alias("offset"), key)
    counts = (
        spans.groupBy("key")
        .agg(F.countDistinct(doc_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    return spans.join(counts, "key").select(
        doc_col, "offset", "key", "n_docs"
    )


# ---------------------------------------------------------------------------
# Corpus n-gram statistics and source mixing
# ---------------------------------------------------------------------------


def top_ngrams(
    docs: DataFrame,
    n: int = 2,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide top-k word n-grams by occurrence count (the Zipf-curve /
    vocabulary-inspection primitive). Explode + hash aggregate + top-k;
    deterministic order: count descending, gram ascending."""
    toks = tokens_expr(F.lower(F.col(text_col)))
    grams = docs.select(F.explode(word_shingles_expr(toks, n)).alias("gram"))
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("gram"))
        .limit(k)
    )


def source_mixing(
    docs: DataFrame,
    weight_expr: Column,
    *,
    text_col: str = "text",
    source_col: str = "source",
    key: str = "doc_id",
    buckets: int = 10_000,
):
    """Deterministic corpus re-mixing toward target source weights — the
    data-mixing stage of a pretraining pipeline (cf. The Pile's per-source
    epochs, DoReMi's domain weights): given ``weight_expr`` (target weight
    per source, summing to ~1 over observed sources), compute per-source
    token masses ``T_s``, the feasibility scalar ``C = min_s T_s / w_s``
    (the largest total achieving the target mix by DOWNSAMPLING only),
    per-source keep rates ``r_s = min(1, w_s * C / T_s)``, and keep
    documents via the per-key deterministic arith hash.

    Returns ``(kept_df, rates_df)`` where ``rates_df`` is dimension-sized
    ``(source, tokens_total, rate)`` and ``kept_df`` is ``docs`` plus a
    ``_n_tokens`` column, filtered. All arithmetic is closed-form and
    reproducible across engines; a zero-token source yields a NULL rate and
    keeps nothing.
    """
    sized = docs.withColumn("_w", weight_expr).withColumn(
        "_n_tokens", token_count_expr(F.col(text_col))
    )
    stats = sized.groupBy(source_col, "_w").agg(
        F.sum("_n_tokens").alias("_T")
    )
    # zero-token sources are excluded from the feasibility min (they would
    # drag C to 0 and silently drop the whole corpus) and a zero weight is
    # nullif-guarded (ANSI divide-by-zero is a task failure, not NULL)
    c = stats.agg(
        F.min(
            F.when(
                F.col("_T") > 0,
                F.col("_T") / F.nullif(F.col("_w"), F.lit(0.0)),
            )
        ).alias("_C")
    )
    rates = (
        stats.crossJoin(F.broadcast(c))
        .withColumn(
            "rate",
            F.least(
                F.lit(1.0),
                F.col("_w") * F.col("_C") / F.nullif(F.col("_T"), F.lit(0)),
            ),
        )
        .withColumn("_thr", F.floor(F.col("rate") * buckets))
    )
    from pylluminator_spark.operators.sampling import arith_bucket_expr

    kept = sized.join(
        F.broadcast(rates.select(source_col, "_thr")), source_col
    ).filter(arith_bucket_expr(F.col(key), buckets) < F.col("_thr"))
    return (
        kept.drop("_w", "_thr"),
        rates.select(
            source_col, F.col("_T").alias("tokens_total"), "rate"
        ),
    )


# ---------------------------------------------------------------------------
# Sequence packing (pretraining batch prep)
# ---------------------------------------------------------------------------


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    doc_col: str = "doc_id",
    token_offset: int = 0,
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences: documents
    are taken in ``doc_col`` order and sequence ``seq_id`` starts where the
    running token total crosses another multiple of ``budget`` (a document
    belongs to the sequence its first token falls in — the simple
    deterministic packing rule; no bin-packing search, no split docs).

    The global running total uses operators.ordered.with_running_sum —
    size-dispatched between a plain window and the range-partitioned
    two-phase path, so the packing scales past the single-partition window
    limit. Returns ``(doc_id, n_tokens, seq_id)``.

    ``token_offset`` shifts the running total before the division — the
    INCREMENTAL-append knob: pack a new batch with ``token_offset`` set
    to the base corpus's total token count and the batch's sequence ids
    continue exactly where the base's packing left off (equivalent to
    packing the concatenated corpora in one pass, for documents in
    ``doc_col`` order after the base).
    """
    from pylluminator_spark.operators.ordered import with_running_sum

    if token_offset < 0:
        raise ValueError(f"token_offset must be >= 0, got {token_offset}")
    sized = docs.select(
        doc_col, token_count_expr(F.col(text_col)).alias("n_tokens")
    )
    # n_rows engages the cheap single-window path below the size threshold;
    # past it, the range-partitioned two-phase path takes over
    cum = with_running_sum(
        sized, [doc_col], "n_tokens", "_cum", n_rows=sized.count()
    )
    # integer `div`, not float-divide-then-floor: the cumulative total on a
    # 100 TB corpus exceeds 2^53, where double arithmetic drops bits
    return cum.select(
        doc_col,
        "n_tokens",
        F.expr(
            f"(_cum - n_tokens + {int(token_offset)}) div {int(budget)}"
        ).alias("seq_id"),
    )


# ---------------------------------------------------------------------------
# BM25 relevance ranking
# ---------------------------------------------------------------------------


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 score of every matching document for a bag-of-words query.

    ``score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1-b+b·dl/avgdl))``
    with the standard smoothed ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))``.

    Dataflow: tokens are exploded once and filtered to the query terms
    BEFORE the aggregate, so the shuffled volume is proportional to query
    matches, not corpus size. Corpus stats (N, avgdl) are one scalar
    aggregate broadcast back (1-row join — not a data shuffle); per-term
    document frequencies are a tiny |query|-row aggregate, also broadcast.
    """
    q = [t.lower() for t in query_terms]
    q_arr = F.array(*[F.lit(t) for t in q])
    toks = docs.select(
        doc_col, tokens_expr(F.lower(F.col(text_col))).alias("_toks")
    )
    lengths = toks.select(doc_col, F.size("_toks").alias("dl"))
    corpus = lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    matches = (
        toks.select(doc_col, F.explode("_toks").alias("term"))
        .filter(F.array_contains(q_arr, F.col("term")))
        .groupBy(doc_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_per_term = matches.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    scored = (
        matches.join(F.broadcast(df_per_term), "term")
        .join(lengths, doc_col)
        .crossJoin(F.broadcast(corpus))
        .withColumn("_idf", idf)
        .withColumn(
            "_contrib",
            F.col("_idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy(doc_col).agg(
        F.sum("_contrib").alias("bm25"),
        F.count(F.lit(1)).alias("n_terms_matched"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    **kwargs,
) -> DataFrame:
    """Top-k documents by BM25, deterministic tie-break on doc_id."""
    doc_col = kwargs.get("doc_col", "doc_id")
    scores = bm25_scores(docs, query_terms, **kwargs)
    return scores.orderBy(
        F.desc("bm25"), F.col(doc_col).asc()
    ).limit(k)
