"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023, "Data Selection for Language Models via Importance Resampling").

Beyond-reference training-data operator: select raw-corpus documents whose
hashed n-gram distribution looks like a small TARGET corpus. The published
recipe, re-expressed as Spark dataflow:

1. **Features** — unigram + bigram counts hashed into ``buckets`` slots
   (the paper uses 10k); a document is a sparse bucket-count vector.
2. **Importance weights** — fit add-``alpha`` bucket distributions ``p``
   on the target and ``q`` on the raw corpus;
   ``log w(doc) = sum_b c_doc(b) * (log p(b) - log q(b))``.
3. **Resampling** — Gumbel top-k over ``log w`` (sampling without
   replacement proportional to ``w``), here with KEYED-HASH Gumbel noise
   so the draw is reproducible across runs, engines, and partitionings —
   the same no-``rand()`` discipline as ``operators.sampling``.

Scale design (100 TB raw corpus):

- The per-corpus bucket tables have AT MOST ``buckets`` rows (10k) —
  dimension-sized regardless of corpus size — so the log-ratio table is
  broadcast and scoring is map-side after one doc-keyed aggregation.
- The target corpus is small by construction (that is the premise of
  DSIR); its explode is negligible next to the raw scan.
- Total: one explode + one (doc, bucket) hash-aggregate over the raw
  corpus, one broadcast join, one doc-keyed fold. No shuffle touches
  anything wider than (doc, bucket, cnt).
- Selection: ``dsir_gumbel_topk`` is a single global top-k (sort-limit,
  AQE-truncated); for fraction-style selection at extreme scale, filter
  on a broadcast weight threshold instead.

Determinism: the per-document float fold runs in SORTED bucket order
(``F.aggregate(sort_array(collect_list(...)))``) so the sum is
bit-reproducible — the discipline the ``combat_stats`` round made
mandatory for every hash-gated float aggregate. The ``arith=True``
feature path swaps xxhash64 for a polynomial character hash expressible
in ANSI SQL (the ``doc_fingerprint`` pattern), which is what the DuckDB
oracle checks bit-for-bit; the xxhash64 engine path is numpy
property-tested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pylluminator_spark.functions.text import tokens_expr

_POLY_P = 1000003  # prime, same modulus as sampling/doc_fingerprint
_POLY_MULT = 31
_U_DENOM = 2**31  # uniform grid for keyed-hash Gumbel


def poly_bucket_expr(gram: Column, buckets: int = 10_000) -> Column:
    """SQL-portable bucket in [0, buckets): fold character codes as
    ``h = (h * 31 + ascii(c)) mod 1000003`` then ``% buckets``. Exact
    integer arithmetic, replicable in DuckDB with
    ``list_reduce(list_transform(generate_series(...), ...))`` — the
    oracle-twin hash, analogous to ``sampling.arith_bucket_expr`` for
    integral keys."""
    # grams are non-empty by construction (tokens_expr drops empties), so
    # sequence(1, length) never hits Spark's descending-sequence edge
    codes = F.transform(
        F.sequence(F.lit(1), F.length(gram)),
        lambda i: F.ascii(gram.substr(i, F.lit(1))),
    )
    h = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(acc * _POLY_MULT + c.cast("long"), F.lit(_POLY_P)),
    )
    return h % buckets


def _grams(
    docs: DataFrame,
    text_col: str,
    doc_col: str,
    use_bigrams: bool,
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc, gram) rows: lowercase whitespace unigrams, plus space-joined
    bigrams when ``use_bigrams`` — the paper's hashed n-gram feature
    stream. ONE tokenize and ONE explode per document: the bigram array
    comes from zip_with over two slices of the same token array and is
    concatenated onto it (a union of two branches would scan and
    tokenize twice — Spark does no CSE across union arms).

    Doc rows are rebalanced to cluster parallelism first: featurization
    fans each row out ~tokens(text) times, so input partitioning
    understates the work by orders of magnitude (a one-row-group corpus
    would run its whole gram stream — and the per-character arith hash —
    on one core; measured 2.7x on the dsir_weights gate).
    ``num_partitions`` overrides the default (cluster parallelism);
    pass ``0`` to skip the rebalance — a plain hint, no ``.rdd`` access
    (which would force plan analysis to RDD conversion per call)."""
    par = (
        docs.sparkSession.sparkContext.defaultParallelism
        if num_partitions is None
        else num_partitions
    )
    if par > 0:
        docs = docs.repartition(par)
    toks = docs.select(
        doc_col, tokens_expr(F.lower(F.col(text_col))).alias("_t")
    )
    grams = F.col("_t")
    if use_bigrams:
        n = F.size("_t")
        bigs = F.when(
            n >= 2,
            F.zip_with(
                F.slice(F.col("_t"), 1, n - 1),
                F.slice(F.col("_t"), 2, n - 1),
                lambda u, w: F.concat(u, F.lit(" "), w),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = F.concat(grams, bigs)
    return toks.select(doc_col, F.explode(grams).alias("gram"))


def hashed_gram_counts(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    *,
    buckets: int = 10_000,
    use_bigrams: bool = True,
    arith: bool = False,
) -> DataFrame:
    """Per-document hashed n-gram features: (doc_col, bucket, cnt).

    One explode + one (doc, bucket)-keyed hash aggregate with map-side
    partial combine — the only raw-corpus shuffle in the DSIR pipeline.
    ``arith=True`` selects the SQL-portable polynomial hash (oracle
    path); default is xxhash64 (engine path)."""
    g = _grams(docs, text_col, doc_col, use_bigrams)
    bucket = (
        poly_bucket_expr(F.col("gram"), buckets)
        if arith
        else F.pmod(F.xxhash64("gram"), F.lit(buckets))
    )
    return (
        g.select(doc_col, bucket.alias("bucket"))
        .groupBy(doc_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bucket_log_ratio(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    *,
    buckets: int = 10_000,
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, log_ratio) for every bucket seen in the RAW corpus:
    ``log p_target(b) - log q_raw(b)`` with add-``alpha`` smoothing over
    the full ``buckets``-slot space (so buckets absent from the target
    stay finite):

        p(b) = (c_p(b) + alpha) / (T_p + alpha * buckets)

    Both inputs are ``hashed_gram_counts`` outputs. The result has at
    most ``buckets`` rows — dimension-sized, broadcastable — and buckets
    the raw corpus never emits are irrelevant to scoring (their doc count
    is zero), so the raw side anchors the join."""
    tgt = target_counts.groupBy("bucket").agg(F.sum("cnt").alias("_tc"))
    raw = raw_counts.groupBy("bucket").agg(F.sum("cnt").alias("_rc"))
    tot_t = tgt.agg(F.sum("_tc").alias("_tt"))
    tot_r = raw.agg(F.sum("_rc").alias("_tr"))
    a = float(alpha)
    ab = a * buckets
    return (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_r))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("_tc"), F.lit(0)) + F.lit(a))
                    / (F.col("_tt") + F.lit(ab))
                )
                - F.log(
                    (F.col("_rc") + F.lit(a)) / (F.col("_tr") + F.lit(ab))
                )
            ).alias("log_ratio"),
        )
    )


def dsir_log_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    *,
    buckets: int = 10_000,
    alpha: float = 1.0,
    use_bigrams: bool = True,
    arith: bool = False,
    target_within: bool = False,
) -> DataFrame:
    """Per-raw-document DSIR importance log-weight:
    (doc_col, n_grams, log_weight) where
    ``log_weight = sum_b cnt(b) * log_ratio(b)`` folded in SORTED bucket
    order (bit-reproducible across engines and partitionings). Documents
    with zero tokens have no grams and are absent — same contract as the
    LM scorers.

    Plan shape: raw features (one shuffle) ⨝ broadcast(log-ratio table,
    ≤ ``buckets`` rows) → doc-keyed sorted fold (second shuffle, on the
    already-aggregated (doc, bucket) table).

    ``target_within``: pass True when ``target_docs`` is a row subset of
    ``raw_docs`` (the common DSIR shape — target = the curated slice of
    the corpus being weighted). The raw feature table is then
    materialized ONCE (eager checkpoint — it feeds both the ratio and
    the scoring branch, whose alias-divergent plans otherwise re-run
    the gram explode) and the target features are carved out of it by a
    broadcast semi join on the target ids instead of re-tokenizing and
    re-hashing the target rows. Bit-exact: the ratio table aggregates
    INTEGER per-doc counts, identical whichever side computed them."""
    raw_feat = hashed_gram_counts(
        raw_docs, text_col, doc_col,
        buckets=buckets, use_bigrams=use_bigrams, arith=arith,
    )
    if target_within:
        from pylluminator_spark.plans.checkpoint import stable_checkpoint

        raw_feat = stable_checkpoint(raw_feat)
        tgt_feat = raw_feat.join(
            F.broadcast(target_docs.select(doc_col).distinct()),
            doc_col,
            "left_semi",
        )
    else:
        tgt_feat = hashed_gram_counts(
            target_docs, text_col, doc_col,
            buckets=buckets, use_bigrams=use_bigrams, arith=arith,
        )
    ratio = bucket_log_ratio(
        tgt_feat, raw_feat, buckets=buckets, alpha=alpha
    )
    scored = raw_feat.join(F.broadcast(ratio), "bucket").withColumn(
        "_c", F.col("cnt") * F.col("log_ratio")
    )
    agg = scored.groupBy(doc_col).agg(
        F.sum("cnt").alias("n_grams"),
        F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("bucket"), F.col("_c").alias("c"))
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["c"],
        ).alias("log_weight"),
    )
    return agg.select(doc_col, "n_grams", "log_weight")


def dsir_gumbel_topk(
    weights: DataFrame,
    k: int,
    doc_col: str = "doc_id",
    *,
    salt: int = 0,
) -> DataFrame:
    """Gumbel top-k resampling over DSIR weights — the paper's sampling-
    without-replacement step (draw k docs with probability proportional
    to ``exp(log_weight)``), made reproducible: the Gumbel noise is
    ``-log(-log(u))`` with ``u`` from the keyed hash
    ``(pmod(xxhash64(doc, salt), 2^31) + 0.5) / 2^31`` — u is never 0 or
    1, and the same (doc, salt) draws the same noise on any cluster
    layout. Deterministic tie-break on the document key.

    Scale: a single global top-k (sort falls to Spark's TakeOrdered /
    AQE-truncated exchange); no full sort is materialized."""
    u = (
        (F.pmod(F.xxhash64(F.col(doc_col), F.lit(salt)), F.lit(_U_DENOM))
         + F.lit(0.5))
        / F.lit(float(_U_DENOM))
    )
    key = F.col("log_weight") + -F.log(-F.log(u))
    return (
        weights.withColumn("_gumbel_key", key)
        .orderBy(F.desc("_gumbel_key"), F.col(doc_col))
        .limit(k)
        .drop("_gumbel_key")
    )


def dsir_topk(
    weights: DataFrame, k: int, doc_col: str = "doc_id"
) -> DataFrame:
    """Deterministic hard top-k by importance weight (the no-noise
    variant — equivalent to temperature → 0). Tie-break on the document
    key so the selection is total-order stable."""
    return (
        weights.orderBy(F.desc("log_weight"), F.col(doc_col)).limit(k)
    )
