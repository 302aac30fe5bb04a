"""DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi: Optimizing
Data Mixtures Speeds Up Language Model Pretraining").

Beyond-reference operator (driver north star: large-scale training-data
pipeline) — completes the data-mixture family next to DSIR (example-level
importance), CCNet (paragraph-level quality), and source_mixing (rate
solving). DoReMi trains a proxy model under Group DRO: each domain's
weight moves multiplicatively with its EXCESS LOSS — how much worse the
current model does on the domain than a reference model says is
achievable. The relational one-step analogue here replaces the two
training runs with two corpus-fit language models:

- ``nll_ref``: the domain's average bigram NLL under an LM fit on a
  CURATED reference corpus (what a generic model brings to the domain);
- ``nll_self``: the same documents under the corpus's own self-fit LM
  (what a model that has seen this data achieves);
- ``excess = max(0, nll_ref - nll_self)`` — the domain's learnable
  headroom (domains the reference already models perfectly get 0).

Weights follow DoReMi's exponentiated-gradient step from the token-share
baseline, then mix with uniform (their smoothing):

    w_i  prop  share_i * exp(eta * excess_i)
    weight_i = (1 - smoothing) * w_i / sum(w) + smoothing / n_domains

Scale shape: the two LM scorings are the corpus-sized work (hash joins,
never broadcast — see ``bigram_lm_scores``); everything after is one
domain-keyed aggregation (<= n_domains rows) and a 1-row normalizing
scalar. Determinism: per-document NLLs fold in sorted (u, w) order
inside ``bigram_lm_scores``; the weight normalizer folds domains in
sorted ``domain_col`` order. The per-domain reduction over documents is
a plain SUM by default (bounded state, map-side combine — a domain can
hold billions of documents at 100 TB); ``deterministic=True`` opts into
the sorted-``doc_col`` fold for bit-reproducible cross-engine
verification on small inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pylluminator_spark.operators.corpus import (
    _bigram_doc_counts,
    _score_doc_bigrams_dual,
)
from pylluminator_spark.plans.checkpoint import stable_checkpoint


def doremi_domain_weights(
    docs: DataFrame,
    reference: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    doc_col: str = "doc_id",
    *,
    eta: float = 1.0,
    smoothing: float = 0.1,
    alpha: float = 1.0,
    backoff: float = 0.4,
    min_bigram_count: int = 1,
    deterministic: bool = False,
    reference_within: bool = False,
) -> DataFrame:
    """One DoReMi reweighting step over ``domain_col``.

    Returns one row per domain that has at least one scored (>= 2-token)
    document: (domain, n_docs, n_bigrams, nll_ref, nll_self, excess,
    weight). Weights sum to 1 over the returned domains (before
    rounding); ``smoothing`` mixes toward uniform exactly as in the
    paper.

    ``deterministic`` (the langid discipline): the per-domain reduction
    of per-document NLL terms is a plain ``SUM`` by default — constant
    aggregation state per domain with map-side partial combine, the
    only shape that survives a domain holding billions of documents.
    ``deterministic=True`` switches to a sorted-``doc_col`` list fold
    (bit-reproducible cross-engine, used by the oracle gate twin) whose
    state is the WHOLE domain — per-domain memory grows with the
    corpus, so it is strictly a small-input verification mode. The
    ≤ n_domains normalizer fold is always sorted (bounded by the
    domain count, not the corpus).

    ``reference_within``: pass True when ``reference`` is a row subset
    of ``docs`` (same ``doc_col`` ids, same text — the usual DoReMi
    shape, where the reference domain lives inside the corpus). The
    reference's bigram counts are then carved out of the already-
    checkpointed corpus count table by a broadcast semi join on its
    ids instead of re-tokenizing the reference rows — one corpus
    tokenize instead of ~1.5. Bit-exact: the model tables aggregate
    INTEGER per-doc counts, identical whichever side computed them.
    """
    if not 0.0 <= smoothing <= 1.0:
        raise ValueError(f"smoothing must be in [0, 1], got {smoothing}")
    kw = dict(
        alpha=alpha, backoff=backoff, min_bigram_count=min_bigram_count
    )
    # tokenize the target corpus ONCE: both scorings (reference model
    # and self-fit model) read the same checkpointed (doc, u, w) counts
    # instead of each re-running the explode + shuffle — and score in
    # ONE pass (_score_doc_bigrams_dual: the two models are outer-joined
    # model-side, so the corpus-sized count table is joined and folded
    # once; per-doc NLLs bit-identical to two separate scorings)
    doc_big = stable_checkpoint(
        _bigram_doc_counts(docs, text_col, doc_col)
    )
    if reference_within:
        ref_big = doc_big.join(
            F.broadcast(reference.select(doc_col).distinct()),
            doc_col,
            "left_semi",
        )
    else:
        ref_big = _bigram_doc_counts(reference, text_col, doc_col)
    scores = _score_doc_bigrams_dual(
        doc_big, ref_big, doc_big, doc_col, **kw
    ).select(
        doc_col,
        F.col("n_bigrams").alias("_n"),
        F.col("nll_ref").alias("_nll_ref"),
        F.col("nll_self").alias("_nll_self"),
    )
    per_doc = docs.select(doc_col, F.col(domain_col).alias("_dom")).join(
        scores, doc_col
    )

    # per-domain float reduction. Production path: plain SUMs — constant
    # per-group state, map-side combine (associative float error
    # accepted). deterministic=True: ONE sorted-doc-order list fold
    # carrying BOTH terms (a struct accumulator: two independent sums
    # over the same order are bit-identical to two separate folds, at
    # half the collect+sort work) — bit-reproducible but with
    # corpus-sized per-domain state (collect_list has no map-side
    # combine), verification only.
    t_ref = F.col("_nll_ref") * F.col("_n")
    t_self = F.col("_nll_self") * F.col("_n")
    if not deterministic:
        dom = per_doc.groupBy("_dom").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("n_bigrams"),
            F.sum(t_ref).alias("_sref"),
            F.sum(t_self).alias("_sself"),
        )
    else:
        fold = F.aggregate(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(doc_col),
                        t_ref.alias("tr"),
                        t_self.alias("ts"),
                    )
                )
            ),
            F.struct(F.lit(0.0).alias("r"), F.lit(0.0).alias("s")),
            lambda acc, x: F.struct(
                (acc["r"] + x["tr"]).alias("r"),
                (acc["s"] + x["ts"]).alias("s"),
            ),
        )
        dom = per_doc.groupBy("_dom").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("n_bigrams"),
            fold.alias("_fold"),
        ).select(
            "_dom",
            "n_docs",
            "n_bigrams",
            F.col("_fold.r").alias("_sref"),
            F.col("_fold.s").alias("_sself"),
        )
    dom = dom.select(
        "_dom",
        "n_docs",
        "n_bigrams",
        (F.col("_sref") / F.col("n_bigrams")).alias("nll_ref"),
        (F.col("_sself") / F.col("n_bigrams")).alias("nll_self"),
    ).withColumn(
        "excess",
        F.greatest(F.lit(0.0), F.col("nll_ref") - F.col("nll_self")),
    )
    # token-share baseline * exp(eta * excess); the normalizer is one
    # scalar row folded in sorted domain order, broadcast back
    dom = dom.withColumn(
        "_wraw",
        (
            F.col("n_bigrams").cast("double")
            * F.exp(F.lit(float(eta)) * F.col("excess"))
        ),
    )
    totals = dom.agg(
        F.aggregate(
            F.sort_array(
                F.collect_list(F.struct(F.col("_dom"), F.col("_wraw")))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["_wraw"],
        ).alias("_wsum"),
        F.count(F.lit(1)).alias("_ndom"),
    )
    return (
        dom.crossJoin(F.broadcast(totals))
        .select(
            F.col("_dom").alias(domain_col),
            "n_docs",
            "n_bigrams",
            "nll_ref",
            "nll_self",
            "excess",
            (
                F.lit(1.0 - smoothing) * F.col("_wraw") / F.col("_wsum")
                + F.lit(float(smoothing)) / F.col("_ndom")
            ).alias("weight"),
        )
    )
