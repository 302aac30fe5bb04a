"""Character-n-gram language identification — the CCNet pipeline's LID
stage (Wenzek et al. 2020 route documents through a fastText language
classifier, Joulin et al. 2017; public recipe only), re-expressed as
Spark dataflow. Completes the engine's CCNet trio: LM perplexity
(``operators.corpus``), dedup (``operators.dedup``), LID (here).

Model: multinomial Naive Bayes over HASHED character n-grams —
add-``alpha``-smoothed per-language bucket log-likelihoods plus log
priors. A linear classifier over hashed gram counts is exactly the
shape fastText's averaged-embedding + linear layer reduces to; NB is
its closed-form, training-free analogue (one aggregation pass, no SGD),
which keeps the operator deterministic and oracle-checkable.

    score(d, l) = log P(l) + (1/|d|) * sum_b c_db * w_bl
    w_bl = ln(cnt_bl + alpha) - ln(tot_l + alpha * buckets)

Scale design (100 TB corpus):

- The model is dimension-sized no matter the corpus: at most
  ``buckets * n_langs`` weight rows plus one row per language —
  broadcast both; scoring never shuffles anything wider than
  (doc, bucket, lang) keyed rows.
- Featurization is ONE explode + ONE (doc, bucket) hash-aggregate with
  map-side combine — the same single-shuffle contract as
  ``operators.dsir.hashed_gram_counts``.
- Scoring fans the per-doc bucket counts out by n_langs (a broadcast
  join, no shuffle) and reduces per (doc, lang). With the default
  ``deterministic=False`` the reduce is a plain SUM (map-side partial
  combine); ``deterministic=True`` switches to the sorted-list fold
  that bit-matches any engine folding in bucket order (the hash-gate
  discipline; costs the partial combine — gate/audit path, not the
  production path).

Hashing: ``arith=True`` selects the SQL-portable polynomial character
hash (``operators.dsir.poly_bucket_expr`` — the oracle-twin hash);
default is ``xxhash64`` (engine path, python-parity-tested).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pylluminator_spark.functions.text import char_grams_expr
from pylluminator_spark.operators.dsir import poly_bucket_expr
from pylluminator_spark.plans.checkpoint import stable_checkpoint


def _char_grams(t: Column, n: int) -> Column:
    """Array of length-``n`` character grams of ``t``; empty array for
    texts shorter than ``n``. Delegates to functions.text
    char_grams_expr — O(len) via a let-bound char split + element_at
    concats (the earlier ``transform(seq, i -> substring(t, i, n))``
    form was O(len^2): substring seeks its start by walking UTF-8 bytes
    from the front, on top of the per-element lambda re-evaluation that
    the binding projection already avoided)."""
    return char_grams_expr(t, n)


def _gram_stream(
    docs: DataFrame,
    text_col: str,
    keep_col: str,
    n: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """(keep_col, gram) rows: lower() bound in a projection so the
    transform lambda sees a column reference (see ``_char_grams``).

    The doc rows are rebalanced across the cluster before the explode:
    featurization fans each row out ~len(text) times, so input
    partitioning understates the work by orders of magnitude — a corpus
    that fits one parquet row-group would otherwise run its entire gram
    stream on one core (doc rows are tiny; the rebalance shuffle is
    noise next to the explode it parallelizes). ``num_partitions``
    overrides the default (cluster parallelism); pass ``0`` to skip the
    rebalance for an input that is already well-partitioned. The hint is
    a plain parameter — no ``.rdd`` access, so building this plan never
    forces an analysis-to-RDD conversion."""
    par = (
        docs.sparkSession.sparkContext.defaultParallelism
        if num_partitions is None
        else num_partitions
    )
    rebalanced = docs.repartition(par) if par > 0 else docs
    keeps = [keep_col] if isinstance(keep_col, str) else list(keep_col)
    return rebalanced.select(
        *keeps, F.lower(F.col(text_col)).alias("_lid_t")
    ).select(
        *keeps,
        F.explode(_char_grams(F.col("_lid_t"), n)).alias("gram"),
    )


def char_gram_counts(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    *,
    n: int = 3,
    buckets: int = 4096,
    arith: bool = False,
) -> DataFrame:
    """Per-document hashed char-n-gram features: (doc_col, bucket, cnt).
    One explode + one keyed aggregate (map-side combine)."""
    g = _gram_stream(docs, text_col, doc_col, n)
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


def fit_langid(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    *,
    n: int = 3,
    buckets: int = 4096,
    alpha: float = 0.5,
    arith: bool = False,
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Train the NB model from labeled documents. Returns
    ``(weights, langs)``:

    - ``weights(bucket, lang, w)`` — smoothed log-likelihood per seen
      (bucket, language), <= buckets * n_langs rows;
    - ``langs(lang, log_prior, w_default)`` — per-language log prior and
      the unseen-bucket default ``ln(alpha) - ln(tot + alpha*buckets)``,
      one row per language.

    ONE aggregation pass over the gram stream plus one doc-count pass
    over the labels column — both outputs dimension-sized. With
    ``materialize=True`` (default) the per-(lang, bucket) count table —
    the single shared parent of weights AND langs — is eagerly
    localCheckpointed: the model tables are referenced by several
    downstream branches (two broadcast builds per scoring call), and
    without the checkpoint EACH branch would re-run the corpus-sized
    gram explode (measured 4 redundant passes in the fit+score
    pipeline). The checkpointed table is <= buckets * n_langs rows; on
    a real cluster prefer writing the model to parquet (it is the
    artifact you ship)."""
    grams = _gram_stream(
        docs.select(F.col(label_col).alias("lang"), text_col),
        text_col,
        "lang",
        n,
    )
    bucket = (
        poly_bucket_expr(F.col("gram"), buckets)
        if arith
        else F.pmod(F.xxhash64("gram"), F.lit(buckets))
    )
    lb = grams.select("lang", bucket.alias("bucket")).groupBy(
        "lang", "bucket"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    if materialize:
        lb = stable_checkpoint(lb)
    ndocs = docs.groupBy(F.col(label_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("nd")
    )
    return _model_tables(lb, ndocs, alpha, buckets, materialize)


def _model_tables(
    lb: DataFrame,
    ndocs: DataFrame,
    alpha: float,
    buckets: int,
    materialize: bool,
) -> tuple[DataFrame, DataFrame]:
    """(weights, langs) from the per-(lang, bucket) count table and the
    per-language doc counts — the shared tail of ``fit_langid`` and
    ``fit_classify_langid``."""
    tots = lb.groupBy("lang").agg(F.sum("cnt").alias("tot"))
    denom = F.log(F.col("tot") + F.lit(float(alpha) * buckets))
    weights = lb.join(F.broadcast(tots), "lang").select(
        "bucket",
        "lang",
        (F.log(F.col("cnt") + F.lit(float(alpha))) - denom).alias("w"),
    )
    total = ndocs.agg(F.sum("nd").alias("ntot"))
    # LEFT join + coalesce(tot, 0): a training language whose documents
    # are all shorter than n produces no grams and is absent from tots —
    # an inner join would silently drop it (no prior, never predictable)
    # while its docs still inflate ntot for the other priors. With tot=0
    # its w_default degrades to the uniform ln(alpha) - ln(alpha*buckets)
    denom = F.log(
        F.coalesce(F.col("tot"), F.lit(0)) + F.lit(float(alpha) * buckets)
    )
    langs = (
        ndocs.crossJoin(F.broadcast(total))
        .join(F.broadcast(tots), "lang", "left")
        .select(
            "lang",
            (F.log(F.col("nd").cast("double")) - F.log(F.col("ntot").cast("double"))).alias(
                "log_prior"
            ),
            (F.log(F.lit(float(alpha))) - denom).alias("w_default"),
        )
    )
    if materialize:
        langs = stable_checkpoint(langs)
    return weights, langs


def fit_classify_langid(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    doc_col: str = "doc_id",
    *,
    n: int = 3,
    buckets: int = 4096,
    alpha: float = 0.5,
    arith: bool = False,
    deterministic: bool = False,
    materialize: bool = True,
) -> DataFrame:
    """Self-labeled fit + per-(doc, language) score table in ONE gram
    pass (the self-audit shape: classify the corpus under the model fit
    on its own labels, to find mislabeled documents).

    ``fit_langid`` + ``char_gram_counts`` each run their own corpus-wide
    gram explode; here the per-(doc, lang, bucket) count table is
    computed once (and checkpointed — it is the shared parent of the
    model AND the features), the (lang, bucket) model counts ROLL UP
    from it (integer-exact: each doc has one label), and the per-doc
    features are a projection. Returns ``langid_scores`` output; wrap in
    ``langid_predict`` for the argmax."""
    grams = _gram_stream(
        docs.select(
            doc_col, F.col(label_col).alias("lang"), text_col
        ),
        text_col,
        [doc_col, "lang"],
        n,
    )
    bucket = (
        poly_bucket_expr(F.col("gram"), buckets)
        if arith
        else F.pmod(F.xxhash64("gram"), F.lit(buckets))
    )
    dlb = (
        grams.select(doc_col, "lang", bucket.alias("bucket"))
        .groupBy(doc_col, "lang", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if materialize:
        dlb = stable_checkpoint(dlb)
    lb = dlb.groupBy("lang", "bucket").agg(F.sum("cnt").alias("cnt"))
    ndocs = docs.groupBy(F.col(label_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("nd")
    )
    weights, langs = _model_tables(lb, ndocs, alpha, buckets, materialize)
    doc_counts = dlb.select(doc_col, "bucket", "cnt")
    return langid_scores(
        doc_counts,
        weights,
        langs,
        doc_col,
        deterministic=deterministic,
        buckets=buckets,
    )


def langid_scores(
    doc_counts: DataFrame,
    weights: DataFrame,
    langs: DataFrame,
    doc_col: str = "doc_id",
    *,
    deterministic: bool = False,
    buckets: int | None = None,
) -> DataFrame:
    """Per-(doc, language) score: log prior + mean gram log-likelihood.

    Default (production) path: broadcast-join the model onto the per-doc
    bucket counts (no shuffle) and reduce per (doc, lang) with a plain
    SUM — map-side partial combine, constant state per group.

    ``deterministic=True`` (the hash-gate discipline) folds each
    document's contributions in sorted bucket order, bit-reproducible
    across engines and partitionings. This path aggregates the per-doc
    (bucket, cnt) pairs ONCE (one corpus shuffle, one sort per document)
    and scores EVERY language in a single projection against a 1-row
    broadcast model — per language a dense ``buckets``-slot weight array
    indexed O(1) by bucket — instead of fanning the count table out
    n_langs ways and re-sorting each (doc, lang) group. The fold runs in
    the same sorted bucket order with the same ``cnt * coalesce(w,
    w_default)`` per-element terms, so the scores are bit-identical to
    the fanned form. ``buckets`` sizes the dense arrays; when None it is
    derived from the max bucket id in ``weights`` (one tiny job)."""
    if deterministic:
        if buckets is None:
            mx = weights.agg(F.max("bucket")).collect()[0][0]
            buckets = int(mx) + 1 if mx is not None else 1
        warr = weights.groupBy("lang").agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.col("bucket").cast("int").alias("bucket"),
                        F.col("w"),
                    )
                )
            ).alias("_wm")
        )
        per_lang = (
            langs.join(warr, "lang", "left")
            .select(
                F.struct(
                    "lang",
                    "log_prior",
                    "w_default",
                    # dense O(1)-indexed weight array (map lookups are
                    # linear scans in codegen — ruinous per element)
                    F.transform(
                        F.sequence(F.lit(0), F.lit(int(buckets) - 1)),
                        lambda b: F.element_at(
                            F.col("_wm"), b.cast("int")
                        ),
                    ).alias("wa"),
                ).alias("_l")
            )
            .agg(F.sort_array(F.collect_list("_l")).alias("_langs"))
        )
        doc_arr = doc_counts.groupBy(doc_col).agg(
            F.sort_array(
                F.collect_list(F.struct("bucket", "cnt"))
            ).alias("_bc"),
            F.sum("cnt").alias("_n"),
        )
        scored = doc_arr.crossJoin(F.broadcast(per_lang)).select(
            doc_col,
            F.explode(
                F.transform(
                    F.col("_langs"),
                    lambda l: F.struct(
                        l["lang"].alias("lang"),
                        (
                            l["log_prior"]
                            + F.aggregate(
                                F.col("_bc"),
                                F.lit(0.0),
                                lambda acc, x: acc
                                + x["cnt"].cast("double")
                                * F.coalesce(
                                    F.element_at(
                                        l["wa"], x["bucket"].cast("int") + 1
                                    ),
                                    l["w_default"],
                                ),
                            )
                            / F.col("_n").cast("double")
                        ).alias("score"),
                    ),
                )
            ).alias("_s"),
        )
        return scored.select(
            doc_col,
            F.col("_s.lang").alias("lang"),
            F.col("_s.score").alias("score"),
        )
    fanned = (
        doc_counts.crossJoin(
            F.broadcast(langs.select("lang", "log_prior", "w_default"))
        )
        .join(F.broadcast(weights), ["bucket", "lang"], "left")
        .select(
            doc_col,
            "lang",
            "log_prior",
            "bucket",
            "cnt",
            (
                F.col("cnt").cast("double")
                * F.coalesce(F.col("w"), F.col("w_default"))
            ).alias("contrib"),
        )
    )
    return fanned.groupBy(doc_col, "lang").agg(
        F.first("log_prior").alias("_lp"),
        F.sum("cnt").alias("_n"),
        F.sum("contrib").alias("_ll"),
    ).select(
        doc_col,
        "lang",
        (F.col("_lp") + F.col("_ll") / F.col("_n").cast("double")).alias(
            "score"
        ),
    )


def langid_predict(
    scores: DataFrame, doc_col: str = "doc_id"
) -> DataFrame:
    """argmax language per document (ties broken toward the
    lexicographically larger language — deterministic): (doc, pred_lang,
    score). One keyed aggregate over the scores table."""
    return scores.groupBy(doc_col).agg(
        F.max_by("lang", F.struct("score", "lang")).alias("pred_lang"),
        F.max("score").alias("score"),
    )


def language_id(
    docs: DataFrame,
    weights: DataFrame,
    langs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    *,
    n: int = 3,
    buckets: int = 4096,
    arith: bool = False,
    deterministic: bool = False,
) -> DataFrame:
    """Featurize + score + argmax in one call (the CCNet LID stage):
    (doc, pred_lang, score). ``n``/``buckets``/``arith`` must match the
    values the model was fit with."""
    counts = char_gram_counts(
        docs, text_col, doc_col, n=n, buckets=buckets, arith=arith
    )
    return langid_predict(
        langid_scores(
            counts,
            weights,
            langs,
            doc_col,
            deterministic=deterministic,
            buckets=buckets,
        ),
        doc_col,
    )
