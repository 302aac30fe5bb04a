"""CCNet-style per-paragraph LM quality filtering (Wenzek et al. 2020,
"CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
Data").

Beyond-reference operator (driver north star: large-scale training-data
pipeline). CCNet's pipeline scores each PARAGRAPH of a crawled document
under a language model fit on curated text (Wikipedia), then buckets the
corpus into head / middle / tail by perplexity terciles and keeps the
low-perplexity buckets. This module composes the repo's existing pieces
Spark-first:

- paragraph granularity: ``operators.cleanup.split_paragraphs`` (the
  posexplode + trim idiom ``dedup_paragraphs`` uses);
- the LM: ``operators.corpus.bigram_lm_scores`` with its ``reference=``
  corpus option (stupid-backoff bigram LM — Brants et al. 2007, the
  web-scale scheme CCNet's KenLM filter approximates);
- the tercile cut: a GLOBAL rank of paragraph scores via
  ``operators.ordered.with_global_rank`` (bucketized two-phase rank —
  never a single-partition sort), bucketed by integer rank arithmetic
  (3*rank <= n), not float percentile interpolation, so the cut is
  bit-reproducible cross-engine.

Scale shape: paragraphs are corpus-sized rows; the LM model table joins
by hash on (u, w) (never broadcast — see bigram_lm_scores); the global
rank shuffles once on the inlined-literal bucket key; reassembly is one
doc-keyed aggregation. Only the 1-row paragraph count is broadcast.

Short paragraphs (fewer than two tokens) have no bigrams, hence no
perplexity: they get bucket ``'short'`` and are kept or dropped by the
explicit ``keep_short`` knob (CCNet keeps them — headers and list items
are not evidence of low quality).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pylluminator_spark.operators.cleanup import (
    PARAGRAPH_SPLIT_PATTERN,
    split_paragraphs,
)
from pylluminator_spark.operators.corpus import bigram_lm_scores
from pylluminator_spark.operators.ordered import with_global_rank
from pylluminator_spark.plans.checkpoint import stable_checkpoint


def paragraph_lm_buckets(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    *,
    reference: DataFrame | None = None,
    pattern: str = PARAGRAPH_SPLIT_PATTERN,
    head_frac: float = 1.0 / 3.0,
    middle_frac: float = 1.0 / 3.0,
    alpha: float = 1.0,
    backoff: float = 0.4,
    min_bigram_count: int = 1,
) -> DataFrame:
    """Score every paragraph under the bigram LM and bucket the corpus
    by perplexity rank: the lowest-``head_frac`` of scored paragraphs
    are ``'head'``, the next ``middle_frac`` are ``'middle'``, the rest
    ``'tail'``; paragraphs with no bigrams are ``'short'`` (never
    ranked, NULL ``avg_nll``).

    ``reference`` fits the LM on a curated corpus (the CCNet semantic)
    — its documents are split into paragraphs with the same ``pattern``
    so the model sees the same text units it scores; ``None`` self-fits
    on the scored paragraphs.

    The bucket cut is rank arithmetic — ``rank <= floor(n*head_frac)``
    — over the total order (avg_nll, doc, para_idx): ties on the float
    score break on the paragraph key, so the bucketing is deterministic
    and engine-portable (the score itself folds in sorted (u, w) order
    inside ``bigram_lm_scores``).

    Returns (doc_col, para_idx, para, n_bigrams, avg_nll, bucket).
    """
    if head_frac < 0.0 or middle_frac < 0.0 or head_frac + middle_frac > 1.0:
        raise ValueError(
            f"head_frac={head_frac} + middle_frac={middle_frac} must sit "
            "inside [0, 1]"
        )
    paras = split_paragraphs(docs, text_col, doc_col, pattern)
    target = paras.select(
        F.struct(F.col(doc_col), F.col("para_idx")).alias("_pid"),
        F.col("para"),
    )
    ref_paras = (
        None
        if reference is None
        else split_paragraphs(reference, text_col, doc_col, pattern)
        .select(
            F.struct(F.col(doc_col), F.col("para_idx")).alias("_pid"),
            F.col("para"),
        )
    )
    scored = bigram_lm_scores(
        target,
        text_col="para",
        doc_col="_pid",
        alpha=alpha,
        backoff=backoff,
        min_bigram_count=min_bigram_count,
        reference=ref_paras,
    ).select(
        F.col(f"_pid.{doc_col}").alias(doc_col),
        F.col("_pid.para_idx").alias("para_idx"),
        "n_bigrams",
        "avg_nll",
    )
    # scored is read THREE times (the rank's boundary-sample pass, the
    # ranked data branch, and the n_scored count) and its upstream is the
    # whole two-corpus LM fit + score — exactly the expensive-upstream
    # case operators.ordered's contract says the caller must materialize.
    # One row per scored paragraph: far smaller than the text it scores.
    scored = stable_checkpoint(scored)
    ranked = with_global_rank(
        scored, ["avg_nll", doc_col, "para_idx"], "_rank"
    )
    n_scored = scored.agg(F.count(F.lit(1)).alias("_n"))
    head_cut = F.floor(F.col("_n") * F.lit(head_frac))
    mid_cut = F.floor(F.col("_n") * F.lit(head_frac + middle_frac))
    bucketed = ranked.crossJoin(F.broadcast(n_scored)).select(
        doc_col,
        "para_idx",
        "n_bigrams",
        "avg_nll",
        F.when(F.col("_rank") <= head_cut, F.lit("head"))
        .when(F.col("_rank") <= mid_cut, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    # left join back: bigram-less paragraphs surface as bucket 'short'
    return (
        paras.join(bucketed, [doc_col, "para_idx"], "left")
        .withColumn("bucket", F.coalesce("bucket", F.lit("short")))
        .select(
            doc_col, "para_idx", "para", "n_bigrams", "avg_nll", "bucket"
        )
    )


def ccnet_paragraph_filter(
    docs: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    *,
    reference: DataFrame | None = None,
    pattern: str = PARAGRAPH_SPLIT_PATTERN,
    keep: Sequence[str] = ("head", "middle"),
    keep_short: bool = True,
    head_frac: float = 1.0 / 3.0,
    middle_frac: float = 1.0 / 3.0,
    alpha: float = 1.0,
    backoff: float = 0.4,
    min_bigram_count: int = 1,
    keep_fps_col: str | None = None,
    carry_cols: tuple = (),
) -> DataFrame:
    """Keep only the ``keep`` perplexity buckets of each document's
    paragraphs and reassemble the survivors (the CCNet head/middle cut,
    paragraph-granular like the original — a document keeps its good
    paragraphs even when its tail paragraphs are boilerplate).

    Returns (doc_col, clean_text, n_paras_kept, n_paras_dropped) — the
    same contract as ``cleanup.dedup_paragraphs``, and like it every
    input document survives (empty ``clean_text`` when everything was
    dropped). Reassembly is one doc-keyed aggregation: sort the kept
    (para_idx, para) structs, concat with the paragraph separator.
    """
    buckets = paragraph_lm_buckets(
        docs,
        text_col,
        doc_col,
        reference=reference,
        pattern=pattern,
        head_frac=head_frac,
        middle_frac=middle_frac,
        alpha=alpha,
        backoff=backoff,
        min_bigram_count=min_bigram_count,
    )
    wanted = [b for b in keep] + (["short"] if keep_short else [])
    kept_flag = F.col("bucket").isin(wanted).alias("kept")
    flagged = buckets.select(
        doc_col, "para_idx", "para", F.xxhash64("para").alias("fp"), kept_flag
    )
    # shared reassembly with the paragraph dedups (one doc-keyed
    # aggregate); ``keep_fps_col`` emits the kept paragraphs' distinct
    # fingerprints so a curation pipeline placing this stage after
    # paragraph dedup hands increments a probe-able fingerprint column
    # reflecting the POST-ccnet surviving paragraphs
    from pylluminator_spark.operators.cleanup import _reassemble_flagged

    return _reassemble_flagged(
        docs, flagged, doc_col, keep_fps_col, carry_cols
    )
