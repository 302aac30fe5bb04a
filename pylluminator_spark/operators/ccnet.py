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
    bucketed = _scored_buckets(
        paras,
        doc_col,
        reference=reference,
        text_col=text_col,
        pattern=pattern,
        head_frac=head_frac,
        middle_frac=middle_frac,
        alpha=alpha,
        backoff=backoff,
        min_bigram_count=min_bigram_count,
    )
    # left join back: bigram-less paragraphs surface as bucket 'short'
    return (
        paras.join(bucketed, [doc_col, "para_idx"], "left")
        .withColumn("bucket", F.coalesce("bucket", F.lit("short")))
        .select(
            doc_col, "para_idx", "para", "n_bigrams", "avg_nll", "bucket"
        )
    )


def _scored_buckets(
    paras: DataFrame,
    doc_col: str,
    *,
    reference: DataFrame | None,
    text_col: str,
    pattern: str,
    head_frac: float,
    middle_frac: float,
    alpha: float,
    backoff: float,
    min_bigram_count: int,
) -> DataFrame:
    """(doc_col, para_idx, n_bigrams, avg_nll, bucket) for the SCOREABLE
    paragraphs of ``paras`` — the shared core of the bucketing and the
    filter (which joins it back to its own total paragraph table instead
    of re-deriving this one)."""
    import math

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
    # scored is read by the rank AND counted for the tercile cuts, and
    # its upstream is the whole two-corpus LM fit + score — exactly the
    # expensive-upstream case operators.ordered's contract says the
    # caller must materialize. One row per scored paragraph: far smaller
    # than the text it scores.
    scored = stable_checkpoint(scored)
    # the paragraph count was already a job (the old broadcast n_scored
    # aggregate) — collecting it as a driver scalar instead makes the
    # tercile cuts LITERALS (no crossJoin) and lets the rank dispatch
    # on size: below the small-input threshold it is one plain window
    # (no boundary-sample pass, no stats/offsets machinery), above it
    # the two-phase path runs exactly as before. floor(n * frac) is the
    # same IEEE double multiply + floor the Column expression computed.
    n = scored.count()
    ranked = with_global_rank(
        scored, ["avg_nll", doc_col, "para_idx"], "_rank", n_rows=n
    )
    head_cut = int(math.floor(n * head_frac))
    mid_cut = int(math.floor(n * (head_frac + middle_frac)))
    return ranked.select(
        doc_col,
        "para_idx",
        "n_bigrams",
        "avg_nll",
        F.when(F.col("_rank") <= F.lit(head_cut), F.lit("head"))
        .when(F.col("_rank") <= F.lit(mid_cut), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
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
    from pylluminator_spark.operators.cleanup import (
        _reassemble_total,
        _split_paragraphs_total,
    )

    # TOTAL split (blank paragraphs kept as flagged rows, carry columns
    # riding the explode): every document owns at least one row, so the
    # reassembly is one doc-keyed aggregate with no join back to
    # ``docs`` — the join-back form scanned the source a second time
    paras_total = _split_paragraphs_total(
        docs, text_col, doc_col, pattern, carry_cols
    )
    bucketed = _scored_buckets(
        paras_total.filter(~F.col("blank")).select(
            doc_col, "para_idx", "para"
        ),
        doc_col,
        reference=reference,
        text_col=text_col,
        pattern=pattern,
        head_frac=head_frac,
        middle_frac=middle_frac,
        alpha=alpha,
        backoff=backoff,
        min_bigram_count=min_bigram_count,
    )
    wanted = [b for b in keep] + (["short"] if keep_short else [])
    joined = paras_total.join(bucketed, [doc_col, "para_idx"], "left")
    kept_flag = F.when(F.col("blank"), F.lit(False)).otherwise(
        F.coalesce(F.col("bucket"), F.lit("short")).isin(wanted)
    )
    # shared reassembly with the paragraph dedups (one doc-keyed
    # aggregate); ``keep_fps_col`` emits the kept paragraphs' distinct
    # fingerprints so a curation pipeline placing this stage after
    # paragraph dedup hands increments a probe-able fingerprint column
    # reflecting the POST-ccnet surviving paragraphs
    flagged = joined.select(
        doc_col,
        *carry_cols,
        "para_idx",
        "para",
        F.when(F.col("blank"), F.xxhash64(doc_col))
        .otherwise(F.xxhash64("para"))
        .alias("fp"),
        "blank",
        kept_flag.alias("kept"),
    )
    return _reassemble_total(flagged, doc_col, keep_fps_col, carry_cols)
