"""Opt-in end-to-end LLM-corpus pipeline scale run (SPARK_GRAFT_SCALE=1):
the data-pipeline analogue of test_scale_pipeline's methyl chain. 200k
synthetic crawled docs with PLANTED phenomena flow through the standard
curation chain:

    language ID (fit+classify, fused) -> keep target lang
    -> exact dedup -> paragraph dedup -> strip HTML
    -> token-count quality gate -> pack into fixed-token-budget sequences

(HTML stripping runs AFTER the paragraph-level stages: strip_html_expr
normalizes whitespace, which erases the blank-line paragraph boundaries
dedup_paragraphs keys on — ordering that matters in real pipelines too.)

Every stage's effect is asserted against the planted construction
(deterministic hash-mixed text, no RNG): the classifier separates the
character-disjoint languages exactly, planted exact duplicates collapse
to one survivor each, the shared boilerplate paragraph survives exactly
once corpus-wide, HTML tags never reach the packed output, and packing
conserves every surviving token. ~1-2 min at local[32].
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE"),
    reason="set SPARK_GRAFT_SCALE=1 to run the LLM-pipeline scale smoke",
)

N_BASE = 100_000  # unique docs per language before planting duplicates
N_DUP = 10_000    # planted exact duplicates of alpha docs
BOILER = "shared boilerplate banner"


def _words(col, salt: int, alphabet: str, n: int):
    return F.concat_ws(
        " ",
        *[
            F.translate(
                F.conv(F.xxhash64(col, F.lit(salt * 100 + i)), 10, 4),
                "-0123",
                alphabet,
            )
            for i in range(n)
        ],
    )


@pytest.fixture(scope="module")
def corpus(spark):
    """ids [0, N_BASE): alpha docs; [N_BASE, 2N): zeta docs;
    [2N, 2N + N_DUP): exact duplicates of alpha doc id % N_BASE.
    Every doc = 3 paragraphs; the middle one is the SHARED boilerplate;
    alpha docs carry an HTML tag that must not survive stripping."""
    base = spark.range(0, 2 * N_BASE + N_DUP, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") >= 2 * N_BASE, F.col("id") - 2 * N_BASE)
        .otherwise(F.col("id"))
        .alias("_src"),
    )
    is_alpha = (F.col("_src") < N_BASE) | (F.col("_src") >= 2 * N_BASE)
    body = F.when(
        is_alpha, _words(F.col("_src") % N_BASE, 1, "abcde", 12)
    ).otherwise(_words(F.col("_src"), 2, "vwxyz", 12))
    text = F.concat_ws(
        "\n\n",
        F.concat(F.lit("<p>intro</p> "), body),
        F.lit(BOILER),
        _words(F.col("_src") % N_BASE, 3, "abcde", 6),
    )
    # zeta docs: fully zeta-alphabet text (no shared words with alpha)
    ztext = F.concat_ws(
        "\n\n",
        _words(F.col("_src"), 2, "vwxyz", 12),
        F.lit(BOILER),
        _words(F.col("_src"), 4, "vwxyz", 6),
    )
    lang = F.when(is_alpha, "alpha").otherwise("zeta")
    return base.select(
        "doc_id", lang.alias("lang"),
        F.when(is_alpha, text).otherwise(ztext).alias("text"),
    )


def test_llm_pipeline_end_to_end(spark, corpus):
    from pylluminator_spark.functions.text import (
        strip_html_expr,
        token_count_expr,
    )
    from pylluminator_spark.operators.cleanup import dedup_paragraphs
    from pylluminator_spark.operators.dedup import dedup_exact
    from pylluminator_spark.operators.langid import (
        fit_classify_langid,
        langid_predict,
    )
    from pylluminator_spark.operators.corpus import pack_sequences

    # 1. language ID on the raw crawl (self-labeled fit, fused single
    # gram pass) — character-disjoint languages must separate exactly
    # (the shared boilerplate paragraph contributes equally to both)
    pred = langid_predict(
        fit_classify_langid(corpus, n=3, buckets=1024, alpha=0.5)
    )
    wrong = (
        pred.join(corpus.select("doc_id", "lang"), "doc_id")
        .filter(F.col("pred_lang") != F.col("lang"))
        .count()
    )
    assert wrong == 0
    kept = corpus.join(
        pred.filter(F.col("pred_lang") == "alpha").select("doc_id"),
        "doc_id",
    )
    assert kept.count() == N_BASE + N_DUP

    # 2. exact dedup: every planted duplicate collapses onto its source
    deduped = dedup_exact(kept, text_col="text", id_col="doc_id")
    assert deduped.count() == N_BASE
    assert deduped.filter(F.col("doc_id") >= 2 * N_BASE).count() == 0

    # 3. paragraph dedup (BEFORE html strip — stripping collapses the
    # blank-line boundaries): the boilerplate survives exactly once
    paras = dedup_paragraphs(
        deduped.select("doc_id", "text"), text_col="text"
    )
    n_boiler = paras.filter(
        F.col("clean_text").contains(BOILER)
    ).count()
    assert n_boiler == 1
    assert paras.count() == N_BASE

    # 4. strip HTML + token-count quality gate
    final = paras.select(
        "doc_id", strip_html_expr(F.col("clean_text")).alias("text")
    ).filter(token_count_expr(F.col("text")).between(10, 10_000))
    assert final.filter(F.col("text").contains("<p>")).count() == 0
    assert final.count() == N_BASE

    # 5. pack into 512-token sequences: token totals conserved and
    # sequence ids are dense from 0
    packed = pack_sequences(final, budget=512)
    row = packed.agg(
        F.sum("n_tokens").alias("tot"),
        F.countDistinct("seq_id").alias("nseq"),
        F.max("seq_id").alias("maxseq"),
    ).collect()[0]
    direct_total = (
        final.select(
            token_count_expr(F.col("text")).alias("n")
        ).agg(F.sum("n")).collect()[0][0]
    )
    assert row["tot"] == direct_total
    assert row["nseq"] == row["maxseq"] + 1  # dense sequence ids
    # budget=512 with ~13-token docs -> dozens of docs per sequence
    assert row["nseq"] < N_BASE
