"""Opt-in scale smokes for the round-10 machinery (SPARK_GRAFT_SCALE=1).

- DoReMi with ONE domain holding 1M documents: the production path's
  per-domain reduction is a plain SUM (constant aggregation state,
  map-side combine) — the r9 sorted fold collect_listed every document
  of the domain into one buffer and would hold 1M structs here. The
  smoke asserts the weights are sane AND the plan carries no
  corpus-sized collect_list.
- curate_pipeline at 150k docs with planted duplicates and boilerplate:
  every stage materializes through the manifest, planted phenomena
  resolve, and a second run is pure cache.
- reliable-checkpoint conf under an iterative operator at volume:
  suffix doubling writes its rounds into the configured directory and
  the result matches the localCheckpoint default.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE"),
    reason="set SPARK_GRAFT_SCALE=1 to run the r10 scale smokes",
)


def _hash_words(col, salt: int, alphabet: str, n: int = 8):
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


def test_doremi_million_doc_domain(spark):
    """1M docs in one domain + two small domains: the bounded-SUM
    production path must complete with constant per-group state and
    produce normalized weights; the unpredictable-by-reference domain
    carries the largest excess."""
    from pylluminator_spark.operators.doremi import doremi_domain_weights

    n_big = 1_000_000
    big = spark.range(0, n_big, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.lit("big").alias("source"),
        # low-entropy text: the self-fit LM predicts it well and the
        # reference (also drawn from it) predicts it well -> excess ~0
        F.concat(
            F.lit("alpha beta gamma delta epsilon zeta token "),
            (F.col("id") % 50).cast("string"),
        ).alias("text"),
    )
    # self-coherent (bigrams repeat across the domain, so the self-fit
    # LM predicts them) but with a vocabulary the reference never saw
    # (every bigram backs off under the ref LM) -> maximal excess.
    # Fully unique gibberish would be WRONG here: bigrams below
    # min_bigram_count back off under BOTH models and excess collapses
    # to ~0.
    weird = spark.range(n_big, n_big + 3_000, 1, 4).select(
        F.col("id").alias("doc_id"),
        F.lit("weird").alias("source"),
        F.concat(
            F.lit("qx zj xq jz qj zx "),
            (F.col("id") % 20).cast("string"),
        ).alias("text"),
    )
    plain = spark.range(n_big + 3_000, n_big + 6_000, 1, 4).select(
        F.col("id").alias("doc_id"),
        F.lit("plain").alias("source"),
        F.lit("alpha beta gamma delta epsilon zeta common text").alias(
            "text"
        ),
    )
    docs = big.unionByName(weird).unionByName(plain)
    ref = big.limit(20_000).select("doc_id", "text")
    out = doremi_domain_weights(docs, ref, min_bigram_count=2)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the corpus-sized per-domain fold signature must be absent on the
    # production path (the <= n_domains normalizer fold remains)
    assert "struct(doc_id," not in plan
    rows = {r["source"]: r for r in out.collect()}
    assert set(rows) == {"big", "weird", "plain"}
    assert rows["big"]["n_docs"] == n_big
    total_w = sum(r["weight"] for r in rows.values())
    assert total_w == pytest.approx(1.0, abs=1e-9)
    # the hash-word domain is the one the reference LM cannot predict
    assert rows["weird"]["excess"] == max(
        r["excess"] for r in rows.values()
    )
    assert rows["weird"]["excess"] > 0


def test_curate_pipeline_at_volume(spark, tmp_path):
    from pylluminator_spark.operators.curate import curate_pipeline

    n_base = 150_000
    n_dup = 15_000
    boiler = "subscribe now for updates"
    base = spark.range(0, n_base, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("<p>"),
            _hash_words(F.col("id"), 3, "abcd", 12),
            F.lit("</p>\n\n"),
            F.lit(boiler),
        ).alias("text"),
    )
    dups = spark.range(0, n_dup, 1, 8).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.lit("<p>"),
            _hash_words(F.col("id"), 3, "abcd", 12),
            F.lit("</p>\n\n"),
            F.lit(boiler),
        ).alias("text"),
    )
    docs = base.unionByName(dups)
    root = str(tmp_path / "curate")
    res = curate_pipeline(
        spark,
        root,
        docs,
        source_fingerprint="r10-smoke",
        keep_lang=None,
        min_tokens=3,
        max_tokens=1_000,
        pack_budget=256,
    )
    out = res.documents
    # exact dedup removed every planted duplicate
    assert out.count() == n_base
    assert out.filter(F.col("doc_id") >= 1_000_000).count() == 0
    # boilerplate paragraph survives exactly once corpus-wide
    assert out.filter(F.col("text").contains(boiler)).count() == 1
    # html stripped
    assert out.filter(F.col("text").contains("<p>")).count() == 0
    # packing conserves tokens and produces dense seq ids
    seq = res.sequences
    row = seq.agg(
        F.sum("n_tokens").alias("tot"),
        F.countDistinct("seq_id").alias("nseq"),
        F.max("seq_id").alias("mx"),
    ).collect()[0]
    assert row["tot"] == out.agg(F.sum("n_tokens")).collect()[0][0]
    assert row["nseq"] == row["mx"] + 1
    # rerun: every stage from cache
    again = curate_pipeline(
        spark,
        root,
        docs,
        source_fingerprint="r10-smoke",
        keep_lang=None,
        min_tokens=3,
        max_tokens=1_000,
        pack_budget=256,
    )
    assert all(again.from_cache.values()), again.from_cache


def test_reliable_checkpoint_under_suffix_doubling(spark, tmp_path):
    from pylluminator_spark.operators.suffix import suffix_array
    from pylluminator_spark.plans.checkpoint import CHECKPOINT_DIR_CONF

    docs = spark.range(0, 3_000, 1, 8).select(
        F.col("id").alias("doc_id"),
        F.concat(
            _hash_words(F.col("id") % 40, 5, "abab", 6),
            F.lit(" "),
            _hash_words(F.col("id") % 40, 5, "abab", 6),
        ).alias("text"),
    )
    base = suffix_array(docs).agg(
        F.count(F.lit(1)).alias("n"), F.sum("sa_rank").alias("s")
    ).collect()[0]
    ckpt = str(tmp_path / "ck")
    spark.conf.set(CHECKPOINT_DIR_CONF, ckpt)
    try:
        rel = suffix_array(docs).agg(
            F.count(F.lit(1)).alias("n"), F.sum("sa_rank").alias("s")
        ).collect()[0]
    finally:
        spark.conf.unset(CHECKPOINT_DIR_CONF)
    assert (base["n"], base["s"]) == (rel["n"], rel["s"])
    wrote = any(files for _d, _s, files in os.walk(ckpt))
    assert wrote
