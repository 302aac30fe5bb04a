"""Opt-in scale smokes for the round-6 additions: TF-IDF cosine pairs at
100k docs (inverted-index blocking must stay equi-joins and find exactly
the planted duplicates), the Bloom-pruned join at 1M fact rows (result
identity vs the plain join plus the pruning actually biting), and the
CDC merge at 1M snapshot rows (exact expected cardinality).

Slow by design; enable with SPARK_GRAFT_SCALE=1. Exact-value parity at
small n lives in test_tfidf_pairs.py / test_sketch.py /
test_diff_index.py and the driver entries ``tfidf_pairs`` /
``bloom_prune`` / ``apply_changes``.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE"),
    reason="set SPARK_GRAFT_SCALE=1 to run the round-6 scale smokes",
)


def _synthetic_docs(spark, n_docs: int, n_dup_pairs: int):
    """As in test_scale_smoke_r5: first 2*n_dup_pairs ids form exact-dup
    pairs (i <-> i + n_dup_pairs); everything else token-disjoint."""
    seed = F.when(
        F.col("id") < 2 * n_dup_pairs, F.col("id") % n_dup_pairs
    ).otherwise(F.col("id"))
    toks = [
        F.substring(
            F.md5(F.concat(seed.cast("string"), F.lit(f"#{k}"))), 1, 12
        )
        for k in range(8)
    ]
    return spark.range(0, n_docs, 1, 32).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *toks).alias("text")
    )


def test_tfidf_cosine_pairs_100k_docs(spark):
    from pylluminator_spark.operators.dedup import tfidf_cosine_pairs

    n, dups = 100_000, 500
    docs = _synthetic_docs(spark, n, dups)
    pairs = tfidf_cosine_pairs(docs, threshold=0.99)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    # the only BNLJ allowed is the 1-row n_docs scalar crossJoin (see
    # test_plans SCALAR_AGG_OK); a cartesian pair enumeration is not
    assert "CartesianProduct" not in plan
    got = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("cosine").alias("cmin"),
        F.min("n_shared").alias("smin"),
    ).collect()[0]
    # disjoint non-dup docs share no token, so the posting-list self-join
    # can only emit the planted duplicate pairs — cosine exactly 1
    assert got["n_pairs"] == dups
    assert got["cmin"] == pytest.approx(1.0, abs=1e-12)
    assert got["smin"] == 8


def test_bloom_prune_join_1m_fact_rows(spark):
    from pylluminator_spark.operators.sketch import bloom_prune_join

    fact = spark.range(0, 1_000_000, 1, 32).select(
        (F.col("id") % 100_000).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 100_000, 1, 8).filter(
        F.col("id") % 97 == 0
    ).select(F.col("id").alias("k"), (F.col("id") * 2).alias("attr"))
    got = bloom_prune_join(fact, dim, "k", m_bits=1 << 17).agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    ).collect()[0]
    want = fact.join(dim, "k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    ).collect()[0]
    assert (got["n"], got["s"]) == (want["n"], want["s"])
    # and the probe must actually prune: replay THE production filter
    # (bloom_inline_probe_cond — the exact predicate bloom_prune_join
    # applies) alone — with 128k bits / ~1031 keys the FP rate is ~0, so
    # the surviving fact fraction must be within 2x of the true 1/97
    # match rate
    from pylluminator_spark.operators.sketch import bloom_inline_probe_cond

    cond = bloom_inline_probe_cond(dim, "k", m_bits=1 << 17)
    survivors = fact.filter(cond).count()
    assert survivors <= 2 * want["n"]


def test_apply_changes_1m_snapshot(spark):
    from pylluminator_spark.operators.diff import apply_changes

    n = 1_000_000
    snap = spark.range(0, n, 1, 32).select(
        F.col("id").alias("k"), (F.col("id") % 1000).alias("v")
    )
    # 100k keys get changes: 3 versions each, highest version deletes
    # every 5th changed key
    ch = spark.range(0, 300_000, 1, 32).select(
        (F.col("id") % 100_000).alias("k"),
        F.lit(-1).alias("v"),
        (F.col("id") / 100_000).cast("long").alias("version"),
        F.when(
            ((F.col("id") / 100_000).cast("long") == 2)
            & (F.col("id") % 5 == 0),
            F.lit("D"),
        )
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    out = apply_changes(snap, ch, ["k"])
    # keys whose id%5==0 among 0..99_999 at version 2 are deleted:
    # version-2 rows are ids 200_000..299_999, id%5==0 -> k%5==0 ->
    # 20_000 deleted keys; everything else survives
    assert out.count() == n - 20_000
    # every surviving changed key carries the change payload (v = -1)
    changed = out.filter(F.col("k") < 100_000)
    assert changed.count() == 80_000
    assert changed.filter(F.col("v") != -1).count() == 0


def test_minimizer_pipeline_100k_docs(spark):
    # 100k docs, 500 planted exact-dup pairs: every planted pair shares
    # ALL its minimizers (texts identical), unrelated docs are token-
    # disjoint 12-hex streams, so cross-pair minimizer collisions can
    # only come from hash collisions in the 1e6 bucket space — the pair
    # stage must recover the planted pairs and nothing else at
    # min_shared=3, and stay join-shaped (no cartesian)
    from pylluminator_spark.operators.dedup import (
        minimizer_candidate_pairs,
        minimizer_signatures,
    )

    n, dups = 100_000, 500
    docs = _synthetic_docs(spark, n, dups)
    sigs = minimizer_signatures(docs, "text", "doc_id", k=8, w=8)
    pairs = minimizer_candidate_pairs(
        sigs, "doc_id", min_shared=3, max_df=50, bucket_partitions=32
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    planted = pairs.filter(
        F.col("id_b") - F.col("id_a") == dups
    )
    assert planted.count() == dups
    # planted duplicates share their whole signature: n_shared == the
    # doc's distinct-minimizer count (~2*len/(w+1) > 3)
    assert pairs.agg(F.min("n_shared")).collect()[0][0] >= 3


def test_quantile_bins_1m_rows_exact_sizes(spark):
    # 1M-row two-phase NTILE: bucket sizes must follow the exact ANSI
    # contract (first r buckets q+1 rows, rest q) with zero drift — the
    # arithmetic path has no window wider than one range partition
    from pylluminator_spark.operators.ordered import quantile_discretize

    n, bins = 1_000_000, 7
    df = spark.range(0, n, 1, 32).select(
        F.col("id"),
        ((F.col("id") * 2654435761) % 999983).alias("v"),
    )
    got = quantile_discretize(df, "v", bins, ["id"], num_partitions=32)
    sizes = {
        r["bucket"]: r["n"]
        for r in got.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    q, r = divmod(n, bins)
    expect = {b: q + 1 if b <= r else q for b in range(1, bins + 1)}
    assert sizes == expect
