"""Opt-in scale smokes for the round-4 pair-generators that lacked one
(VERDICT r4 #5): the exact Jaccard set-similarity join at 200k docs and
association rules at 1M (basket, item) rows with hot baskets exactly at
the ``max_basket_size`` boundary.

Slow by design; enable with SPARK_GRAFT_SCALE=1. Exact-value parity at
small n lives in test_jaccard_join.py / test_basket.py and the driver
gate entries ``jaccard_pairs`` / ``basket_rules``.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE"),
    reason="set SPARK_GRAFT_SCALE=1 to run the round-5 scale smokes",
)


def _synthetic_docs(spark, n_docs: int, n_dup_pairs: int):
    """n_docs documents of 8 random 12-hex tokens; the first
    2*n_dup_pairs ids form n_dup_pairs exact-duplicate pairs
    (i <-> i + n_dup_pairs), everything else is token-disjoint."""
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


def test_jaccard_join_exact_200k_docs(spark):
    from pylluminator_spark.operators.dedup import jaccard_join_exact

    n, dups = 200_000, 1_000
    docs = _synthetic_docs(spark, n, dups)
    pairs = jaccard_join_exact(docs, threshold=0.8)
    # the blocking must stay hash equi-joins — no pair enumeration
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # candidate volume << n^2: with 12-hex tokens the non-dup docs are
    # token-disjoint, so the prefix index only collides the planted
    # duplicates — exactly `dups` verified pairs, all J = 1.0
    got = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("jaccard").alias("jmin"),
        F.sum((F.col("inter_size") == F.col("union_size")).cast("int")).alias(
            "n_exact"
        ),
    ).collect()[0]
    assert got.n_pairs == dups
    assert got.jmin == 1.0 and got.n_exact == dups


def test_association_rules_1m_rows_hot_basket_boundary(spark):
    from pylluminator_spark.operators.basket import (
        association_rules,
        item_pairs,
    )

    # 1M (basket, item) rows: 100k baskets of 10 items; baskets b and
    # b + 50_000 share the identical item set, so every within-basket
    # pair co-occurs exactly twice (passes min_pair_count=2)
    n = 1_000_000
    base = spark.range(0, n, 1, 32).select(
        (F.col("id") / 10).cast("long").alias("basket"),
        (
            ((F.col("id") / 10).cast("long") % 50_000) * 10
            + F.col("id") % 10
        ).alias("item"),
    )
    # hot baskets at the cap boundary, with items disjoint from the base
    # id space: size 50 (== max_basket_size, MUST be kept) and size 51
    # (one over, MUST be dropped)
    hot_keep = spark.range(0, 50).select(
        F.lit(-1).cast("long").alias("basket"),
        (F.col("id") + 10_000_000).alias("item"),
    )
    hot_drop = spark.range(0, 51).select(
        F.lit(-2).cast("long").alias("basket"),
        (F.col("id") + 20_000_000).alias("item"),
    )
    df = base.unionByName(hot_keep).unionByName(hot_drop)

    # boundary semantics via item_pairs (pre-min_pair_count): the size-50
    # basket contributes C(50,2) singleton pairs, the size-51 none
    hot_pairs = (
        item_pairs(df, "basket", "item", max_basket_size=50)
        .filter(F.col("item_a") >= 10_000_000)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("item_a") >= 20_000_000).cast("int")).alias(
                "n_dropped_basket"
            ),
        )
        .collect()[0]
    )
    assert hot_pairs.n == 50 * 49 // 2
    assert hot_pairs.n_dropped_basket == 0

    # full-scale rules: 50k distinct item sets x C(10,2) pairs x 2
    # directions, every pair_count exactly 2; hot baskets are filtered
    # (kept one is all-singleton pairs, dropped one is capped away)
    rules = association_rules(
        df, "basket", "item", min_pair_count=2, max_basket_size=50
    )
    stats = rules.agg(
        F.count(F.lit(1)).alias("n_rules"),
        F.min("pair_count").alias("cmin"),
        F.max("pair_count").alias("cmax"),
    ).collect()[0]
    assert stats.n_rules == 50_000 * 45 * 2
    assert stats.cmin == 2 and stats.cmax == 2
