"""Exact prefix-filtered Jaccard self-join (operators.dedup.jaccard_join_exact).

The load-bearing claim is LOSSLESSNESS: prefix filtering must return
exactly the pairs a brute-force all-pairs scan returns — no false
negatives from the blocking, no false positives from the verify.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pylluminator_spark.functions.text import tokens_expr
from pylluminator_spark.operators.dedup import jaccard_join_exact

SF0001 = "/root/testdata/sf0.001"


def _brute_force(docs, threshold, id_col="doc_id", text_col="text"):
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokens_expr(F.lower(F.col(text_col)))).alias("s"),
    ).filter(F.size("s") > 0)
    a = toks.select(F.col("id").alias("id_a"), F.col("s").alias("sa"))
    b = toks.select(F.col("id").alias("id_b"), F.col("s").alias("sb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("i", F.size(F.array_intersect("sa", "sb")))
        .withColumn("u", F.size("sa") + F.size("sb") - F.col("i"))
        .withColumn("j", F.col("i") / F.col("u"))
        .filter(F.col("j") >= threshold)
        .select("id_a", "id_b", "i", "u", "j")
    )


def _pairs(df, jac_col):
    return sorted(
        (r.id_a, r.id_b, r.i, r.u, round(r.j, 9))
        for r in df.select(
            "id_a",
            "id_b",
            F.col("inter_size" if jac_col == "jaccard" else "i").alias("i"),
            F.col("union_size" if jac_col == "jaccard" else "u").alias("u"),
            F.col(jac_col).alias("j"),
        ).collect()
    )


def test_matches_brute_force_on_real_corpus(spark):
    # deterministic 1-in-10 subset keeps the quadratic oracle cheap
    docs = spark.read.parquet(f"{SF0001}/documents.parquet").filter(
        F.col("doc_id") % 10 == 0
    )
    got = _pairs(jaccard_join_exact(docs, threshold=0.8), "jaccard")
    want = _pairs(_brute_force(docs, 0.8), "j")
    assert len(got) > 0  # the templated corpus must actually produce pairs
    assert got == want


def test_threshold_boundary_and_edge_sets(spark):
    # crafted sets: identical pair (J=1), exactly-at-threshold pair
    # (|inter|=3, |union|=5 -> J=0.6), just-below pair (2/4=0.5), a
    # disjoint pair, and an empty doc (dropped: no defined similarity)
    rows = [
        (1, "a b c d"),
        (2, "a b c d"),          # J(1,2) = 1.0
        (3, "a b c e f"),        # J(1,3) = 3/6 = 0.5  (below)
        (4, "a b c d e"),        # J(1,4) = 4/5 = 0.8; J(3,4)=4/6
        (5, "x y z"),            # disjoint from all
        (6, "   "),              # empty token set -> excluded
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = _pairs(jaccard_join_exact(docs, threshold=0.8), "jaccard")
    assert got == [
        (1, 2, 4, 4, 1.0),
        (1, 4, 4, 5, 0.8),  # J == t exactly must be KEPT (>=, not >)
        (2, 4, 4, 5, 0.8),
    ]
    # and the same crafted set against brute force at a threshold where
    # the prefix is longest (small t stresses the candidate stage)
    got_low = _pairs(jaccard_join_exact(docs, threshold=0.4), "jaccard")
    want_low = _pairs(_brute_force(docs, 0.4), "j")
    assert got_low == want_low


def test_prefix_join_has_no_cartesian(spark):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    plan = (
        jaccard_join_exact(docs, threshold=0.8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan
