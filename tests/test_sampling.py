"""Deterministic hash sampling/splits: consistency, disjointness, tolerance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.sampling import hash_sample, split_assign


@pytest.fixture(scope="module")
def keyed(spark):
    # multiple rows per key: per-key consistency is the property under test
    return spark.range(30_000).select(
        (F.col("id") % 10_000).alias("k"), F.col("id").alias("row_id")
    )


def test_hash_sample_fraction_and_determinism(spark, keyed):
    s1 = hash_sample(keyed, "k", 0.2)
    s2 = hash_sample(keyed, "k", 0.2)
    n_keys = s1.select("k").distinct().count()
    assert 0.17 < n_keys / 10_000 < 0.23
    assert sorted(r["row_id"] for r in s1.collect()) == sorted(
        r["row_id"] for r in s2.collect()
    )


def test_hash_sample_per_key_all_or_nothing(keyed):
    s = hash_sample(keyed, "k", 0.3)
    per_key = s.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    # every sampled key brings ALL 3 of its rows
    assert per_key.filter(F.col("n") != 3).count() == 0


def test_split_assign_disjoint_exhaustive_consistent(keyed):
    out = split_assign(keyed, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.count() == 30_000
    # per-key: exactly one split value
    mixed = (
        out.groupBy("k")
        .agg(F.countDistinct("split").alias("d"))
        .filter(F.col("d") != 1)
    )
    assert mixed.count() == 0
    fracs = {
        r["split"]: r["n"] / 10_000
        for r in out.select("k", "split")
        .distinct()
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(fracs) == {"train", "val", "test"}
    assert 0.76 < fracs["train"] < 0.84
    assert 0.07 < fracs["val"] < 0.13
    assert 0.07 < fracs["test"] < 0.13


def test_split_assign_rejects_bad_weights(keyed):
    with pytest.raises(ValueError):
        split_assign(keyed, "k", {"a": 0.5, "b": 0.2})


def test_arith_bucket_negative_keys_stay_in_range(spark):
    from pylluminator_spark.operators.sampling import (
        arith_bucket_expr,
        stratified_sample,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(k, "en") for k in range(-50, 50)], ["id", "lang"]
    )
    buckets = [
        r.b
        for r in df.select(arith_bucket_expr(F.col("id"), 100).alias("b")).collect()
    ]
    assert all(0 <= b < 100 for b in buckets)
    # rate 0 drops EVERYTHING, negative keys included
    kept = stratified_sample(
        df, "lang", {"en": 0.0}, "id", default_rate=0.0, portable=True
    )
    assert kept.count() == 0


# --------------------------------------------------------------------------
# Weighted sampling without replacement (A-ES)
# --------------------------------------------------------------------------

import math

from pylluminator_spark.operators.sampling import weighted_sample


@pytest.fixture(scope="module")
def weighted(spark):
    # ids 0..999; weight 100 for ids < 50, weight 1 otherwise
    return spark.range(1_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 50, 100).otherwise(1).alias("w"),
        (F.col("id") % 4).cast("string").alias("stratum"),
    )


def test_weighted_global_topk_exact_size_and_determinism(weighted):
    a = weighted_sample(weighted, 100, "w", "doc_id")
    b = weighted_sample(weighted, 100, "w", "doc_id")
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(r["doc_id"] for r in b.collect())
    assert len(ids_a) == 100 and ids_a == ids_b


def test_weighted_favors_heavy_rows(weighted):
    s = weighted_sample(weighted, 100, "w", "doc_id")
    heavy = s.filter(F.col("doc_id") < 50).count()
    # 50 heavy rows carry 100x the weight of each of 950 light rows:
    # nearly all of them should be drawn (expected ~48)
    assert heavy >= 40


def test_weighted_matches_reference_aes(spark, weighted):
    # replicate the exact draw in plain Python: same hash -> same sample
    rows = weighted.collect()
    buckets = 10_000
    got = sorted(
        r["doc_id"]
        for r in weighted_sample(
            weighted, 30, "w", "doc_id", portable=True, buckets=buckets
        ).collect()
    )
    mult, mod = 2654435761, 1000003
    pri = []
    for r in rows:
        b = ((r["doc_id"] * mult) % mod + mod) % mod % buckets
        u = (b + 0.5) / buckets
        pri.append((math.log(u) / r["w"], -r["doc_id"], r["doc_id"]))
    want = sorted(d for _, _, d in sorted(pri, reverse=True)[:30])
    assert got == want


def test_weighted_per_stratum_counts(weighted):
    s = weighted_sample(weighted, 10, "w", "doc_id", strata_col="stratum")
    counts = {
        r["stratum"]: r["n"]
        for r in s.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"0": 10, "1": 10, "2": 10, "3": 10}


def test_weighted_excludes_nonpositive_weights(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 90, 0).otherwise(5).alias("w"),
    )
    s = weighted_sample(df, 50, "w", "doc_id")
    ids = sorted(r["doc_id"] for r in s.collect())
    assert ids == list(range(90, 100))


def test_weighted_k_larger_than_population(weighted):
    small = weighted.filter(F.col("doc_id") < 7)
    assert weighted_sample(small, 100, "w", "doc_id").count() == 7
