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
