"""Skew-handling operators: salted join/agg must be result-identical to the
plain versions on a deliberately skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from pylluminator_spark.operators.skew import (
    salted_agg,
    salted_collect_list,
    salted_join,
)


def _skewed(spark):
    # 90% of rows share key 0; the rest spread over 50 keys.
    return spark.range(2000).select(
        F.when(F.col("id") % 10 != 0, 0)
        .otherwise(F.col("id") % 50)
        .alias("k"),
        (F.col("id") * 3 % 97).alias("v"),
    )


def _dim(spark):
    return spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )


def test_salted_join_matches_plain_inner(spark):
    fact, dim = _skewed(spark), _dim(spark)
    plain = fact.join(dim, "k").groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    )
    salted = salted_join(fact, dim, "k", salt=8).groupBy("k").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_keeps_unmatched(spark):
    fact = _skewed(spark).withColumn("k", F.col("k") + 45)  # keys 45..94
    dim = _dim(spark)  # keys 0..49
    plain = fact.join(dim, "k", "left")
    salted = salted_join(fact, dim, "k", how="left", salt=4)
    assert plain.count() == salted.count()
    assert (
        plain.filter(F.col("w").isNull()).count()
        == salted.filter(F.col("w").isNull()).count()
    )


def test_salted_join_rejects_multiplicity_changing_types(spark):
    import pytest

    with pytest.raises(ValueError):
        salted_join(_skewed(spark), _dim(spark), "k", how="left_anti")


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("total"), F.count("*").alias("rows")
    )
    salted = salted_agg(
        df,
        "k",
        [F.sum("v").alias("s"), F.count("*").alias("c")],
        [F.sum("s").alias("total"), F.sum("c").alias("rows")],
        salt=8,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_collect_list_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: sorted(r["vs"])
        for r in df.groupBy("k")
        .agg(F.collect_list("v").alias("vs"))
        .collect()
    }
    salted = {
        r["k"]: list(r["values"])
        for r in salted_collect_list(df, "k", "v", salt=8).collect()
    }
    assert plain == salted
