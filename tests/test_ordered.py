"""Distributed ordered computations vs single-window / pandas references."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pylluminator_spark.operators.ordered import (
    bh_adjust_global,
    with_global_rank,
    with_lead,
    with_running_min,
    with_running_sum,
)


@pytest.fixture(scope="module")
def values(spark):
    df = (
        spark.range(0, 5000, 1, 16)
        .withColumn("v", ((F.col("id") * 2654435761) % 100000) / 7.0)
        .withColumn("w", (F.col("id") % 97).cast("double"))
        .cache()
    )
    df.count()
    return df


def test_global_rank_matches_window(values):
    got = with_global_rank(values, ["v", "id"], "rk", num_partitions=8)
    ref = values.withColumn("rk", F.row_number().over(Window.orderBy("v", "id")))
    g = {r.id: r.rk for r in got.collect()}
    w = {r.id: r.rk for r in ref.collect()}
    assert g == w
    # no single-partition exchange in the distributed plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_running_sum_matches_window(values):
    got = with_running_sum(values, ["v", "id"], "w", "cs", num_partitions=8)
    ref = values.withColumn(
        "cs",
        F.sum("w").over(
            Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    g = {r.id: r.cs for r in got.collect()}
    w = {r.id: r.cs for r in ref.collect()}
    assert all(g[k] == pytest.approx(w[k], rel=1e-12) for k in w)


def test_running_min_matches_window(values):
    vals = values.withColumn("neg", -F.col("w") - F.col("v") / 1e9)
    got = with_running_min(vals, ["v", "id"], "neg", "cm", num_partitions=8)
    ref = vals.withColumn(
        "cm",
        F.min("neg").over(
            Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    g = {r.id: r.cm for r in got.collect()}
    w = {r.id: r.cm for r in ref.collect()}
    assert all(g[k] == pytest.approx(w[k], rel=1e-12) for k in w)


def test_with_lead_matches_window(values):
    # source column with nulls: a null lead must mean "last row overall",
    # never "partition boundary"
    vals = values.withColumn(
        "s", F.when(F.col("id") % 11 == 0, None).otherwise(F.col("w"))
    ).withColumn("grp", (F.col("id") % 5).cast("string"))
    got = with_lead(
        vals, ["v", "id"], {"next_s": "s", "next_grp": "grp"}, num_partitions=8
    )
    w = Window.orderBy("v", "id")
    ref = vals.withColumn("next_s", F.lead("s").over(w)).withColumn(
        "next_grp", F.lead("grp").over(w)
    )
    g = {r.id: (r.next_s, r.next_grp) for r in got.collect()}
    r_ = {r.id: (r.next_s, r.next_grp) for r in ref.collect()}
    assert g == r_
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_with_lead_small_path(values):
    got = with_lead(values, ["v", "id"], {"nx": "w"}, n_rows=5000)
    ref = values.withColumn("nx", F.lead("w").over(Window.orderBy("v", "id")))
    assert {r.id: r.nx for r in got.collect()} == {
        r.id: r.nx for r in ref.collect()
    }


def test_bh_adjust_global_matches_reference(spark):
    rng = np.random.RandomState(3)
    p = rng.uniform(0, 1, 1000)
    pdf = pd.DataFrame({"probe": [f"p{i}" for i in range(1000)], "p": p})
    df = spark.createDataFrame(pdf).repartition(8)
    got = bh_adjust_global(df, "p", "p_adj", tie_cols=["probe"]).toPandas()

    # pandas reference BH
    order = np.argsort(p, kind="stable")
    ranked = p[order] * len(p) / (np.arange(len(p)) + 1)
    adj = np.minimum.accumulate(ranked[::-1])[::-1]
    adj = np.clip(adj, 0, 1)
    ref = pd.Series(adj, index=pdf["probe"].to_numpy()[order])

    got = got.set_index("probe")["p_adj"]
    for k in ref.index:
        assert got[k] == pytest.approx(ref[k], rel=1e-12)


def test_running_min_null_prefix_stays_null(spark):
    """Distributed path: rows before the first non-null value must get a
    NULL running min, never a numeric sentinel posing as data."""
    from pyspark.sql import functions as F

    rows = [(i, None if i < 40 else int(i)) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "x"]).withColumn(
        "x", F.col("x").cast("long")
    )
    got = {
        r.id: r.cm
        for r in with_running_min(
            df, ["id"], "x", "cm", num_partitions=8
        ).collect()
    }
    for i in range(200):
        assert got[i] == (None if i < 40 else 40), i


class TestQuantileDiscretize:
    def test_matches_ntile_window(self, spark, values):
        from pylluminator_spark.operators.ordered import quantile_discretize

        for n_bins in (1, 3, 7, 13):
            got = quantile_discretize(
                values, "v", n_bins, ["id"], num_partitions=8
            )
            w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
            ref = values.withColumn("_nt", F.ntile(n_bins).over(w))
            joined = got.join(ref.select("id", "_nt"), "id")
            assert (
                joined.filter(F.col("bucket") != F.col("_nt")).count() == 0
            ), n_bins

    def test_two_phase_path_forced(self, spark, values):
        # n_rows above the threshold forces the distributed rank path
        from pylluminator_spark.operators.ordered import quantile_discretize

        got = quantile_discretize(
            values, "v", 4, ["id"], num_partitions=8, n_rows=10**9
        )
        sizes = sorted(
            r["n"]
            for r in got.groupBy("bucket").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        )
        assert sizes == [1250, 1250, 1250, 1250]

    def test_remainder_buckets_lead(self, spark):
        from pylluminator_spark.operators.ordered import quantile_discretize

        df = spark.createDataFrame(
            [(i, float(i)) for i in range(10)], ["id", "v"]
        )
        got = quantile_discretize(df, "v", 3, ["id"]).collect()
        by_bucket = {}
        for r in got:
            by_bucket.setdefault(r["bucket"], []).append(r["id"])
        # 10 = 3*3 + 1: bucket 1 gets 4 rows, buckets 2-3 get 3
        assert sorted(len(v) for v in by_bucket.values()) == [3, 3, 4]
        assert len(by_bucket[1]) == 4
        assert sorted(by_bucket[1]) == [0, 1, 2, 3]

    def test_n_bins_validation(self, spark, values):
        from pylluminator_spark.operators.ordered import quantile_discretize

        with pytest.raises(ValueError):
            quantile_discretize(values, "v", 0, ["id"])

    def test_empty_input(self, spark):
        from pylluminator_spark.operators.ordered import quantile_discretize

        df = spark.createDataFrame([], "id bigint, v double")
        assert quantile_discretize(df, "v", 4, ["id"]).count() == 0
