"""Bucketed co-located joins: correctness + the shuffle-free physical plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # managed tables land in the default warehouse dir; DROP TABLE in
    # teardown removes the files (spark.sql.warehouse.dir is a static conf
    # and cannot be pointed at a tmpdir on a live session)
    left = spark.range(10_000).select(
        F.col("id").alias("probe_id"), (F.col("id") % 97).alias("v")
    )
    right = spark.range(0, 10_000, 2).select(
        F.col("id").alias("probe_id"), (F.col("id") % 13).alias("w")
    )
    write_bucketed(left, "t_sig", "probe_id", num_buckets=8)
    write_bucketed(right, "t_betas", "probe_id", num_buckets=8)
    yield "t_sig", "t_betas"
    spark.sql("DROP TABLE IF EXISTS t_sig")
    spark.sql("DROP TABLE IF EXISTS t_betas")


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable auto-broadcast: at test sizes Spark would broadcast the small
    # side (also shuffle-free, but then bucketing isn't what's being tested);
    # at the 100 TB design point neither side is broadcastable.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "probe_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"


def test_bucketed_join_correct(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "probe_id")
    assert joined.count() == 5_000
    r = joined.agg(
        F.sum("v").alias("sv"), F.sum("w").alias("sw")
    ).collect()[0]
    # plain (shuffled) join must agree
    plain = (
        spark.table(lt)
        .repartition(7)
        .join(spark.table(rt).repartition(5), "probe_id")
        .agg(F.sum("v").alias("sv"), F.sum("w").alias("sw"))
        .collect()[0]
    )
    assert (r["sv"], r["sw"]) == (plain["sv"], plain["sw"])


def test_bucketed_groupby_is_exchange_free(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("probe_id").agg(F.sum("v").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
