"""Opt-in scale smoke: pushes the size-dispatched ordered helpers past
SMALL_INPUT_ROWS (5M) so the range-partitioned two-phase path actually
engages, and checks global invariants that any rank/cumsum/lead bug breaks.

Slow (~40 s) by design; enable with SPARK_GRAFT_SCALE=1. The per-operator
exact-value checks at small n live in test_ordered.py / test_properties.py.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.ordered import (
    with_global_rank,
    with_lead,
    with_running_sum,
)

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE"),
    reason="set SPARK_GRAFT_SCALE=1 to run the 8M-row scale smoke",
)

N = 8_000_000


@pytest.fixture(scope="module")
def big(spark):
    df = (
        spark.range(0, N, 1, 64)
        .withColumn("k", (F.col("id") * 2654435761) % 1000000007)
        .withColumn("v", (F.col("id") % 1000).cast("double"))
        .persist()
    )
    df.count()
    yield df
    df.unpersist()


def test_rank_is_permutation_and_distributed(big):
    r = with_global_rank(big, ["k", "id"], "rk")
    assert "SinglePartition" not in r._jdf.queryExecution().executedPlan().toString()
    row = r.agg(
        F.count("rk"), F.countDistinct("rk"), F.min("rk"), F.max("rk")
    ).collect()[0]
    assert list(row) == [N, N, 1, N]


def test_running_sum_reaches_total(big):
    s = with_running_sum(big, ["k", "id"], "v", "cs")
    last = s.orderBy(F.desc("cs")).select("cs").limit(1).collect()[0][0]
    total = big.agg(F.sum("v")).collect()[0][0]
    assert last == pytest.approx(total, rel=1e-9)


def test_lead_has_one_null_and_no_order_violation(big):
    ld = with_lead(big, ["k", "id"], {"nk": "k"})
    assert ld.filter(F.col("nk").isNull()).count() == 1
    assert ld.filter(F.col("nk") < F.col("k")).count() == 0
