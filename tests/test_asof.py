"""As-of join vs pandas.merge_asof on randomized event streams."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pylluminator_spark.operators.asof import asof_join


def _streams(seed: int, n_left=200, n_right=150, n_keys=5):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "user_id": rng.integers(0, n_keys, n_left).astype("int64"),
            "ts": rng.choice(np.arange(0, 10000, 3), n_left, replace=False).astype(
                "int64"
            ),
            "event_id": np.arange(n_left, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": rng.integers(0, n_keys, n_right).astype("int64"),
            # offset grid => some exact-equal, some strictly-between stamps
            "ts": rng.choice(np.arange(0, 10000, 2), n_right, replace=False).astype(
                "int64"
            ),
            "price": rng.uniform(1, 100, n_right).round(4),
        }
    )
    return left, right


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_matches_pandas(spark, seed, direction, strict):
    left, right = _streams(seed)
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="user_id",
            direction=direction,
            strict=strict,
        )
        .toPandas()
        .set_index("event_id")["price_asof"]
    )
    exp = (
        pd.merge_asof(
            left.sort_values("ts"),
            right.sort_values("ts"),
            on="ts",
            by="user_id",
            direction=direction,
            allow_exact_matches=not strict,
        )
        .set_index("event_id")["price"]
    )
    assert len(got) == len(left)
    for eid in exp.index:
        g, e = got[eid], exp[eid]
        if pd.isna(e):
            assert pd.isna(g), eid
        else:
            assert g == pytest.approx(e), eid


def test_asof_plan_is_partitioned(spark):
    left, right = _streams(3)
    out = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right), on="user_id"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
