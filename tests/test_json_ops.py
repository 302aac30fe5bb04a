"""JSON operators: key profiling, typed extraction, flattening."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.json_ops import (
    json_extract_typed,
    json_flatten,
    json_key_profile,
)

ROWS = [
    (1, '{"a": 1, "b": "x"}'),
    (2, '{"a": 2}'),
    (3, '{"b": "y", "c": {"d": 9}}'),
    (4, 'not json'),
    (5, None),
]


@pytest.fixture(scope="module")
def jdf(spark):
    return spark.createDataFrame(ROWS, "id long, props string")


def test_key_profile(spark, jdf):
    got = {
        r.key: (r.n_present, r.share)
        for r in json_key_profile(jdf, "props").collect()
    }
    assert got == {"a": (2, 0.4), "b": (2, 0.4), "c": (1, 0.2)}


def test_extract_typed(spark, jdf):
    out = json_extract_typed(
        jdf, "props", {"a": "a:bigint", "d": "c.d:bigint", "b": "b"}
    )
    got = {r.id: (r.a, r.d, r.b) for r in out.collect()}
    assert got[1] == (1, None, "x")
    assert got[3] == (None, 9, "y")
    assert got[4] == (None, None, None)  # malformed -> NULLs, no error
    assert got[5] == (None, None, None)


def test_flatten(spark, jdf):
    out = json_flatten(jdf, "props", prefix="p_")
    assert {"p_a", "p_b", "p_c"} <= set(out.columns)
    row3 = {r.id: r for r in out.collect()}[3]
    assert row3.p_c == '{"d":9}'
    with pytest.raises(ValueError):
        json_flatten(jdf, "props", max_keys=2)
