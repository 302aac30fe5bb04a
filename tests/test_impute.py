"""Imputation strategies vs hand-computed fills."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.impute import impute


@pytest.fixture(scope="module")
def idf(spark):
    rows = [
        ("a", 1.0, "x"), ("a", 3.0, "x"), ("a", None, "y"),
        ("a", None, None),
        ("b", 10.0, "z"), ("b", None, "z"), ("b", 20.0, None),
        ("c", None, None),  # group with nothing observed
    ]
    return spark.createDataFrame(rows, "g string, v double, s string")


def test_grouped_mean(spark, idf):
    out = impute(idf, {"v": "mean"}, group_cols=["g"]).collect()
    by = {}
    for r in out:
        by.setdefault(r.g, []).append((r.v, r.v_imputed))
    assert sorted(by["a"]) == [(1.0, False), (2.0, True), (2.0, True), (3.0, False)]
    assert sorted(by["b"]) == [(10.0, False), (15.0, True), (20.0, False)]
    assert by["c"] == [(None, False)]  # nothing to fill from


def test_global_median_and_mode(spark, idf):
    out = impute(idf, {"v": "median", "s": "mode"}).collect()
    vals = sorted(r.v for r in out)
    # global median of [1,3,10,20] = 6.5
    assert vals.count(6.5) == 4  # all four NULL v rows filled
    # mode of s: x and z tie at 2 -> smallest wins ('x')
    filled_s = [r.s for r in out if r.s_imputed]
    assert filled_s == ["x"] * 3


def test_constant(spark, idf):
    out = impute(idf, {"s": ("constant", "???")}).collect()
    assert sum(1 for r in out if r.s == "???") == 3


def test_unknown_strategy(spark, idf):
    with pytest.raises(ValueError):
        impute(idf, {"v": "banana"})
