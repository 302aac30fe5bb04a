"""Mergeable histogram quantile sketch: numpy parity within one bin
width, exact merge property, clamping, and the percentile_approx engine
path's rank-error contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.sketch import (
    approx_quantiles,
    hist_merge,
    hist_quantiles,
    hist_sketch,
)

LO, HI, BINS = 0.0, 100.0, 50
QS = [0.1, 0.25, 0.5, 0.75, 0.9, 1.0]


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.RandomState(7)
    vals = np.concatenate(
        [rng.uniform(0, 100, 400), rng.normal(60, 10, 400).clip(0, 99.9)]
    )
    groups = ["a"] * 400 + ["b"] * 400
    df = spark.createDataFrame(
        [(g, float(v)) for g, v in zip(groups, vals)], ["grp", "v"]
    )
    return df, {"a": vals[:400], "b": vals[400:]}


def test_quantiles_within_bin_width(data):
    df, by_grp = data
    sk = hist_sketch(df, "v", ["grp"], lo=LO, hi=HI, bins=BINS)
    est = hist_quantiles(sk, QS, ["grp"], lo=LO, hi=HI, bins=BINS)
    width = (HI - LO) / BINS
    rows = {(r["grp"], r["q"]): r["est"] for r in est.collect()}
    assert len(rows) == 2 * len(QS)
    for g, vals in by_grp.items():
        for q in QS:
            exact = float(np.quantile(vals, q))
            assert abs(rows[(g, q)] - exact) <= width + 1e-9, (g, q)


def test_merge_equals_whole(data):
    df, _ = data
    half1 = df.filter(F.col("v") < 50)
    half2 = df.filter(F.col("v") >= 50)
    merged = hist_merge(
        [
            hist_sketch(half1, "v", ["grp"], lo=LO, hi=HI, bins=BINS),
            hist_sketch(half2, "v", ["grp"], lo=LO, hi=HI, bins=BINS),
        ]
    )
    whole = hist_sketch(df, "v", ["grp"], lo=LO, hi=HI, bins=BINS)
    m = {(r["grp"], r["bin"]): r["cnt"] for r in merged.collect()}
    w = {(r["grp"], r["bin"]): r["cnt"] for r in whole.collect()}
    assert m == w


def test_out_of_range_clamps(spark):
    df = spark.createDataFrame(
        [("g", -5.0), ("g", 101.0), ("g", 50.0), ("g", None)],
        ["grp", "v"],
    )
    sk = hist_sketch(df, "v", ["grp"], lo=LO, hi=HI, bins=BINS)
    rows = {r["bin"]: r["cnt"] for r in sk.collect()}
    assert rows == {0: 1, BINS - 1: 1, 25: 1}  # NULL dropped
    # all three count toward ranks: median of {-5, 50, 101} ~ 50
    est = hist_quantiles(sk, [0.5], ["grp"], lo=LO, hi=HI, bins=BINS)
    got = est.collect()[0]["est"]
    assert 50.0 <= got <= 52.0 + 1e-9


def test_ungrouped(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    sk = hist_sketch(df, "v", lo=0.0, hi=100.0, bins=100)
    est = hist_quantiles(sk, [0.5], lo=0.0, hi=100.0, bins=100)
    # r = 50 lands in bin 49 (cum 50): est = 49 + (50-49)/1 = 50
    assert est.collect()[0]["est"] == pytest.approx(50.0)


def test_approx_quantiles_rank_error(data):
    df, by_grp = data
    out = {
        r["grp"]: r["quantiles"]
        for r in approx_quantiles(
            df, "v", QS, ["grp"], accuracy=10_000
        ).collect()
    }
    for g, vals in by_grp.items():
        srt = np.sort(vals)
        n = len(srt)
        for q, est in zip(QS, out[g]):
            # GK guarantee: returned value's rank within n/accuracy of
            # target rank -> with accuracy >> n this is near-exact
            rank = np.searchsorted(srt, est, side="right")
            assert abs(rank - q * n) <= max(2, n // 1000)
