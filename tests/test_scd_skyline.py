"""SCD2 history vs a python reference; skyline vs brute-force dominance."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.scd import as_of_lookup, scd2_from_changes
from pylluminator_spark.operators.skyline import skyline, skyline_2d


def _ts(i):
    return datetime(2024, 1, 1) + timedelta(hours=i)


def test_scd2_versions(spark):
    rows = [
        (1, _ts(0), "bronze"),
        (1, _ts(2), "bronze"),   # no-op update: collapses
        (1, _ts(5), "silver"),
        (1, _ts(9), "gold"),
        (2, _ts(1), "silver"),
    ]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, tier string")
    hist = scd2_from_changes(df, "uid", "ts", ["tier"]).collect()
    got = {
        (r.uid, r.tier): (r.valid_from, r.valid_to, r.is_current)
        for r in hist
    }
    assert got[(1, "bronze")] == (_ts(0), _ts(5), False)
    assert got[(1, "silver")] == (_ts(5), _ts(9), False)
    assert got[(1, "gold")] == (_ts(9), None, True)
    assert got[(2, "silver")] == (_ts(1), None, True)
    assert len(hist) == 4


def test_scd2_same_instant_last_wins(spark):
    rows = [
        (1, _ts(0), 1, "a"),
        (1, _ts(0), 2, "b"),  # same ts; higher seq wins the instant
        (1, _ts(3), 3, "c"),
    ]
    df = spark.createDataFrame(
        rows, "uid long, ts timestamp, seq int, v string"
    )
    hist = scd2_from_changes(
        df, "uid", "ts", ["v"], tiebreak=["seq"]
    ).collect()
    got = {r.v: (r.valid_from, r.valid_to) for r in hist}
    assert "a" not in got  # zero-length interval dropped
    assert got["b"] == (_ts(0), _ts(3))
    assert got["c"] == (_ts(3), None)


def test_as_of_lookup(spark):
    changes = spark.createDataFrame(
        [(1, _ts(0), "x"), (1, _ts(10), "y")],
        "uid long, ts timestamp, v string",
    )
    hist = scd2_from_changes(changes, "uid", "ts", ["v"])
    probes = spark.createDataFrame(
        [(1, _ts(5)), (1, _ts(10)), (1, _ts(99)), (2, _ts(1))],
        "uid long, ts timestamp",
    )
    got = {
        (r.uid, r.ts): r.v
        for r in as_of_lookup(hist, probes, "uid", "ts").collect()
    }
    assert got[(1, _ts(5))] == "x"
    assert got[(1, _ts(10))] == "y"  # boundary: new version owns its start
    assert got[(1, _ts(99))] == "y"
    assert got[(2, _ts(1))] is None  # unknown key -> NULL attrs


def _brute_skyline(points):
    def dom(p, q):
        return all(a <= b for a, b in zip(p, q)) and any(
            a < b for a, b in zip(p, q)
        )

    return {q for q in points if not any(dom(p, q) for p in points if p != q)}


@pytest.mark.parametrize("n_dims", [2, 3])
def test_skyline_matches_bruteforce(spark, n_dims):
    rng = random.Random(21 + n_dims)
    pts = list(
        {
            tuple(rng.randrange(100) for _ in range(n_dims))
            for _ in range(800)
        }
    )
    cols = [f"c{i}" for i in range(n_dims)]
    df = spark.createDataFrame(pts, ", ".join(f"{c} long" for c in cols))
    want = _brute_skyline(pts)
    got = {tuple(r) for r in skyline(df, cols).collect()}
    assert got == want
    if n_dims == 2:
        got2 = {tuple(r) for r in skyline_2d(df, "c0", "c1").collect()}
        assert got2 == want


def test_skyline_2d_keep_columns_and_ties(spark):
    rows = [(1, 5, "a"), (1, 5, "b"), (2, 4, "c"), (3, 5, "d"), (2, 6, "e")]
    df = spark.createDataFrame(rows, "x long, y long, tag string")
    out = skyline_2d(df, "x", "y", keep_columns=True).collect()
    # frontier pairs: (1,5) and (2,4); both duplicate (1,5) rows kept
    assert {r.tag for r in out} == {"a", "b", "c"}
