"""Geo radius join: haversine parity with python and lossless blocking vs
brute force on random points."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.geo import haversine_km, radius_pairs


def _hav(a, b):
    la1, lo1 = a
    la2, lo2 = b
    p1, p2 = math.radians(la1), math.radians(la2)
    dphi = math.radians(la2 - la1) / 2
    dl = math.radians(lo2 - lo1) / 2
    x = (
        math.sin(dphi) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin(dl) ** 2
    )
    return 2 * 6371.0 * math.asin(math.sqrt(x))


def test_haversine_known_value(spark):
    # Paris -> London ~ 344 km
    df = spark.createDataFrame(
        [(48.8566, 2.3522, 51.5074, -0.1278)], "a double, b double, c double, d double"
    )
    got = df.select(
        haversine_km(F.col("a"), F.col("b"), F.col("c"), F.col("d")).alias("d")
    ).collect()[0].d
    assert got == pytest.approx(343.5, abs=1.0)


@pytest.mark.parametrize("radius", [50.0, 300.0])
def test_radius_pairs_match_bruteforce(spark, radius):
    rng = random.Random(17)
    pts = [
        (i, rng.uniform(-60, 60), rng.uniform(-180, 180))
        for i in range(400)
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {
        (r.id_a, r.id_b) for r in radius_pairs(
            df, "id", "lat", "lon", radius
        ).collect()
    }
    want = {
        (a[0], b[0])
        for i, a in enumerate(pts)
        for b in pts[i + 1:]
        if _hav(a[1:], b[1:]) <= radius
    }
    assert got == want and len(want) > 0


def test_radius_pairs_plan_no_cartesian(spark):
    df = spark.createDataFrame(
        [(i, float(i % 50), float(i % 90)) for i in range(1000)],
        "id long, lat double, lon double",
    )
    plan = radius_pairs(
        df, "id", "lat", "lon", 25.0
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_polar_rejection(spark):
    df = spark.createDataFrame(
        [(1, 89.5, 0.0)], "id long, lat double, lon double"
    )
    with pytest.raises(ValueError):
        radius_pairs(df, "id", "lat", "lon", 10.0)
