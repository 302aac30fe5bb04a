"""Z-order layout: Morton key parity with a python reference, locality
improvement vs unordered layout, and zone-map pruning on written files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.layout import (
    morton_key,
    normalize_to_bits,
    zone_map,
    zone_prune_fraction,
    zorder_layout,
)


def _py_morton(vals, bits):
    key = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            key |= ((v >> i) & 1) << (i * len(vals) + j)
    return key


def test_morton_key_matches_python(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", morton_key([F.col("x"), F.col("y")], bits=6).alias("z")
    ).collect()
    for r in got:
        assert r.z == _py_morton((r.x, r.y), 6)


def test_morton_key_validation():
    with pytest.raises(ValueError):
        morton_key([], 8)
    with pytest.raises(ValueError):
        morton_key([F.col("a"), F.col("b")], 32)  # 64 bits > 63


def test_normalize_to_bits_bounds(spark):
    df = spark.createDataFrame(
        [(0.0,), (50.0,), (100.0,), (None,)], "v double"
    )
    out = df.select(
        normalize_to_bits(F.col("v"), 0.0, 100.0, 4).alias("g")
    ).collect()
    gs = [r.g for r in out]
    assert gs[0] == 0 and gs[2] == 15 and 0 <= gs[1] <= 15 and gs[3] == 0
    # degenerate range maps to 0 instead of dividing by zero
    deg = df.select(
        normalize_to_bits(F.col("v"), 5.0, 5.0, 4).alias("g")
    ).collect()
    assert all(r.g == 0 for r in deg)


def _bbox_cost(pdf):
    # sum over partitions of the bounding-box area of (x, y)
    cost = 0.0
    for _, g in pdf.groupby("pid"):
        cost += (g["x"].max() - g["x"].min() + 1) * (
            g["y"].max() - g["y"].min() + 1
        )
    return cost


def test_zorder_improves_locality(spark):
    import random

    rng = random.Random(5)
    rows = [
        (rng.randrange(1024), rng.randrange(1024)) for _ in range(20000)
    ]
    df = spark.createDataFrame(rows, "x long, y long")
    zed = zorder_layout(df, ["x", "y"], bits=10, num_partitions=16)
    pz = (
        zed.withColumn("pid", F.spark_partition_id()).toPandas()
    )
    base = (
        df.repartition(16)
        .withColumn("pid", F.spark_partition_id())
        .toPandas()
    )
    # z-ordered partitions cover FAR smaller (x, y) rectangles
    assert _bbox_cost(pz) < 0.25 * _bbox_cost(base)


def test_zone_map_and_pruning(spark, tmp_path):
    df = spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 100).alias("bucket")
    )
    path = str(tmp_path / "zoned")
    # layout by id: each of the 8 files covers a compact id range
    zorder_layout(df, ["id"], bits=16, num_partitions=8).write.parquet(path)
    back = spark.read.parquet(path)
    zones = zone_map(back, ["id"])
    zp = zones.toPandas()
    assert len(zp) >= 8 and zp["n_rows"].sum() == 10000
    audit = zone_prune_fraction(zones, "id", 0, 999).collect()[0]
    # a 10% id slice should skip most files after clustering
    assert audit.n_files_skipped >= audit.n_files * 0.7
    assert audit.row_fraction_skipped > 0.7
