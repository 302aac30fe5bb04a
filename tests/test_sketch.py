"""Sketches: HLL accuracy + lossless merge, count-min guarantees + merge,
and integer parity of the arithmetic variants with a python reference."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.sketch import (
    _P31,
    cms_build_arith,
    cms_estimate,
    cms_merge,
    hll_estimate,
    hll_merge,
    hll_registers,
    hll_registers_arith,
)


def test_hll_estimate_accuracy(spark):
    n = 20000
    df = spark.range(n).select((F.col("id") * 7 + 3).alias("k"))
    regs = hll_registers(df, "k", p=12)
    est = hll_estimate(regs, p=12).collect()[0].ndv_estimate
    assert abs(est - n) / n < 0.05  # 1.04/sqrt(4096) ~ 1.6% expected


def test_hll_merge_is_lossless(spark):
    a = spark.range(0, 6000).select(F.col("id").alias("k"))
    b = spark.range(4000, 11000).select(F.col("id").alias("k"))
    merged = hll_merge(
        [hll_registers(a, "k", p=10), hll_registers(b, "k", p=10)]
    )
    direct = hll_registers(a.unionByName(b), "k", p=10)
    assert {
        (r.bucket, r.rho) for r in merged.collect()
    } == {(r.bucket, r.rho) for r in direct.collect()}


def test_hll_grouped(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(3000)] + [("b", i % 10) for i in range(500)],
        "g string, k long",
    )
    regs = hll_registers(df, "k", group_cols=["g"], p=11)
    out = {
        r.g: r.ndv_estimate
        for r in hll_estimate(regs, p=11, group_cols=["g"]).collect()
    }
    assert abs(out["a"] - 3000) / 3000 < 0.08
    assert out["b"] == 10  # linear-counting regime is near-exact


def _py_hll_arith(keys, p=8, a=1_103_515_245, b=12_345):
    m, wbits = 1 << p, 31 - p
    regs = {}
    for k in keys:
        h = (a * k + b) % _P31
        bucket, w = h % m, h // m
        rho = wbits - w.bit_length() + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_hll_arith_matches_python_bit_for_bit(spark):
    keys = [random.Random(2).randrange(10**9) for _ in range(4000)]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r.bucket: r.rho for r in hll_registers_arith(df, "k").collect()
    }
    assert got == _py_hll_arith(keys)


def test_cms_overestimates_and_bounds(spark):
    rng = random.Random(9)
    items = [rng.randrange(200) for _ in range(20000)]
    true = {}
    for i in items:
        true[i] = true.get(i, 0) + 1
    df = spark.createDataFrame([(i,) for i in items], "k long")
    counters = cms_build_arith(df, "k", width=512)
    probes = spark.createDataFrame(
        [(i,) for i in sorted(true)], "k long"
    )
    est = {
        r.key: r.freq_estimate
        for r in cms_estimate(counters, probes, "k", width=512).collect()
    }
    for i, t in true.items():
        assert est[i] >= t  # one-sided guarantee
        assert est[i] - t <= len(items) * 3 // 512  # well within e*n/w


def test_cms_merge_equals_direct(spark):
    a = spark.range(0, 5000).select((F.col("id") % 97).alias("k"))
    b = spark.range(0, 3000).select((F.col("id") % 53).alias("k"))
    merged = cms_merge(
        [cms_build_arith(a, "k"), cms_build_arith(b, "k")]
    )
    direct = cms_build_arith(a.unionByName(b), "k")
    assert {
        (r.row, r.col, r.cnt) for r in merged.collect()
    } == {(r.row, r.col, r.cnt) for r in direct.collect()}


def test_cms_unseen_probe_small(spark):
    df = spark.range(1000).select(F.col("id").alias("k"))
    counters = cms_build_arith(df, "k", width=256)
    probes = spark.createDataFrame([(10**12 + 7,)], "k long")
    est = cms_estimate(counters, probes, "k", width=256).collect()[0]
    assert est.freq_estimate <= 1000 * 3 // 256 + 1
