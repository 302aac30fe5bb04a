"""Sketches: HLL accuracy + lossless merge, count-min guarantees + merge,
and integer parity of the arithmetic variants with a python reference."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.sketch import (
    _P31,
    bloom_build_arith,
    bloom_probe,
    bloom_prune_join,
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


def test_bloom_no_false_negatives_and_fp_bounded(spark):
    from pylluminator_spark.operators.sketch import (
        bloom_build_arith,
        bloom_probe,
    )

    rng = random.Random(7)
    inserted = sorted(rng.sample(range(1, 1_000_000), 300))
    absent = sorted(
        rng.sample([x for x in range(1_000_001, 2_000_000)], 2000)
    )
    df = spark.createDataFrame([(k,) for k in inserted], ["k"])
    regs = bloom_build_arith(df, "k", m_bits=4096)
    probes = spark.createDataFrame(
        [(k,) for k in inserted + absent], ["k"]
    )
    got = {
        r.key: r.maybe_member
        for r in bloom_probe(regs, probes, "k", m_bits=4096).collect()
    }
    # Bloom's contract: NO false negatives
    assert all(got[k] for k in inserted)
    # false positives exist but are rare: k=4, n=300, m=4096 ->
    # (1 - e^(-4*300/4096))^4 ~= 0.4% expected; allow generous slack
    fp = sum(1 for k in absent if got[k])
    assert fp / len(absent) < 0.05


def test_bloom_merge_equals_direct_build(spark):
    from pylluminator_spark.operators.sketch import (
        bloom_build_arith,
        bloom_merge,
    )

    a = spark.createDataFrame([(k,) for k in range(100)], ["k"])
    b = spark.createDataFrame([(k,) for k in range(50, 200)], ["k"])
    merged = sorted(
        (r.word, r.register)
        for r in bloom_merge(
            [bloom_build_arith(a, "k"), bloom_build_arith(b, "k")]
        ).collect()
    )
    direct = sorted(
        (r.word, r.register)
        for r in bloom_build_arith(a.unionByName(b), "k").collect()
    )
    assert merged == direct


def test_bloom_registers_match_python_bit_for_bit(spark):
    from pylluminator_spark.operators.sketch import (
        _BLOOM_SEEDS,
        bloom_build_arith,
    )

    keys = [3, 17, 999_983, 123_456_789, 2_000_000_011]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = sorted(
        (r.word, r.register)
        for r in bloom_build_arith(df, "k", m_bits=1024).collect()
    )
    words = {}
    for k in keys:
        for a, b in _BLOOM_SEEDS:
            pos = ((a * k + b) % _P31) % 1024
            words[pos // 32] = words.get(pos // 32, 0) | (1 << (pos % 32))
    assert got == sorted(words.items())


def test_bloom_prune_join_equals_plain_inner_join(spark):
    random.seed(7)
    fact = spark.createDataFrame(
        [(random.randrange(0, 500), i) for i in range(2000)],
        "k long, payload long",
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 500, 7)], "k long, name string"
    )
    got = bloom_prune_join(fact, dim, "k")
    want = fact.join(dim, "k", "inner")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_bloom_prune_join_negative_keys(spark):
    # ADVICE r5: Spark's % keeps the dividend sign, which used to index
    # the build words from the end and feed element_at an index <= 0.
    # pmod on both paths makes negative keys first-class.
    fact = spark.createDataFrame(
        [(-k, k) for k in range(1, 200)] + [(k, k) for k in range(1, 200)],
        "k long, payload long",
    )
    dim = spark.createDataFrame(
        [(-15, "a"), (-3, "b"), (8, "c"), (-199, "d"), (500, "e")],
        "k long, name string",
    )
    got = bloom_prune_join(fact, dim, "k")
    want = fact.join(dim, "k", "inner")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # and the standalone build/probe pair agrees on negative keys too:
    # every dim key must be maybe_member (no false negatives)
    regs = bloom_build_arith(dim, "k")
    probed = {
        r.key: r.maybe_member for r in bloom_probe(regs, dim, "k").collect()
    }
    assert all(probed[k] for k in (-15, -3, 8, -199, 500))
