"""DSIR (Xie et al. 2023) importance-resampling selection: weights vs a
pure-Python reference with the same hash, selection determinism, and the
arith/engine path contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.dsir import (
    _POLY_MULT,
    _POLY_P,
    bucket_log_ratio,
    dsir_gumbel_topk,
    dsir_log_weights,
    dsir_topk,
    hashed_gram_counts,
    poly_bucket_expr,
)

RAW = [
    ("r1", "the cat sat on the mat"),
    ("r2", "stock market prices rose sharply today"),
    ("r3", "the dog ran in the park"),
    ("r4", "quarterly earnings beat market expectations"),
    ("r5", "a cat and a dog played"),
    ("r6", "interest rates and market volatility"),
    ("r7", ""),  # zero tokens -> absent from weights
]
TARGET = [
    ("t1", "market prices and interest rates"),
    ("t2", "earnings market stock prices"),
]

BUCKETS = 64
ALPHA = 1.0


def _poly_bucket(gram: str, buckets: int = BUCKETS) -> int:
    h = 0
    for ch in gram:
        h = (h * _POLY_MULT + ord(ch)) % _POLY_P
    return h % buckets


def _grams_py(text: str) -> list[str]:
    toks = [t for t in text.lower().split() if t]
    return toks + [
        f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
    ]


def _ref_weights() -> dict[str, tuple[int, float]]:
    """Dict reference: doc -> (n_grams, log_weight) using the same
    polynomial hash, add-alpha smoothing, and bucket-sorted fold."""
    raw_counts: dict[str, dict[int, int]] = {}
    for doc, text in RAW:
        c: dict[int, int] = {}
        for g in _grams_py(text):
            b = _poly_bucket(g)
            c[b] = c.get(b, 0) + 1
        if c:
            raw_counts[doc] = c
    tgt_bucket: dict[int, int] = {}
    for _, text in TARGET:
        for g in _grams_py(text):
            b = _poly_bucket(g)
            tgt_bucket[b] = tgt_bucket.get(b, 0) + 1
    raw_bucket: dict[int, int] = {}
    for c in raw_counts.values():
        for b, n in c.items():
            raw_bucket[b] = raw_bucket.get(b, 0) + n
    tt = sum(tgt_bucket.values())
    tr = sum(raw_bucket.values())
    out = {}
    for doc, c in raw_counts.items():
        s = 0.0
        for b in sorted(c):
            lp = math.log((tgt_bucket.get(b, 0) + ALPHA) / (tt + ALPHA * BUCKETS))
            lq = math.log((raw_bucket[b] + ALPHA) / (tr + ALPHA * BUCKETS))
            s += c[b] * (lp - lq)
        out[doc] = (sum(c.values()), s)
    return out


@pytest.fixture(scope="module")
def corpora(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    return raw, tgt


def test_poly_bucket_matches_python(spark):
    grams = ["the", "cat", "market prices", "a", "volatility"]
    df = spark.createDataFrame([(g,) for g in grams], ["gram"])
    got = {
        r["gram"]: r["b"]
        for r in df.select(
            "gram", poly_bucket_expr(F.col("gram"), BUCKETS).alias("b")
        ).collect()
    }
    assert got == {g: _poly_bucket(g) for g in grams}


def test_hashed_gram_counts_totals(corpora):
    raw, _ = corpora
    feat = hashed_gram_counts(
        raw, buckets=BUCKETS, arith=True
    )
    per_doc = {
        r["doc_id"]: r["n"]
        for r in feat.groupBy("doc_id").agg(F.sum("cnt").alias("n")).collect()
    }
    expected = {
        doc: len(_grams_py(text)) for doc, text in RAW if text.strip()
    }
    assert per_doc == expected


def test_dsir_weights_match_reference(corpora):
    raw, tgt = corpora
    got = {
        r["doc_id"]: (r["n_grams"], r["log_weight"])
        for r in dsir_log_weights(
            raw, tgt, buckets=BUCKETS, alpha=ALPHA, arith=True
        ).collect()
    }
    ref = _ref_weights()
    assert set(got) == set(ref)
    for doc, (n, w) in ref.items():
        assert got[doc][0] == n
        assert got[doc][1] == pytest.approx(w, abs=1e-12)


def test_target_like_docs_rank_highest(corpora):
    raw, tgt = corpora
    w = dsir_log_weights(raw, tgt, buckets=BUCKETS, arith=True)
    top = dsir_topk(w, 2).select("doc_id").collect()
    # finance-flavored raw docs should outrank pet stories
    assert {r["doc_id"] for r in top} <= {"r2", "r4", "r6"}


def test_engine_path_same_support(corpora):
    """xxhash64 path: same document set and gram totals as the arith
    path (hash choice moves buckets, not gram counts)."""
    raw, tgt = corpora
    a = dsir_log_weights(raw, tgt, buckets=BUCKETS, arith=True)
    e = dsir_log_weights(raw, tgt, buckets=BUCKETS, arith=False)
    ra = {r["doc_id"]: r["n_grams"] for r in a.collect()}
    re_ = {r["doc_id"]: r["n_grams"] for r in e.collect()}
    assert ra == re_
    for r in e.collect():
        assert math.isfinite(r["log_weight"])


def test_gumbel_topk_deterministic(corpora):
    raw, tgt = corpora
    w = dsir_log_weights(raw, tgt, buckets=BUCKETS, arith=True)
    s1 = [r["doc_id"] for r in dsir_gumbel_topk(w, 3, salt=7).collect()]
    s2 = [r["doc_id"] for r in dsir_gumbel_topk(w, 3, salt=7).collect()]
    assert s1 == s2 and len(s1) == 3
    # selection is weight-biased but noisy: a different salt may differ,
    # and the gumbel key column must not leak into the output schema
    cols = dsir_gumbel_topk(w, 3, salt=7).columns
    assert cols == ["doc_id", "n_grams", "log_weight"]


def test_bucket_log_ratio_dimension_sized(corpora):
    raw, tgt = corpora
    rf = hashed_gram_counts(raw, buckets=BUCKETS, arith=True)
    tf = hashed_gram_counts(tgt, buckets=BUCKETS, arith=True)
    ratio = bucket_log_ratio(tf, rf, buckets=BUCKETS)
    assert ratio.count() <= BUCKETS
    # a bucket present in target and raw has ratio > a target-absent one
    # with the same raw mass (monotone in target count)
    rows = ratio.collect()
    assert all(math.isfinite(r["log_ratio"]) for r in rows)
