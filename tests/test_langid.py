"""Char-n-gram language ID (CCNet LID stage): NB scores vs a pure-Python
reference with the same hash, prediction sanity on separable synthetic
languages, short-doc edges, and the arith/engine path contract."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.dsir import _POLY_MULT, _POLY_P
from pylluminator_spark.operators.langid import (
    char_gram_counts,
    fit_langid,
    langid_predict,
    langid_scores,
    language_id,
)

# two synthetic "languages" with disjoint character inventories plus one
# that mixes them, and degenerate docs
TRAIN = [
    (1, "aaabbb ababab aabbab", "alpha"),
    (2, "babab abba baab abab", "alpha"),
    (3, "xxyyzz zyzyzy xyzzyx", "zeta"),
    (4, "zyx xyzzy zzyyxx yzx", "zeta"),
]
TEST = [
    (10, "abab baba abba", "alpha"),
    (11, "xyz zyx zzyy", "zeta"),
]
N, BUCKETS, ALPHA = 3, 64, 0.5


def _poly_bucket(gram: str) -> int:
    h = 0
    for ch in gram:
        h = (h * _POLY_MULT + ord(ch)) % _POLY_P
    return h % BUCKETS


def _grams_py(text: str) -> list[str]:
    t = text.lower()
    return [t[i : i + N] for i in range(len(t) - N + 1)]


def _ref_model():
    lb: dict[str, dict[int, int]] = {}
    nd: dict[str, int] = {}
    for _, text, lang in TRAIN:
        nd[lang] = nd.get(lang, 0) + 1
        c = lb.setdefault(lang, {})
        for g in _grams_py(text):
            b = _poly_bucket(g)
            c[b] = c.get(b, 0) + 1
    tot = {l: sum(c.values()) for l, c in lb.items()}
    ntot = sum(nd.values())
    w = {
        (b, l): math.log(c + ALPHA) - math.log(tot[l] + ALPHA * BUCKETS)
        for l, cs in lb.items()
        for b, c in cs.items()
    }
    langs = {
        l: (
            math.log(nd[l]) - math.log(ntot),
            math.log(ALPHA) - math.log(tot[l] + ALPHA * BUCKETS),
        )
        for l in lb
    }
    return w, langs


def _ref_scores(text: str):
    w, langs = _ref_model()
    c: dict[int, int] = {}
    for g in _grams_py(text):
        b = _poly_bucket(g)
        c[b] = c.get(b, 0) + 1
    n = sum(c.values())
    out = {}
    for lang, (lp, wd) in langs.items():
        s = 0.0
        for b in sorted(c):
            s += c[b] * w.get((b, lang), wd)
        out[lang] = lp + s / n
    return out


@pytest.fixture(scope="module")
def frames(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text", "lang"])
    test = spark.createDataFrame(TEST, ["doc_id", "text", "lang"])
    return train, test


def test_scores_match_python_reference(frames):
    train, test = frames
    weights, langs = fit_langid(
        train, n=N, buckets=BUCKETS, alpha=ALPHA, arith=True
    )
    counts = char_gram_counts(test, n=N, buckets=BUCKETS, arith=True)
    got = {
        (r["doc_id"], r["lang"]): r["score"]
        for r in langid_scores(
            counts, weights, langs, deterministic=True
        ).collect()
    }
    for doc_id, text, _ in TEST:
        ref = _ref_scores(text)
        for lang, s in ref.items():
            assert got[(doc_id, lang)] == pytest.approx(s, abs=1e-12), (
                doc_id, lang,
            )


def test_predicts_separable_languages(frames):
    train, test = frames
    weights, langs = fit_langid(
        train, n=N, buckets=BUCKETS, alpha=ALPHA, arith=True
    )
    pred = {
        r["doc_id"]: r["pred_lang"]
        for r in language_id(
            test, weights, langs, n=N, buckets=BUCKETS, arith=True
        ).collect()
    }
    assert pred == {10: "alpha", 11: "zeta"}


def test_short_docs_produce_no_grams(spark, frames):
    train, _ = frames
    weights, langs = fit_langid(
        train, n=N, buckets=BUCKETS, alpha=ALPHA, arith=True
    )
    short = spark.createDataFrame(
        [(20, "ab"), (21, ""), (22, "xyz")], ["doc_id", "text"]
    )
    counts = char_gram_counts(short, n=N, buckets=BUCKETS, arith=True)
    assert {
        r["doc_id"] for r in counts.select("doc_id").distinct().collect()
    } == {22}
    # docs with zero grams simply have no prediction row (no 0/0)
    out = language_id(short, weights, langs, n=N, buckets=BUCKETS, arith=True)
    assert {r["doc_id"] for r in out.collect()} == {22}


def test_engine_path_same_support(frames):
    """xxhash64 path: same documents, same gram totals, same top
    prediction on clearly separable inputs as the arith path (bucket
    ids differ — the hash differs — but the decision must not)."""
    train, test = frames
    for arith in (True, False):
        weights, langs = fit_langid(
            train, n=N, buckets=BUCKETS, alpha=ALPHA, arith=arith
        )
        pred = {
            r["doc_id"]: r["pred_lang"]
            for r in language_id(
                test, weights, langs, n=N, buckets=BUCKETS, arith=arith
            ).collect()
        }
        assert pred == {10: "alpha", 11: "zeta"}, arith


def test_deterministic_and_plain_folds_agree_numerically(frames):
    train, test = frames
    weights, langs = fit_langid(
        train, n=N, buckets=BUCKETS, alpha=ALPHA, arith=True
    )
    counts = char_gram_counts(test, n=N, buckets=BUCKETS, arith=True)
    det = {
        (r["doc_id"], r["lang"]): r["score"]
        for r in langid_scores(
            counts, weights, langs, deterministic=True
        ).collect()
    }
    plain = {
        (r["doc_id"], r["lang"]): r["score"]
        for r in langid_scores(
            counts, weights, langs, deterministic=False
        ).collect()
    }
    assert set(det) == set(plain)
    for k in det:
        assert plain[k] == pytest.approx(det[k], rel=1e-12)


def test_model_is_dimension_sized(frames):
    train, _ = frames
    weights, langs = fit_langid(
        train, n=N, buckets=BUCKETS, alpha=ALPHA, arith=True
    )
    assert weights.count() <= BUCKETS * 2
    assert langs.count() == 2
    assert set(langs.columns) == {"lang", "log_prior", "w_default"}


def test_gramless_language_keeps_prior(spark):
    """ADVICE r8: a training language whose docs are all shorter than n
    produces no grams; the old inner join silently dropped it from the
    model (no prior, never predictable) while its docs still inflated
    ntot. The left join keeps it with the uniform default weight."""
    train = spark.createDataFrame(
        TRAIN + [(5, "ab", "tiny"), (6, "x", "tiny")],
        ["doc_id", "text", "lang"],
    )
    weights, langs = fit_langid(
        train, n=N, buckets=BUCKETS, alpha=ALPHA, arith=True
    )
    rows = {r["lang"]: r for r in langs.collect()}
    assert set(rows) == {"alpha", "zeta", "tiny"}
    # prior counts its 2 docs out of 6 total
    assert rows["tiny"]["log_prior"] == pytest.approx(
        math.log(2) - math.log(6)
    )
    # tot = 0 -> the uniform default ln(alpha) - ln(alpha * buckets)
    assert rows["tiny"]["w_default"] == pytest.approx(
        math.log(ALPHA) - math.log(ALPHA * BUCKETS)
    )
    # gram-ful languages still predict exactly as before
    test = spark.createDataFrame(TEST, ["doc_id", "text", "lang"])
    pred = {
        r["doc_id"]: r["lang"]
        for r in language_id(
            test, weights, langs, n=N, buckets=BUCKETS, arith=True
        ).select("doc_id", F.col("pred_lang").alias("lang")).collect()
    }
    assert pred == {10: "alpha", 11: "zeta"}


def test_fused_fit_classify_matches_unfused(frames):
    # fit_classify_langid (one gram pass) must produce the exact score
    # table of fit_langid + char_gram_counts + langid_scores
    from pylluminator_spark.operators.langid import fit_classify_langid

    train, _test = frames
    for arith in (True, False):
        weights, langs = fit_langid(
            train, n=N, buckets=BUCKETS, alpha=ALPHA, arith=arith
        )
        counts = char_gram_counts(
            train, n=N, buckets=BUCKETS, arith=arith
        )
        unfused = {
            (r["doc_id"], r["lang"]): r["score"]
            for r in langid_scores(
                counts, weights, langs, deterministic=True
            ).collect()
        }
        fused = {
            (r["doc_id"], r["lang"]): r["score"]
            for r in fit_classify_langid(
                train, n=N, buckets=BUCKETS, alpha=ALPHA,
                arith=arith, deterministic=True,
            ).collect()
        }
        assert fused == unfused
