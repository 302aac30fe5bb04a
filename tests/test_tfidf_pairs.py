"""tfidf_cosine_pairs vs a brute-force numpy TF-IDF cosine (same
convention: tf counts, idf = ln((N+1)/(df+1)) + 1, L2 normalization) —
the all-pairs parity that certifies the inverted-index self-join loses
no pair and the sorted-order folds compute the same cosine."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pytest

from pylluminator_spark.operators.dedup import tfidf_cosine_pairs

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox leaps over the lazy dog"),
    (3, "a completely different document about spark engines"),
    (4, "spark engines process completely different documents"),
    (5, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (6, "lorem ipsum dolor sit amet"),
    (7, "the lazy dog sleeps while the quick fox jumps"),
    (8, "dolor sit amet lorem ipsum"),  # permutation of 6
]


def _np_tfidf_pairs(corpus, threshold, max_df=None):
    docs = {i: Counter(t.lower().split()) for i, t in corpus}
    n = len(docs)
    df = Counter()
    for c in docs.values():
        df.update(c.keys())
    vocab = sorted(
        t for t, d in df.items() if max_df is None or d <= max_df
    )
    idf = {t: math.log((n + 1) / (df[t] + 1)) + 1.0 for t in vocab}
    vecs = {}
    for i, c in docs.items():
        v = np.array([c.get(t, 0) * idf[t] for t in vocab])
        nrm = np.linalg.norm(v)
        vecs[i] = v / nrm if nrm > 0 else v
    out = {}
    ids = sorted(vecs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            cos = float(vecs[ids[x]] @ vecs[ids[y]])
            if cos >= threshold:
                out[(ids[x], ids[y])] = cos
    return out


@pytest.mark.parametrize("threshold,max_df", [(0.3, None), (0.5, 6)])
def test_tfidf_cosine_pairs_matches_numpy(spark, threshold, max_df):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in tfidf_cosine_pairs(
            docs, threshold, max_df=max_df
        ).collect()
    }
    want = _np_tfidf_pairs(CORPUS, threshold, max_df)
    assert set(got) == set(want)
    for pair, cos in want.items():
        assert got[pair] == pytest.approx(cos, rel=1e-9)


def test_tfidf_exact_duplicates_hit_cosine_one(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r
        for r in tfidf_cosine_pairs(docs, 0.999999).collect()
    }
    # doc 5 is a verbatim copy of doc 1; doc 8 permutes doc 6 (bag-of-
    # words cosine is order-blind)
    assert {(1, 5), (6, 8)} <= set(got)
    for r in got.values():
        assert r.cosine == pytest.approx(1.0, abs=1e-12)


def test_tfidf_max_df_prunes_stopword_postings(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    # 'the' appears in 4 docs; with max_df=3 it leaves the vocabulary,
    # so pairs that only shared stop-words drop out entirely
    full = tfidf_cosine_pairs(docs, 0.01)
    pruned = tfidf_cosine_pairs(docs, 0.01, max_df=3)
    full_pairs = {(r.id_a, r.id_b) for r in full.collect()}
    pruned_pairs = {(r.id_a, r.id_b) for r in pruned.collect()}
    assert pruned_pairs < full_pairs
    assert pruned_pairs == set(_np_tfidf_pairs(CORPUS, 0.01, max_df=3))
