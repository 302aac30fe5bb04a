"""Snapshot diff vs python dicts; inverted index + phrase search vs a
pure-python index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.diff import diff_summary, snapshot_diff
from pylluminator_spark.operators.index import (
    build_inverted_index,
    phrase_search,
)


def test_snapshot_diff_classification(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, v string, x double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (3, "c", None), (5, "e", 50.0)],
        "k long, v string, x double",
    )
    got = {
        r.k: r.change_type
        for r in snapshot_diff(old, new, ["k"]).collect()
    }
    # NULL == NULL counts as unchanged (eqNullSafe)
    assert got == {
        1: "unchanged", 2: "changed", 3: "unchanged",
        4: "removed", 5: "added",
    }
    s = diff_summary(old, new, ["k"]).collect()[0]
    assert (s.n_added, s.n_removed, s.n_changed, s.n_unchanged) == (
        1, 1, 1, 2,
    )


def _py_index(docs):
    idx = {}
    for doc_id, text in docs:
        for pos, tok in enumerate(text.lower().split()):
            idx.setdefault(tok, {}).setdefault(doc_id, []).append(pos)
    return idx


DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the cat"),
    (3, "cat cat cat"),
]


def test_inverted_index_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = build_inverted_index(df).collect()
    want = _py_index(DOCS)
    got = {
        r.token: {p.doc: list(p.positions) for p in r.postings}
        for r in out
    }
    assert got == want
    by_tok = {r.token: r for r in out}
    assert by_tok["cat"].n_docs == 3
    assert by_tok["cat"].n_occurrences == 5
    # postings are doc-sorted
    for r in out:
        docs_order = [p.doc for p in r.postings]
        assert docs_order == sorted(docs_order)


def test_max_df_drops_stopwords(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {r.token for r in build_inverted_index(df, max_df=0.67).collect()}
    assert "cat" not in out  # df 3/3 > 0.67
    assert "dog" in out


def test_phrase_search(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_inverted_index(df)
    got = {
        r.doc: r.n_matches
        for r in phrase_search(idx, ["sat", "on", "the"]).collect()
    }
    assert got == {1: 1, 2: 1}
    got2 = {
        r.doc: r.n_matches
        for r in phrase_search(idx, ["cat", "cat"]).collect()
    }
    assert got2 == {3: 2}  # overlapping occurrences both count
    assert phrase_search(idx, ["cat", "dog"]).count() == 0
