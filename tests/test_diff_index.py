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


def test_apply_changes_upsert_delete_passthrough(spark):
    from pylluminator_spark.operators.diff import apply_changes

    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, v string, x double",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, 5, "U"),   # update existing
            (4, "d", 40.0, 5, "I"),    # insert new key
            (3, None, 0.0, 5, "D"),    # delete existing
            (9, None, 0.0, 5, "D"),    # delete absent key: no-op
        ],
        "k long, v string, x double, version long, op string",
    )
    got = sorted(
        map(tuple, apply_changes(snap, changes, ["k"]).collect())
    )
    assert got == [(1, "a", 10.0), (2, "b2", 21.0), (4, "d", 40.0)]


def test_apply_changes_highest_version_wins_and_delete_breaks_ties(spark):
    from pylluminator_spark.operators.diff import apply_changes

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "v1", 1, "U"),
            (1, "v3", 3, "U"),   # highest version wins
            (1, "v2", 2, "U"),
            (2, "x", 7, "U"),
            (2, None, 7, "D"),   # same version: delete outranks upsert
        ],
        "k long, v string, version long, op string",
    )
    got = sorted(map(tuple, apply_changes(snap, changes, ["k"]).collect()))
    assert got == [(1, "v3")]
    # replay idempotence: applying the same batch to the result again
    # yields the same table
    out = apply_changes(snap, changes, ["k"])
    replay = sorted(
        map(tuple, apply_changes(out, changes, ["k"]).collect())
    )
    assert replay == got
