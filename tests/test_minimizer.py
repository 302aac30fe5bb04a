"""Minimizer (winnowing) signatures — pure-Python parity + the winnowing
guarantee (shared substring of length >= w + k - 1 => shared minimizer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pylluminator_spark.operators.dedup import (
    kmer_hash_array_expr,
    minimizer_candidate_pairs,
    minimizer_signatures,
    minimizers_of_hashes_expr,
)

P = 1_000_003
K, W = 8, 8


def py_kmer_hashes(text: str, k: int = K) -> list[int]:
    pows = [pow(31, k - 1 - j, P) for j in range(k)]
    return [
        sum(ord(c) * p for c, p in zip(text[i : i + k], pows)) % P
        for i in range(len(text) - k + 1)
    ]


def py_minimizers(text: str, k: int = K, w: int = W) -> set[int]:
    hs = py_kmer_hashes(text, k)
    if not hs:
        return set()
    if len(hs) < w:
        return {min(hs)}
    return {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "the quick brown fox naps under the oak tree",  # shares a long prefix
    "short",  # < k chars -> empty signature
    "exactly8",  # exactly one k-mer
    "tenchars__",  # 3 k-mers < w -> single global min
    "aaaaaaaaaaaaaaaaaaaaaaaa",  # constant hash stream
]


def test_kmer_hashes_match_python(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    rows = df.select(
        "doc_id", kmer_hash_array_expr(F.col("text"), K).alias("hs")
    ).collect()
    for r in rows:
        assert r["hs"] == py_kmer_hashes(TEXTS[r["doc_id"]]), TEXTS[r["doc_id"]]


def test_minimizer_sets_match_python(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], ["doc_id", "text"]
    )
    rows = (
        df.select(
            "doc_id", kmer_hash_array_expr(F.col("text"), K).alias("_hs")
        )
        .select(
            "doc_id",
            minimizers_of_hashes_expr(F.col("_hs"), W).alias("ms"),
        )
        .collect()
    )
    for r in rows:
        assert set(r["ms"]) == py_minimizers(TEXTS[r["doc_id"]])
        assert len(r["ms"]) == len(set(r["ms"]))  # array_distinct held


def test_winnowing_guarantee(spark):
    # Any two docs sharing an exact substring of length >= w + k - 1 = 15
    # must share at least one minimizer (the shared substring contains a
    # full w-window of k-mers; that window's min is emitted by both).
    shared = "zqxjkvbwpfmygcdl"  # 16 > 15
    docs = [
        (0, "prefix one " + shared + " suffix alpha"),
        (1, "another beginning " + shared + " and more text"),
        (2, "completely unrelated content with no overlap at all"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sigs = minimizer_signatures(df, "text", "doc_id", k=K, w=W)
    pairs = minimizer_candidate_pairs(
        sigs, "doc_id", min_shared=1, max_df=None
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in got
    # python cross-check of every reported shared count
    msets = {i: py_minimizers(t) for i, t in docs}
    for r in pairs:
        assert r["n_shared"] == len(msets[r["id_a"]] & msets[r["id_b"]])


def test_max_df_caps_hot_minimizers(spark):
    # 5 docs all containing one hot substring; with max_df=4 the hot
    # minimizers (df=5) are dropped before the join.
    hot = "zqxjkvbwpfmygcdl"
    docs = [(i, f"doc number {i} says " + hot) for i in range(5)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sigs = minimizer_signatures(df, "text", "doc_id", k=K, w=W)
    capped = minimizer_candidate_pairs(
        sigs, "doc_id", min_shared=1, max_df=4
    )
    uncapped = minimizer_candidate_pairs(
        sigs, "doc_id", min_shared=1, max_df=None
    )
    assert uncapped.count() == 10  # all C(5,2) pairs share the hot window
    # the capped join may keep pairs sharing rarer minimizers (the doc-
    # number prefix differs), but every hot-only pair must be gone
    cap_rows = {
        (r["id_a"], r["id_b"]): r["n_shared"] for r in capped.collect()
    }
    unc_rows = {
        (r["id_a"], r["id_b"]): r["n_shared"] for r in uncapped.collect()
    }
    for pair, n in cap_rows.items():
        assert n < unc_rows[pair]  # hot minimizers removed from counts


def test_signature_compression(spark):
    # expected signature size ~ 2n/(w+1) distinct minimizers per doc —
    # assert the explode is a real reduction vs the k-mer stream.
    text = " ".join(f"word{i}" for i in range(60))
    df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    n_min = minimizer_signatures(df, "text", "doc_id", k=K, w=W).count()
    n_kmers = len(text) - K + 1
    assert 0 < n_min < n_kmers / 2
