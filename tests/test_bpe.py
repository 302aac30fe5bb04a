"""BPE training on the classic Sennrich corpus, encode behavior, and the
distributed pair-count stage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.bpe import (
    bpe_encode,
    bpe_pair_counts,
    bpe_train,
    char_pairs_expr,
    encode_word,
    word_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sennrich(spark):
    # the worked example from Sennrich et al. 2016: low x5, lower x2,
    # newest x6, widest x3
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    return spark.createDataFrame([(1, text)], ["doc_id", "text"])


def test_word_counts(sennrich):
    got = {r["word"]: r["cnt"] for r in word_counts(sennrich).collect()}
    assert got == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_matches_hand_computed_merges(sennrich):
    merges = bpe_train(sennrich, 5, min_count=1)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", "</w>"),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_encode_word_greedy_rank_order(sennrich):
    merges = bpe_train(sennrich, 5, min_count=1)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est</w>"]
    assert encode_word("low", ranks) == ["low", "</w>"]
    assert encode_word("xyz", ranks) == ["x", "y", "z", "</w>"]


def test_encode_dataframe(spark, sennrich):
    merges = bpe_train(sennrich, 5, min_count=1)
    df = spark.createDataFrame(
        [(1, "lowest low"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_bpe_tokens"])
        for r in bpe_encode(df, merges).collect()
    }
    assert got[1] == (["low", "est</w>", "low", "</w>"], 4)
    assert got[2] == ([], 0)
    assert got[3] == ([], 0)


def test_char_pairs_expr(spark):
    df = spark.createDataFrame([("abc",), ("x",), ("",)], ["w"])
    got = [
        list(r["p"])
        for r in df.select(char_pairs_expr(F.col("w")).alias("p")).collect()
    ]
    assert got == [["a b", "b c"], [], []]


def test_pair_counts_match_driver_side(sennrich):
    got = {
        r["pair"]: r["cnt"] for r in bpe_pair_counts(sennrich).collect()
    }
    # hand-computed from the type table (no </w> marker at this stage)
    assert got[("e s")] == 9
    assert got[("s t")] == 9
    assert got[("l o")] == 7
    assert got[("w e")] == 8
    assert got[("n e")] == 6


def test_pair_counts_min_count(sennrich):
    got = bpe_pair_counts(sennrich, min_count=7)
    assert all(r["cnt"] >= 7 for r in got.collect())


def test_train_on_real_docs_compresses(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    merges = bpe_train(docs, 50, min_count=1)
    assert len(merges) == 50
    enc = bpe_encode(docs, merges)
    joined = enc.join(docs, "doc_id").select(
        "n_bpe_tokens",
        F.length(F.regexp_replace("text", r"\s+", "")).alias("n_chars"),
    )
    row = joined.agg(
        F.sum("n_bpe_tokens").alias("t"), F.sum("n_chars").alias("c")
    ).collect()[0]
    # 50 merges on a tiny vocab corpus should compress well below
    # character-level (c + words would be the no-merge token count)
    assert row["t"] < row["c"]


def test_train_determinism(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    assert bpe_train(docs, 20) == bpe_train(docs, 20)
