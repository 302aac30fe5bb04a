"""Fuzzy matching: deletion-neighborhood blocking is lossless vs a
brute-force python Levenshtein over random strings, for d = 1 and d = 2."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.fuzzy import (
    deletion_variants,
    fuzzy_join,
    fuzzy_self_pairs,
)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _vocab(n, seed, alphabet="abc", lmin=2, lmax=6):
    # tiny alphabet => dense edit-distance neighborhoods
    rng = random.Random(seed)
    return sorted(
        {
            "".join(
                rng.choice(alphabet) for _ in range(rng.randint(lmin, lmax))
            )
            for _ in range(n)
        }
    )


def _brute_pairs(vocab, d):
    return {
        (a, b, _lev(a, b))
        for i, a in enumerate(vocab)
        for b in vocab[i + 1:]
        if _lev(a, b) <= d
    }


@pytest.mark.parametrize("d", [1, 2])
def test_self_pairs_match_bruteforce(spark, d):
    vocab = _vocab(80, seed=7 + d)
    df = spark.createDataFrame([(v,) for v in vocab], "s string")
    got = {
        (r.left_val, r.right_val, r.dist)
        for r in fuzzy_self_pairs(df, "s", max_dist=d).collect()
    }
    want = _brute_pairs(vocab, d)
    assert got == want and len(want) > 10  # non-degenerate fixture


def test_deletion_variants_edge_cases(spark):
    df = spark.createDataFrame([("", ), ("a",), ("ab",)], "s string")
    rows = df.select(
        "s", deletion_variants(F.col("s"), 1).alias("v")
    ).collect()
    got = {r.s: sorted(r.v) for r in rows}
    assert got == {"": [""], "a": ["", "a"], "ab": ["a", "ab", "b"]}


def test_fuzzy_join_two_tables(spark):
    left = spark.createDataFrame(
        [(1, "apple"), (2, "grape"), (3, "zzzzz")], "lid int, name string"
    )
    right = spark.createDataFrame(
        [(10, "aple"), (11, "grapes"), (12, "apple"), (13, "melon")],
        "rid int, rname string",
    )
    got = {
        (r.lid, r.rid, r.dist)
        for r in fuzzy_join(
            left, right, "name", "rname", max_dist=1
        ).collect()
    }
    assert got == {(1, 10, 1), (1, 12, 0), (2, 11, 1)}


def test_duplicate_values_joined_per_row(spark):
    # join semantics: every row pairs with every matching partner
    left = spark.createDataFrame([(1, "aa"), (2, "aa")], "lid int, s string")
    right = spark.createDataFrame([(9, "ab")], "rid int, t string")
    out = fuzzy_join(left, right, "s", "t", max_dist=1).collect()
    assert {(r.lid, r.rid) for r in out} == {(1, 9), (2, 9)}
