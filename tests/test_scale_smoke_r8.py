"""Opt-in scale smokes for the round-8 machinery (SPARK_GRAFT_SCALE=1).

- language ID at corpus volume: fit + classify 200k synthetic docs in
  two character-disjoint languages — the gram stream must parallelize
  (the rebalance fix), the model stays dimension-sized, and the
  classifier separates the languages perfectly at scale.
- expression-build regression guards: the PQ encode expression and the
  ordered-op bucket tree are generated as SQL strings; building them
  must stay driver-cheap regardless of data volume (the r8 fix replaced
  ~4 s of py4j Column construction).
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE"),
    reason="set SPARK_GRAFT_SCALE=1 to run the r8 scale smokes",
)

N_DOCS = 200_000


def test_langid_at_corpus_volume(spark):
    from pylluminator_spark.operators.langid import fit_langid, language_id

    # two synthetic languages with disjoint character inventories,
    # deterministic hash-mixed "words"
    def words(alphabet: str):
        return F.concat_ws(
            " ",
            *[
                F.translate(
                    F.conv(F.xxhash64(F.col("id"), F.lit(i)), 10, 4),
                    "-0123",
                    alphabet,
                )
                for i in range(6)
            ],
        )

    docs = spark.range(0, N_DOCS, 1, 32).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "alpha").otherwise("zeta").alias("lang"),
        F.when(F.col("id") % 2 == 0, words("abcde"))
        .otherwise(words("vwxyz"))
        .alias("text"),
    )
    t0 = time.perf_counter()
    weights, langs = fit_langid(docs, n=3, buckets=1024, alpha=0.5)
    assert weights.count() <= 1024 * 2
    assert langs.count() == 2
    pred = language_id(docs, weights, langs, n=3, buckets=1024)
    wrong = pred.join(docs.select("doc_id", "lang"), "doc_id").filter(
        F.col("pred_lang") != F.col("lang")
    )
    n_pred = pred.count()
    n_wrong = wrong.count()
    wall = time.perf_counter() - t0
    assert n_pred == N_DOCS
    # disjoint alphabets => perfect separation
    assert n_wrong == 0
    assert wall < 180, wall


def test_pq_encode_expression_build_stays_driver_cheap(spark):
    """The SQL-generated encode expression must not regress to per-literal
    py4j construction: building the plan for a 1M-row frame is
    size-independent and must take well under a second of driver time."""
    from pylluminator_spark.operators.quantize import pq_encode

    dim, m, k = 64, 2, 16
    emb = spark.range(0, 1_000_000, 1, 32).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: (
                F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 500.0 - 1.0
            ),
        ).alias("embedding"),
    )
    cents = emb.filter(F.col("vec_id") < k)
    books = None
    for s in range(m):
        b = cents.select(
            F.lit(s).alias("sub_id"),
            F.col("vec_id").alias("cid"),
            F.slice("embedding", s * (dim // m) + 1, dim // m)
            .cast("array<double>")
            .alias("cvec"),
        )
        books = b if books is None else books.union(b)
    t0 = time.perf_counter()
    codes = pq_encode(emb, books, method="expr")
    build = time.perf_counter() - t0
    assert build < 1.5, build  # was ~3.8 s with Column-object construction
    assert codes.limit(5).count() == 5


def test_bucket_tree_sql_build_stays_driver_cheap(spark):
    from pylluminator_spark.operators.ordered import _bucketized

    df = spark.range(0, 1_000_000, 1, 32).select(
        F.col("id"), (F.col("id") % 997).cast("double").alias("v")
    )
    cuts = [(float(i), -1) for i in range(0, 997, 16)][1:]  # 62 cuts
    t0 = time.perf_counter()
    d = _bucketized(df, ["v", "id"], None, boundaries=cuts)
    build = time.perf_counter() - t0
    assert build < 1.0, build
    # order-consistency spot check: bucket ids non-decreasing in v
    agg = d.groupBy("_ord_pid").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    ).orderBy("_ord_pid").collect()
    for a, b in zip(agg, agg[1:]):
        assert a["hi"] <= b["lo"] or abs(a["hi"] - b["lo"]) < 16


def test_phash_pipeline_at_volume(spark):
    """50k synthetic images through pHash + banded pair generation: the
    hash pass is one Arrow sweep (16 bytes/image downstream), pair
    generation never builds the 1.25B-pair product, and the 5k planted
    exact duplicates all surface at hamming 0."""
    import numpy as np
    import pandas as pd

    from pylluminator_spark.operators.multimodal import (
        encode_bmp,
        image_phash,
        phash_candidate_pairs,
    )

    n = 50_000

    def pack(batches):
        w, h = 24, 20
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                mid = int(mid)
                src = mid - n if mid >= n else mid  # ids >= n duplicate id-n
                px = ((x * ((src % 251) + 2)) ^ (y * ((src % 241) + 3))) + src
                arr = (px % 256).astype(np.uint8)[:, :, None]
                rows.append((mid, "image", encode_bmp(np.repeat(arr, 3, 2))))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content"])

    media = (
        spark.range(0, n + 5_000, 1, 32)
        .mapInPandas(pack, schema="media_id long, kind string, content binary")
    )
    t0 = time.perf_counter()
    hashes = image_phash(media).localCheckpoint(eager=True)
    n_hashes = hashes.count()
    pairs = phash_candidate_pairs(hashes, max_hamming=3, bands=8)
    planted = pairs.filter(
        (F.col("id_b") == F.col("id_a") + n) & (F.col("hamming") == 0)
    ).count()
    wall = time.perf_counter() - t0
    assert n_hashes == n + 5_000
    assert planted == 5_000
    assert wall < 300, wall
