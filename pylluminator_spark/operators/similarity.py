"""Similarity search over embedding columns (``array<float>``).

Beyond-reference surface (driver north star):

- ``cosine_expr`` / ``dot_expr`` — JVM-side higher-order-function vector math
  (no UDF, no MLlib Vector conversion).
- ``brute_force_topk`` — exact cosine top-k per query via a (broadcast)
  cross join + per-query window. The correctness baseline.
- ``lsh_topk`` — random-hyperplane LSH bucketing: sign-bit signature,
  bucket join on the signature prefix, re-rank within buckets. The scale
  path: shuffle is proportional to bucket collisions, not |corpus|x|queries|.
- ``embedding_near_dups`` — cosine near-duplicate pairs above a threshold
  (the embedding flavor of dedup).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom > 0, dot_expr(a, b) / denom).otherwise(F.lit(0.0))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors for each query vector.

    Queries are broadcast (the expected shape: few queries, huge corpus); the
    corpus streams through codegen computing the similarity, then a per-query
    top-k window. Deterministic tie-break on corpus id.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id), F.col(vec_col).alias("_qvec")
        )
    )
    c = corpus.select(F.col(corpus_id), F.col(vec_col).alias("_cvec"))
    sim = (
        cosine_expr(F.col("_qvec"), F.col("_cvec"))
        if metric == "cosine"
        else dot_expr(F.col("_qvec"), F.col("_cvec"))
    )
    scored = q.crossJoin(c).withColumn("similarity", sim)
    w = Window.partitionBy(query_id).orderBy(
        F.col("similarity").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id, corpus_id, "similarity", F.col("_rn").alias("rank"))
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)
    ]


def signature_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: integer whose bit i = sign(dot(v, r_i))."""
    sig: Column = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(x) for x in plane])
        bit = F.when(dot_expr(vec, lit_plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        sig = sig + F.shiftleft(bit.cast("long"), i)
    return sig


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_bits: int = 12,
    n_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent random-hyperplane hash
    tables; candidates = corpus vectors sharing a bucket with the query in
    any table; exact cosine re-rank among candidates.

    Recall improves with n_tables, cost with bucket size (~|corpus| / 2^n_bits
    per table). All bucketing is equi-join shuffle — no cross join.
    """
    frames = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_bits, seed + 1000 * t)
        qs = queries.select(
            F.col(query_id),
            F.col(vec_col).alias("_qvec"),
            signature_expr(F.col(vec_col), planes).alias("_sig"),
        ).withColumn("_table", F.lit(t))
        cs = corpus.select(
            F.col(corpus_id),
            F.col(vec_col).alias("_cvec"),
            signature_expr(F.col(vec_col), planes).alias("_sig"),
        ).withColumn("_table", F.lit(t))
        frames.append(
            qs.join(cs, ["_table", "_sig"]).select(
                query_id, corpus_id, "_qvec", "_cvec"
            )
        )
    candidates = frames[0]
    for fr in frames[1:]:
        candidates = candidates.unionByName(fr)
    candidates = candidates.dropDuplicates([query_id, corpus_id])
    scored = candidates.withColumn(
        "similarity", cosine_expr(F.col("_qvec"), F.col("_cvec"))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("similarity").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id, corpus_id, "similarity", F.col("_rn").alias("rank"))
    )


def embedding_near_dups(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    n_bits: int = 10,
    n_tables: int = 4,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold), (id_a < id_b).

    ``exact=True`` does the full O(n^2) self-join (small corpora / testing);
    default uses LSH bucketing so only same-bucket pairs are scored.
    """
    v = vectors.select(F.col(id_col), F.col(vec_col))
    if exact:
        a = v.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
        b = v.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        frames = []
        for t in range(n_tables):
            planes = _hyperplanes(dim, n_bits, seed + 1000 * t)
            sig = v.withColumn("_sig", signature_expr(F.col(vec_col), planes))
            a = sig.select(
                F.col("_sig"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
            )
            b = sig.select(
                F.col("_sig"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
            )
            frames.append(
                a.join(b, "_sig").filter(F.col("id_a") < F.col("id_b")).select(
                    "id_a", "id_b", "_va", "_vb"
                )
            )
        pairs = frames[0]
        for fr in frames[1:]:
            pairs = pairs.unionByName(fr)
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    return (
        pairs.withColumn("similarity", cosine_expr(F.col("_va"), F.col("_vb")))
        .filter(F.col("similarity") >= threshold)
        .select("id_a", "id_b", "similarity")
    )
