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


def signatures_arrow(
    vec: Column, planes_by_table: list[list[list[float]]]
) -> Column:
    """All tables' hyperplane signatures in ONE Arrow-vectorized pass:
    returns ``array<long>`` of ``n_tables`` signatures per vector.

    BIT-IDENTICAL to ``signature_expr`` per table: the accumulator adds
    ``v_j * p_j`` in ascending j (one vectorized numpy step per
    dimension across all rows x planes) — exactly the HOF fold's
    ``(((0.0 + v1*p1) + v2*p2) + ...)`` double ops, so every sign test
    and therefore every signature matches the expression path and the
    DuckDB oracle twin. ~100x the interpreted fold on the LSH hot path
    (VERDICT r6 #2): one (rows x planes) matrix fma per dimension
    instead of 2560 interpreted expression-tree ops per row."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    if not planes_by_table or not planes_by_table[0]:
        raise ValueError("planes_by_table must hold >= 1 table of planes")
    P = np.asarray(
        [p for planes in planes_by_table for p in planes], dtype=np.float64
    )  # (T*B, dim)
    n_tables = len(planes_by_table)
    n_bits = len(planes_by_table[0]) if planes_by_table else 0
    weights = (1 << np.arange(n_bits, dtype=np.int64)) if n_bits else None

    def _sigs(s):
        if len(s) == 0:
            return pd.Series([], dtype=object)
        V = np.asarray(s.tolist(), dtype=np.float64)  # (n, dim)
        acc = np.zeros((V.shape[0], P.shape[0]), dtype=np.float64)
        for j in range(V.shape[1]):
            # exact left fold in dimension order: mul then add, like the
            # zip_with products folded by aggregate
            acc = acc + V[:, j : j + 1] * P[:, j]
        bits = acc >= 0.0  # (n, T*B)
        sigs = np.stack(
            [
                (bits[:, t * n_bits : (t + 1) * n_bits] * weights).sum(axis=1)
                for t in range(n_tables)
            ],
            axis=1,
        )  # (n, T)
        return pd.Series(list(sigs))

    # explicit annotations: the module-wide `from __future__ import
    # annotations` would stringify inline hints, which the pandas_udf
    # type-hint inference cannot resolve for a nested function
    _sigs.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf("array<long>")(_sigs)(vec)


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
    arrow: bool = True,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold), (id_a < id_b).

    ``exact=True`` does the full O(n^2) self-join (small corpora / testing);
    default uses LSH bucketing so only same-bucket pairs are scored.

    ``arrow=True`` (default) computes ALL tables' signatures in one
    Arrow-vectorized pass (``signatures_arrow`` — bit-identical to the
    expression path, see its docstring) and buckets via posexplode +
    one (table, sig) equi self-join; ``arrow=False`` keeps the
    pure-expression per-table form. Candidate pairs, similarities and
    therefore results are identical either way.
    """
    v = vectors.select(F.col(id_col), F.col(vec_col))
    planes_by_table = [
        _hyperplanes(dim, n_bits, seed + 1000 * t) for t in range(n_tables)
    ]
    if exact:
        a = v.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
        b = v.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    elif arrow:
        e = v.select(
            F.col(id_col),
            F.col(vec_col),
            F.posexplode(
                signatures_arrow(F.col(vec_col), planes_by_table)
            ).alias("_table", "_sig"),
        )
        a = e.select(
            "_table", "_sig",
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"),
        )
        b = e.select(
            "_table", "_sig",
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"),
        )
        pairs = (
            a.join(b, ["_table", "_sig"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b", "_va", "_vb")
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        frames = []
        for planes in planes_by_table:
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


def block_cosine_pairs(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    block_size: int = 1024,
    round_to: int | None = 6,
) -> DataFrame:
    """Exact all-pairs cosine join via BLOCK MATRIX multiplication.

    The naive pair cross-join evaluates the 64-term dot product per row in
    interpreted expression code — O(n^2 d) scalar ops through the expression
    evaluator. Here vectors are packed into blocks of `block_size`, block
    pairs are cross-joined (upper triangle only), and each task computes a
    (block x block) numpy matmul — the same arithmetic, ~100x faster, and
    each task's working set is two blocks (bounded memory at any n).

    Still O(n^2 / block^2) tasks — brute force is inherently quadratic; for
    100 TB corpora use `embedding_near_dups` (LSH) and reserve this for the
    verification pass on candidate buckets.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    packed = (
        vectors.select(
            (F.col(id_col) / block_size).cast("long").alias("_blk"),
            F.struct(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).alias(
                "_item"
            ),
        )
        .groupBy("_blk")
        .agg(F.collect_list("_item").alias("_items"))
    )
    a = packed.select(
        F.col("_blk").alias("_blk_a"), F.col("_items").alias("_items_a")
    )
    b = packed.select(
        F.col("_blk").alias("_blk_b"), F.col("_items").alias("_items_b")
    )
    block_pairs = a.join(b, F.col("_blk_a") <= F.col("_blk_b"))

    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("similarity", DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            outs = []
            for items_a, items_b in zip(pdf["_items_a"], pdf["_items_b"]):
                ids_a = np.array([it["id"] for it in items_a], dtype=np.int64)
                A = np.array([it["v"] for it in items_a], dtype=np.float64)
                ids_b = np.array([it["id"] for it in items_b], dtype=np.int64)
                B = np.array([it["v"] for it in items_b], dtype=np.float64)
                G = A @ B.T
                sim = G / np.outer(
                    np.sqrt((A * A).sum(1)), np.sqrt((B * B).sum(1))
                )
                if round_to is not None:
                    sim = np.round(sim, round_to)
                ia, ib = np.nonzero(
                    (sim >= threshold) & (ids_a[:, None] < ids_b[None, :])
                )
                if len(ia):
                    outs.append(
                        pd.DataFrame(
                            {
                                "id_a": ids_a[ia],
                                "id_b": ids_b[ib],
                                "similarity": sim[ia, ib],
                            }
                        )
                    )
            yield (
                pd.concat(outs)
                if outs
                else pd.DataFrame(
                    {"id_a": [], "id_b": [], "similarity": []}
                ).astype({"id_a": "int64", "id_b": "int64"})
            )

    return block_pairs.mapInPandas(score, schema=out_schema)


# ---------------------------------------------------------------------------
# K-means over embeddings (the clustering stage of SemDeDup-style semantic
# dedup: cluster the corpus, then near-dup search only WITHIN clusters)
# ---------------------------------------------------------------------------


def sq_dist_expr(a: Column, b: Column) -> Column:
    """Squared Euclidean distance as a FIXED-ORDER fold over dimensions,
    computed entirely in float64: both sides of the cross-engine gate cast
    each element to double before subtracting, so the left-to-right
    accumulation is bit-identical to an unrolled ANSI-SQL sum."""
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def _assign_arrow_local(df, cids, C, vec_col: str, id_col: str) -> DataFrame:
    """Arrow E-step against DRIVER-LOCAL centroid arrays (cids sorted
    ascending, C the matching k x dim float64 matrix). NULL-embedding rows
    are excluded up front — they have no nearest centroid and would
    otherwise break the batch np.array stacking."""
    import numpy as np
    import pandas as pd

    c_sq = (C * C).sum(axis=1)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c_sq
            best = d.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": cids[best],
                    "sq_dist": np.maximum(
                        d[np.arange(len(best)), best], 0.0
                    ),
                }
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return (
        df.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .mapInPandas(
            assign,
            schema=f"{id_col} {id_type}, cluster long, sq_dist double",
        )
    )


def kmeans_assign(
    df: DataFrame,
    centroids: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_id_col: str = "cid",
    centroid_vec_col: str = "cvec",
    method: str = "expr",
) -> DataFrame:
    """Nearest-centroid assignment (Lloyd's E-step). ``centroids`` is
    dimension-sized (k rows) and broadcast; the corpus side streams through
    map-side with no shuffle — the assignment itself is embarrassingly
    parallel at any scale. Ties break on the smaller centroid id.

    ``method``:

    - ``"expr"`` — pure column expressions with a FIXED-ORDER float64 fold:
      bit-reproducible across engines (what the cross-engine gate checks),
      but interpreted HOF lambdas cost ~1 us/element — fine for moderate
      n*k*dim, not for a corpus-scale E-step.
    - ``"arrow"`` — Arrow-batched ``mapInPandas`` with one vectorized numpy
      ``X @ C.T`` per batch: ~100x the throughput, same argmin (numpy's
      SIMD/pairwise summation may differ from the fold in the last ulp, so
      equal-distance ties could theoretically differ; exact-duplicate
      centroids are the only realistic case). The production path.
    """
    if method == "arrow":
        import numpy as np

        crows = sorted(
            (int(r[0]), [float(x) for x in r[1]])
            for r in centroids.select(
                centroid_id_col, centroid_vec_col
            ).collect()
        )
        cids = np.array([c for c, _ in crows], dtype=np.int64)
        C = np.array([v for _, v in crows], dtype=np.float64)
        return _assign_arrow_local(df, cids, C, vec_col, id_col)
    cand = df.select(id_col, vec_col).crossJoin(F.broadcast(centroids))
    dist = sq_dist_expr(F.col(vec_col), F.col(centroid_vec_col))
    best = (
        cand.select(
            id_col,
            F.struct(
                dist.alias("dist"), F.col(centroid_id_col).alias("cid")
            ).alias("_c"),
        )
        .groupBy(id_col)
        .agg(F.min("_c").alias("_best"))
    )
    return best.select(
        id_col,
        F.col("_best.cid").alias("cluster"),
        F.col("_best.dist").alias("sq_dist"),
    )


def kmeans_fit(
    df: DataFrame,
    k: int,
    *,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Distributed Lloyd's k-means: deterministic key-hash init (the k
    smallest ``xxhash64(id)`` rows seed the centroids — reproducible, no
    driver-side randomness), then ``iters`` rounds of broadcast-assign +
    per-cluster per-dimension mean. Each round is one map-side assignment
    and one hash aggregate; only the k x dim centroid matrix ever reaches
    the driver (the same contract as MLlib's implementation).

    Returns the final centroids DataFrame (cid, cvec).
    """
    spark = df.sparkSession
    probe = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    if probe is None:
        raise ValueError(
            f"kmeans_fit: no non-null '{vec_col}' rows to fit on"
        )
    dim = len(probe[0])
    seeds = (
        df.select(id_col, vec_col)
        .filter(F.col(vec_col).isNotNull())
        .orderBy(F.pmod(F.xxhash64(F.col(id_col)), F.lit(2**31 - 1)), id_col)
        .limit(k)
        .collect()
    )
    import numpy as np

    cents = [(i, [float(x) for x in r[1]]) for i, r in enumerate(seeds)]
    for _ in range(iters):
        # arrow E-step straight from the driver-local centroid list — no
        # createDataFrame/collect round trip per Lloyd iteration (the fit
        # loop needs throughput, not cross-engine bit parity)
        cids = np.array([c for c, _ in cents], dtype=np.int64)
        C = np.array([v for _, v in cents], dtype=np.float64)
        assigned = _assign_arrow_local(df, cids, C, vec_col, id_col).join(
            df.select(id_col, vec_col), id_col
        )
        new = (
            assigned.groupBy("cluster")
            .agg(
                *[
                    F.avg(F.col(vec_col)[i].cast("double")).alias(f"d{i}")
                    for i in range(dim)
                ]
            )
            .collect()
        )
        by_cid = {
            r["cluster"]: [r[f"d{i}"] for i in range(dim)] for r in new
        }
        # empty clusters keep their previous centroid
        cents = [(cid, by_cid.get(cid, vec)) for cid, vec in cents]
    return spark.createDataFrame(cents, ["cid", "cvec"]).select(
        "cid", F.col("cvec").cast("array<double>").alias("cvec")
    )


def dot_double_expr(a: Column, b: Column) -> Column:
    """Fixed-order float64 dot product (cross-engine reproducible: each
    element cast to double, left-to-right fold — see sq_dist_expr)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_double_expr(a: Column, b: Column) -> Column:
    """Cosine similarity in float64 with fixed accumulation order.
    NULL (not an ANSI divide-by-zero error) for zero-norm vectors."""
    na = F.sqrt(dot_double_expr(a, a))
    nb = F.sqrt(dot_double_expr(b, b))
    return dot_double_expr(a, b) / F.nullif(na * nb, F.lit(0.0))


def semantic_near_dups(
    df: DataFrame,
    centroids: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign_method: str = "expr",
    pair_method: str = "expr",
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023):
    assign every embedding to its nearest centroid, then compare pairs only
    WITHIN clusters. Near-identical points share a cluster by construction,
    so recall for true near-dups stays high while the quadratic pair cost
    drops by ~k (and parallelizes per cluster). Returns
    ``(id_a, id_b, cluster, cosine)`` for pairs with cosine >= threshold.

    The within-cluster self-join is an equi join on the cluster id; at
    production scale pick k so clusters stay comparison-sized (SemDeDup
    used k ~ 10k for 100M+ points) — cluster size, not corpus size, bounds
    the quadratic term.

    ``pair_method="arrow"`` replaces the expr self-join with one
    ``applyInPandas`` per cluster computing the cosine matrix as a numpy
    block matmul — the production path when clusters hold thousands of
    vectors (the expr fold costs ~1 us/element x dim per pair).
    """
    assigned = kmeans_assign(
        df, centroids, vec_col=vec_col, id_col=id_col, method=assign_method
    )
    if pair_method == "arrow":
        import numpy as np
        import pandas as pd

        emb_a = (
            df.select(id_col, vec_col)
            .filter(F.col(vec_col).isNotNull())
            .join(assigned.select(id_col, "cluster"), id_col)
        )

        def pairs_fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
            ids = pdf[id_col].to_numpy()
            cluster = int(pdf["cluster"].iloc[0])
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            n = np.sqrt((X * X).sum(axis=1))
            n[n == 0.0] = np.nan  # zero-norm -> NaN cosine -> dropped
            sim = (X @ X.T) / np.outer(n, n)
            # id-order mask (NOT positional triu: rows are unsorted) emits
            # each unordered pair exactly once, as (smaller, larger)
            ia, ib = np.nonzero(
                (sim >= threshold) & (ids[:, None] < ids[None, :])
            )
            return pd.DataFrame(
                {
                    "id_a": ids[ia],
                    "id_b": ids[ib],
                    "cluster": cluster,
                    "cosine": sim[ia, ib],
                }
            )

        id_type = df.schema[id_col].dataType.simpleString()
        return emb_a.groupBy("cluster").applyInPandas(
            pairs_fn,
            schema=(
                f"id_a {id_type}, id_b {id_type},"
                " cluster long, cosine double"
            ),
        )
    # hoist each vector's norm out of the pair loop: computed once per row
    # instead of once per pair (same fixed-order fold -> same bits as the
    # inline form, so the cross-engine gate is unaffected)
    emb = (
        df.select(id_col, vec_col)
        .join(assigned.select(id_col, "cluster"), id_col)
        .withColumn(
            "_norm", F.sqrt(dot_double_expr(F.col(vec_col), F.col(vec_col)))
        )
    )
    left = emb.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("_va"),
        F.col("_norm").alias("_na"),
        "cluster",
    )
    right = emb.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("_vb"),
        F.col("_norm").alias("_nb"),
        "cluster",
    )
    pairs = left.join(right, "cluster").filter(F.col("id_a") < F.col("id_b"))
    # nullif: a zero-norm vector yields NULL cosine (dropped by the
    # threshold filter), not an ANSI divide-by-zero task failure
    cos = dot_double_expr(F.col("_va"), F.col("_vb")) / F.nullif(
        F.col("_na") * F.col("_nb"), F.lit(0.0)
    )
    return (
        pairs.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cluster", "cosine")
    )


def prototype_prune(
    df: DataFrame,
    centroids: DataFrame,
    keep_frac: float,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign_method: str = "expr",
    round_digits: int | None = None,
) -> DataFrame:
    """D4/SSL-prototype data pruning (Sorscher et al. 2022 "Beyond neural
    scaling laws"; Tirumala et al. 2023 D4): within each k-means cluster,
    DROP the most prototypical points (closest to the centroid — the
    easy, redundant examples) and keep the ``keep_frac`` farthest. The
    standard diversity-pruning stage after SemDeDup in an LLM data
    pipeline.

    One broadcast-centroid assignment (map-side) + one hash-partitioned
    streaming window per cluster — same scale shape as cap_per_domain.
    Per-cluster quota is ``ceil(keep_frac * cluster_size)``, so every
    non-empty cluster keeps at least one row. Ordering is
    (sq_dist DESC, id ASC); ``round_digits`` rounds the distance first so
    a cross-engine twin ranks identical values identically.

    Returns the kept rows: (id, cluster, sq_dist, cluster_size).
    """
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    from pyspark.sql import Window

    assigned = kmeans_assign(
        df, centroids, vec_col=vec_col, id_col=id_col, method=assign_method
    )
    dist = (
        F.round("sq_dist", round_digits)
        if round_digits is not None
        else F.col("sq_dist")
    )
    w = Window.partitionBy("cluster")
    w_rank = w.orderBy(dist.desc(), F.col(id_col))
    ranked = assigned.select(
        id_col,
        "cluster",
        dist.alias("sq_dist"),
        F.row_number().over(w_rank).alias("_rn"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )
    return ranked.filter(
        F.col("_rn") <= F.ceil(F.col("cluster_size") * F.lit(keep_frac))
    ).drop("_rn")
