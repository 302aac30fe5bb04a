"""K-means over embeddings: assignment parity vs numpy, distributed Lloyd
convergence + parity with a same-init pure-numpy reference."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pylluminator_spark.datasets import load_table
from pylluminator_spark.operators.similarity import kmeans_assign, kmeans_fit

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    return ids, X


def test_assign_matches_numpy(spark, emb, emb_np):
    ids, X = emb_np
    cents = emb.filter(F.col("vec_id") % 64 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    crows = sorted(
        ((r.cid, np.array(r.cvec, dtype=np.float64)) for r in cents.collect())
    )
    C = np.array([c for _, c in crows])
    cids = np.array([i for i, _ in crows])
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    want_cluster = cids[np.argmin(d, axis=1)]
    want_dist = d.min(axis=1)
    got = {r.vec_id: r for r in kmeans_assign(emb, cents).collect()}
    for i, vid in enumerate(ids):
        assert got[vid].cluster == want_cluster[i]
        assert got[vid].sq_dist == pytest.approx(want_dist[i])


def test_fit_matches_numpy_lloyd(spark, emb, emb_np):
    ids, X = emb_np
    k, iters = 5, 3
    got = kmeans_fit(emb, k, iters=iters)
    # replicate the deterministic init: k smallest pmod(xxhash64(id), 2^31-1)
    hashed = (
        emb.select(
            "vec_id",
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(2**31 - 1)).alias("h"),
        )
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )
    seed_ids = [r.vec_id for r in hashed]
    idx = {v: i for i, v in enumerate(ids)}
    C = X[[idx[v] for v in seed_ids]].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        lab = np.argmin(d, axis=1)
        for c in range(k):
            if (lab == c).any():
                C[c] = X[lab == c].mean(axis=0)
    got_c = {r.cid: np.array(r.cvec) for r in got.collect()}
    assert set(got_c) == set(range(k))
    for c in range(k):
        assert np.allclose(got_c[c], C[c], atol=1e-9), c


def test_fit_reduces_inertia(spark, emb):
    c0 = kmeans_fit(emb, 4, iters=0)
    c3 = kmeans_fit(emb, 4, iters=3)

    def inertia(cdf):
        return (
            kmeans_assign(emb, cdf)
            .agg(F.sum("sq_dist"))
            .collect()[0][0]
        )

    assert inertia(c3) <= inertia(c0) + 1e-9


def test_semantic_near_dups_matches_numpy(spark, emb, emb_np):
    from pylluminator_spark.operators.similarity import semantic_near_dups

    ids, X = emb_np
    cents = emb.filter(F.col("vec_id") % 64 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    crows = sorted(
        ((r.cid, np.array(r.cvec, dtype=np.float64)) for r in cents.collect())
    )
    C = np.array([c for _, c in crows])
    cids = np.array([i for i, _ in crows])
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    lab = cids[np.argmin(d, axis=1)]
    by_id = dict(zip(ids, lab))
    norms = np.sqrt((X * X).sum(1))
    sim = (X @ X.T) / np.outer(norms, norms)
    thr = 0.3
    want = {}
    for i, a in enumerate(ids):
        for j, b in enumerate(ids):
            if a < b and by_id[a] == by_id[b] and sim[i, j] >= thr:
                want[(a, b)] = (by_id[a], sim[i, j])
    got = {
        (r.id_a, r.id_b): (r.cluster, r.cosine)
        for r in semantic_near_dups(emb, cents, threshold=thr).collect()
    }
    assert set(got) == set(want)
    for k, (cl, s) in want.items():
        assert got[k][0] == cl
        assert got[k][1] == pytest.approx(s)


def test_assign_arrow_matches_expr(spark, emb):
    cents = emb.filter(F.col("vec_id") % 64 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    a = {r.vec_id: r for r in kmeans_assign(emb, cents).collect()}
    b = {
        r.vec_id: r
        for r in kmeans_assign(emb, cents, method="arrow").collect()
    }
    assert set(a) == set(b)
    for vid in a:
        assert a[vid].cluster == b[vid].cluster, vid
        assert b[vid].sq_dist == pytest.approx(a[vid].sq_dist, abs=1e-9)


def test_semantic_near_dups_arrow_matches_expr(spark, emb):
    from pylluminator_spark.operators.similarity import semantic_near_dups

    cents = emb.filter(F.col("vec_id") % 64 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    a = {
        (r.id_a, r.id_b): (r.cluster, r.cosine)
        for r in semantic_near_dups(emb, cents, threshold=0.3).collect()
    }
    b = {
        (r.id_a, r.id_b): (r.cluster, r.cosine)
        for r in semantic_near_dups(
            emb,
            cents,
            threshold=0.3,
            assign_method="arrow",
            pair_method="arrow",
        ).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == b[k][0]
        assert b[k][1] == pytest.approx(a[k][1], abs=1e-9)


def test_null_embeddings_are_excluded_not_fatal(spark, emb):
    """NULL embedding rows must be skipped by the arrow paths and fit, not
    crash the batch stacking."""
    from pyspark.sql.types import (
        ArrayType, FloatType, LongType, StructField, StructType,
    )
    from pylluminator_spark.operators.similarity import (
        kmeans_fit,
        semantic_near_dups,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    nulls = spark.createDataFrame([(10_000_000, None)], schema)
    noisy = emb.select("vec_id", "embedding").unionByName(nulls)
    cents = kmeans_fit(noisy, 3, iters=1)
    assert cents.count() == 3
    got = kmeans_assign(noisy, cents, method="arrow")
    ids = {r.vec_id for r in got.collect()}
    assert 10_000_000 not in ids and len(ids) == emb.count()
    pairs = semantic_near_dups(
        noisy, cents, threshold=0.3,
        assign_method="arrow", pair_method="arrow",
    )
    assert pairs.filter(
        (F.col("id_a") == 10_000_000) | (F.col("id_b") == 10_000_000)
    ).count() == 0


# --------------------------------------------------------------------------
# D4-style prototype pruning
# --------------------------------------------------------------------------

from pylluminator_spark.operators.similarity import prototype_prune


def _cents(emb):
    return emb.filter(F.col("vec_id") % 64 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )


def test_prune_quota_per_cluster(spark, emb):
    kept = prototype_prune(emb, _cents(emb), 0.5).persist()
    sizes = {
        r["cluster"]: (r["kept"], r["size"])
        for r in kept.groupBy("cluster")
        .agg(
            F.count("*").alias("kept"),
            F.first("cluster_size").alias("size"),
        )
        .collect()
    }
    import math

    for cl, (k, n) in sizes.items():
        assert k == math.ceil(0.5 * n), (cl, k, n)
    kept.unpersist()


def test_prune_keeps_farthest(spark, emb, emb_np):
    import numpy as np

    kept = {
        r["vec_id"]: r["sq_dist"]
        for r in prototype_prune(emb, _cents(emb), 0.4).collect()
    }
    # recompute assignment + distances in numpy; per cluster the kept set
    # must be exactly the top-40% by (distance desc, id asc)
    ids, X = emb_np
    vecs = {int(i): X[n] for n, i in enumerate(ids)}
    cids = sorted(i for i in vecs if i % 64 == 0)
    C = np.array([vecs[c] for c in cids])
    by_cluster = {}
    for i in sorted(vecs):
        d = ((C - vecs[i]) ** 2).sum(axis=1)
        j = int(d.argmin())
        by_cluster.setdefault(cids[j], []).append((-d[j], i))
    import math

    want = set()
    for cl, rows in by_cluster.items():
        rows.sort()
        q = math.ceil(0.4 * len(rows))
        want.update(i for _, i in rows[:q])
    assert set(kept) == want


def test_prune_full_keep_is_identity(spark, emb):
    kept = prototype_prune(emb, _cents(emb), 1.0)
    assert kept.count() == emb.count()


def test_prune_rejects_bad_frac(spark, emb):
    with pytest.raises(ValueError):
        prototype_prune(emb, _cents(emb), 0.0)
    with pytest.raises(ValueError):
        prototype_prune(emb, _cents(emb), 1.5)
