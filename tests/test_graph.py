"""Connected components / dedup clustering (operators.graph)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.graph import connected_components, dedup_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, **kw)
    return {r["node"]: r["component"] for r in out.collect()}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (12, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_path_graph_converges_fast(spark):
    """A 64-node path has diameter 63: pointer-jumping must converge well
    inside the default 20-round cap (log2(63) ~ 6)."""
    edges = [(i, i + 1) for i in range(63)]
    got = _cc(spark, edges, max_iter=12)
    assert set(got.values()) == {0}
    assert len(got) == 64


def test_self_edges_and_duplicates(spark):
    got = _cc(spark, [(5, 5), (7, 8), (8, 7), (7, 8)])
    assert got == {5: 5, 7: 7, 8: 7}


def test_random_graph_matches_union_find(spark):
    rng = np.random.RandomState(0)
    n = 200
    edges = [
        (int(rng.randint(n)), int(rng.randint(n))) for _ in range(150)
    ]
    got = _cc(spark, edges)

    # reference: plain union-find
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    touched = {a for e in edges for a in e}
    for x in touched:
        root = find(x)
        # canonical = min node of the component
        want[x] = min(y for y in touched if find(y) == root)
    assert got == want


def test_dedup_components_keeps_singletons(spark):
    pairs = spark.createDataFrame([(1, 2), (4, 5)], "id_a long, id_b long")
    all_ids = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    out = {
        r["doc_id"]: r["component"]
        for r in dedup_components(pairs, all_ids).collect()
    }
    assert out == {0: 0, 1: 1, 2: 1, 3: 3, 4: 4, 5: 4, 6: 6}
    # canonical-per-group rule: one survivor per component
    comp = dedup_components(pairs, all_ids)
    survivors = comp.groupBy("component").agg(F.min("doc_id").alias("keep"))
    assert survivors.count() == 5


def test_non_convergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(63)], "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2)
