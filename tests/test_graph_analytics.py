"""Triangle enumeration vs brute force; fixed-point PageRank vs an exact
python integer reference (bit-identical, including dangling handling)."""

from __future__ import annotations

import itertools
import random

import pytest

from pylluminator_spark.operators.graph import (
    pagerank,
    triangle_stats,
    triangles,
)


def _rand_edges(n_nodes, n_edges, seed):
    rng = random.Random(seed)
    return list(
        {
            tuple(sorted((rng.randrange(n_nodes), rng.randrange(n_nodes))))
            for _ in range(n_edges)
        }
    )


def _brute_triangles(edges):
    adj = {}
    und = set()
    for u, v in edges:
        if u == v:
            continue
        und.add((min(u, v), max(u, v)))
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tris = set()
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tris.add((a, b, c))
    return und, tris


def test_triangles_match_bruteforce(spark):
    edges = _rand_edges(30, 120, seed=11)
    und, want = _brute_triangles(edges)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r.a, r.b, r.c) for r in triangles(df).collect()}
    assert got == want and len(want) > 20
    stats = triangle_stats(df).collect()[0]
    assert stats.n_edges == len(und)
    assert stats.n_triangles == len(want)


def test_triangles_self_loops_and_duplicates_ignored(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (1, 1)], "src long, dst long"
    )
    assert {(r.a, r.b, r.c) for r in triangles(df).collect()} == {(1, 2, 3)}


def _py_pagerank(edges, iters, damping_pct=85, scale=10**12):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    odeg, inc = {}, {u: [] for u in nodes}
    for s, d in edges:
        odeg[s] = odeg.get(s, 0) + 1
    for s, d in edges:
        inc[d].append(s)
    base = scale // n
    r = {u: base for u in nodes}
    for _ in range(iters):
        dm = sum(r[u] for u in nodes if u not in odeg)
        new = {}
        for u in nodes:
            ins = sum(r[s] // odeg[s] for s in inc[u])
            new[u] = (
                (100 - damping_pct) * base
                + damping_pct * (ins + dm // n)
            ) // 100
        r = new
    return r


@pytest.mark.parametrize("symmetric", [True, False])
def test_pagerank_bit_exact_vs_python(spark, symmetric):
    rng = random.Random(3)
    raw = {
        (rng.randrange(25), rng.randrange(25)) for _ in range(120)
    }
    edges = [(u, v) for u, v in raw if u != v]
    if symmetric:
        edges = list({*edges, *[(v, u) for u, v in edges]})
    # a directed graph keeps some dangling nodes (in-edges only)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.rank_int for r in pagerank(df, iters=3).collect()
    }
    want = _py_pagerank(edges, iters=3)
    assert got == want  # integer-exact, including dangling redistribution


def test_pagerank_mass_nearly_conserved(spark):
    edges = [(0, 1), (1, 2), (2, 0), (3, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank(df, iters=5).collect()
    total = sum(r.rank_int for r in out)
    # truncation loses < iters * n units of 1/scale
    assert 10**12 - 5 * 4 * 100 <= total <= 10**12
