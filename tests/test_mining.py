"""Hard-negative mining (operators/mining.py): python brute-force parity
for the exact path, IVF path recall semantics, label/self exclusion, and
the similarity band."""

from __future__ import annotations

import math
import random

import pytest

from pylluminator_spark.operators.mining import hard_negative_mining

random.seed(20260816)

DIM = 6
N = 40


def _vec(rng):
    return [rng.gauss(0.0, 1.0) for _ in range(DIM)]


RNG = random.Random(7)
CORPUS = [(i, _vec(RNG), i % 3) for i in range(N)]
QUERIES = [(i, v, lab) for (i, v, lab) in CORPUS if i < 5]
CENTROIDS = [(j, _vec(RNG)) for j in range(4)]


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def _sqd(a, b):
    return sum((x - y) ** 2 for x, y in zip(a, b))


def _brute(k, min_sim=None, max_sim=None):
    out = {}
    for qid, qv, ql in QUERIES:
        cands = []
        for cid, cv, cl in CORPUS:
            if cid == qid or cl == ql:
                continue
            s = _cos(qv, cv)
            if min_sim is not None and s < min_sim:
                continue
            if max_sim is not None and s > max_sim:
                continue
            cands.append((cid, s))
        cands.sort(key=lambda t: (-t[1], t[0]))
        out[qid] = cands[:k]
    return out


def _cells(rows, n_probe):
    out = {}
    for rid, v, _l in rows:
        ds = sorted((_sqd(v, cv), j) for j, cv in CENTROIDS)
        out[rid] = [j for _d, j in ds[:n_probe]]
    return out


def _ivf_expected(k, n_probe):
    qcells = _cells(QUERIES, n_probe)
    ccells = _cells(CORPUS, 1)
    out = {}
    for qid, qv, ql in QUERIES:
        cands = []
        for cid, cv, cl in CORPUS:
            if cid == qid or cl == ql:
                continue
            if ccells[cid][0] not in qcells[qid]:
                continue
            cands.append((cid, _cos(qv, cv)))
        cands.sort(key=lambda t: (-t[1], t[0]))
        out[qid] = cands[:k]
    return out


@pytest.fixture(scope="module")
def frames(spark):
    corpus = spark.createDataFrame(
        [(i, v, l) for i, v, l in CORPUS],
        "vec_id long, embedding array<double>, label int",
    )
    queries = spark.createDataFrame(
        [(i, v, l) for i, v, l in QUERIES],
        "query_id long, embedding array<double>, label int",
    )
    cents = spark.createDataFrame(
        CENTROIDS, "cid int, cvec array<double>"
    )
    return corpus, queries, cents


def _collect(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["similarity"])
        )
    for q in out:
        out[q].sort()
    return out


class TestBruteForcePath:
    def test_matches_python_reference(self, spark, frames):
        corpus, queries, _ = frames
        got = _collect(hard_negative_mining(corpus, queries, k=4))
        exp = _brute(4)
        assert set(got) == set(exp)
        for q in exp:
            assert [v for _r, v, _s in got[q]] == [c for c, _s in exp[q]]
            for (_r, _v, s), (_c, es) in zip(got[q], exp[q]):
                assert s == pytest.approx(es, abs=1e-12)

    def test_no_self_and_no_same_label(self, spark, frames):
        corpus, queries, _ = frames
        rows = hard_negative_mining(corpus, queries, k=40).collect()
        lab = {i: l for i, _v, l in CORPUS}
        for r in rows:
            assert r["vec_id"] != r["query_id"]
            assert lab[r["vec_id"]] != lab[r["query_id"]]

    def test_similarity_band(self, spark, frames):
        corpus, queries, _ = frames
        got = _collect(
            hard_negative_mining(
                corpus, queries, k=4, min_sim=-0.2, max_sim=0.5
            )
        )
        exp = _brute(4, min_sim=-0.2, max_sim=0.5)
        for q in exp:
            assert [v for _r, v, _s in got[q]] == [c for c, _s in exp[q]]

    def test_k_validation(self, spark, frames):
        corpus, queries, _ = frames
        with pytest.raises(ValueError):
            hard_negative_mining(corpus, queries, k=0)

    def test_n_probe_validation(self, spark, frames):
        # n_probe=0 would silently yield zero candidates for every
        # query (empty slice), not an error — must raise instead
        corpus, queries, cents = frames
        for bad in (0, -1):
            with pytest.raises(ValueError):
                hard_negative_mining(
                    corpus, queries, k=4, centroids=cents, n_probe=bad
                )

    def test_single_probe_plan_has_no_collect_list(self, spark, frames):
        # n_probe=1 must dispatch to the streaming min(struct) partial
        # aggregate (constant per-group state, map-side combine) — the
        # sort_array(collect_list) top-n slice is the multi-probe path
        corpus, queries, cents = frames
        plan1 = hard_negative_mining(
            corpus, queries, k=4, centroids=cents, n_probe=1
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "collect_list" not in plan1
        assert "min(" in plan1
        plan2 = hard_negative_mining(
            corpus, queries, k=4, centroids=cents, n_probe=2
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "collect_list" in plan2


class TestIvfPath:
    def test_single_probe_matches_python_ivf(self, spark, frames):
        corpus, queries, cents = frames
        got = _collect(
            hard_negative_mining(
                corpus, queries, k=4, centroids=cents, n_probe=1
            )
        )
        exp = _ivf_expected(4, n_probe=1)
        for q in exp:
            assert [v for _r, v, _s in got.get(q, [])] == [
                c for c, _s in exp[q]
            ], q

    def test_multi_probe_matches_python_ivf(self, spark, frames):
        corpus, queries, cents = frames
        got = _collect(
            hard_negative_mining(
                corpus, queries, k=4, centroids=cents, n_probe=2
            )
        )
        exp = _ivf_expected(4, n_probe=2)
        for q in exp:
            assert [v for _r, v, _s in got.get(q, [])] == [
                c for c, _s in exp[q]
            ], q

    def test_probe_all_cells_equals_brute_force(self, spark, frames):
        corpus, queries, cents = frames
        got = _collect(
            hard_negative_mining(
                corpus, queries, k=4, centroids=cents,
                n_probe=len(CENTROIDS),
            )
        )
        exp = _brute(4)
        for q in exp:
            assert [v for _r, v, _s in got[q]] == [c for c, _s in exp[q]]

    def test_no_duplicate_pairs_under_multi_probe(self, spark, frames):
        corpus, queries, cents = frames
        rows = hard_negative_mining(
            corpus, queries, k=40, centroids=cents, n_probe=3
        ).collect()
        pairs = [(r["query_id"], r["vec_id"]) for r in rows]
        assert len(pairs) == len(set(pairs))
