"""DoReMi domain reweighting (operators/doremi.py): python twin parity
for the two-LM excess-loss computation, weight normalization/smoothing,
and edge semantics (zero-excess clamp, bigram-less docs absent)."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from pylluminator_spark.operators.doremi import doremi_domain_weights

DOCS = [
    # (doc_id, domain, text)
    (1, "wiki", "the cat sat on the mat and the cat sat again"),
    (2, "wiki", "the dog sat on the mat near the door"),
    (3, "web", "buy cheap cheap cheap pills now now now"),
    (4, "web", "click here to buy cheap pills here"),
    (5, "forum", "i think the cat sat on the dog"),
    (6, "forum", "lol"),  # 1 token -> no bigrams -> absent from scores
    (7, "books", "once upon a time the cat sat quietly"),
]
REF = [
    (10, "the cat sat on the mat"),
    (11, "the dog sat on the mat"),
    (12, "once upon a time"),
]
ETA, SMOOTH = 1.0, 0.1


def _toks(t):
    return [x for x in re.split(r"\s+", t.lower()) if x]


def _bigrams(texts):
    out = {}
    for key, t in texts:
        tk = _toks(t)
        if len(tk) >= 2:
            out[key] = Counter(zip(tk[:-1], tk[1:]))
    return out


def _score(per_doc, per_ref, alpha=1.0, backoff=0.4, min_count=1):
    model = Counter()
    for c in per_ref.values():
        model.update(c)
    model = {k: v for k, v in model.items() if v >= min_count}
    u_tot, uni = Counter(), Counter()
    for c in per_ref.values():
        for (u, w), n in c.items():
            u_tot[u] += n
            uni[w] += n
    t_total, v_size = sum(uni.values()), len(uni)
    denom = t_total + alpha * (v_size + 1)
    out = {}
    for key, cnts in per_doc.items():
        s, n = 0.0, 0
        for (u, w) in sorted(cnts):
            d = cnts[(u, w)]
            p = (
                model[(u, w)] / u_tot[u]
                if (u, w) in model
                else backoff * ((uni.get(w, 0) + alpha) / denom)
            )
            s += d * math.log(p)
            n += d
        out[key] = (n, -s / n)
    return out


def _expected():
    per_doc = _bigrams([(d, t) for d, _dom, t in DOCS])
    ref_fit = _score(per_doc, _bigrams(REF))
    self_fit = _score(per_doc, per_doc)
    doms = {}
    for doc_id, dom, _t in DOCS:
        if doc_id not in per_doc:
            continue
        doms.setdefault(dom, []).append(doc_id)
    rows = {}
    for dom, ids in doms.items():
        ids.sort()
        n_docs = len(ids)
        n_big = sum(ref_fit[d][0] for d in ids)
        sref = 0.0
        sself = 0.0
        for d in ids:  # sorted doc order fold
            sref += ref_fit[d][1] * ref_fit[d][0]
            sself += self_fit[d][1] * self_fit[d][0]
        nll_ref, nll_self = sref / n_big, sself / n_big
        excess = max(0.0, nll_ref - nll_self)
        rows[dom] = [n_docs, n_big, nll_ref, nll_self, excess]
    wsum = 0.0
    for dom in sorted(rows):  # sorted domain order fold
        rows[dom].append(rows[dom][1] * math.exp(ETA * rows[dom][4]))
        wsum += rows[dom][5]
    nd = len(rows)
    for dom in rows:
        rows[dom].append(
            (1.0 - SMOOTH) * rows[dom][5] / wsum + SMOOTH / nd
        )
    return rows


class TestDoremiWeights:
    def test_matches_python_reference(self, spark):
        docs = spark.createDataFrame(
            DOCS, "doc_id long, source string, text string"
        )
        ref = spark.createDataFrame(REF, "doc_id long, text string")
        got = {
            r["source"]: r
            for r in doremi_domain_weights(
                docs, ref, eta=ETA, smoothing=SMOOTH
            ).collect()
        }
        exp = _expected()
        assert set(got) == set(exp)
        for dom, e in exp.items():
            g = got[dom]
            assert g["n_docs"] == e[0]
            assert g["n_bigrams"] == e[1]
            assert g["nll_ref"] == pytest.approx(e[2], abs=1e-12)
            assert g["nll_self"] == pytest.approx(e[3], abs=1e-12)
            assert g["excess"] == pytest.approx(e[4], abs=1e-12)
            assert g["weight"] == pytest.approx(e[6], abs=1e-12)

    def test_weights_sum_to_one(self, spark):
        docs = spark.createDataFrame(
            DOCS, "doc_id long, source string, text string"
        )
        ref = spark.createDataFrame(REF, "doc_id long, text string")
        rows = doremi_domain_weights(docs, ref).collect()
        assert sum(r["weight"] for r in rows) == pytest.approx(1.0, abs=1e-12)

    def test_self_reference_gives_zero_excess_token_shares(self, spark):
        # reference == corpus -> nll_ref == nll_self -> excess 0 for all,
        # so weights reduce to smoothed token shares
        docs = spark.createDataFrame(
            DOCS, "doc_id long, source string, text string"
        )
        ref = docs.select("doc_id", "text")
        rows = doremi_domain_weights(docs, ref, smoothing=0.0).collect()
        n_total = sum(r["n_bigrams"] for r in rows)
        for r in rows:
            assert r["excess"] == pytest.approx(0.0, abs=1e-12)
            assert r["weight"] == pytest.approx(
                r["n_bigrams"] / n_total, abs=1e-12
            )

    def test_bigramless_doc_excluded(self, spark):
        docs = spark.createDataFrame(
            DOCS, "doc_id long, source string, text string"
        )
        ref = spark.createDataFrame(REF, "doc_id long, text string")
        got = {
            r["source"]: r["n_docs"]
            for r in doremi_domain_weights(docs, ref).collect()
        }
        assert got["forum"] == 1  # doc 6 ("lol") has no bigrams

    def test_deterministic_fold_matches_bounded_sum(self, spark):
        # the production path (plain SUM per domain, bounded state,
        # map-side combine) and the gate twin (sorted-doc_col fold)
        # must agree to float noise on every output column
        docs = spark.createDataFrame(
            DOCS, "doc_id long, source string, text string"
        )
        ref = spark.createDataFrame(REF, "doc_id long, text string")
        prod = {
            r["source"]: r
            for r in doremi_domain_weights(
                docs, ref, eta=ETA, smoothing=SMOOTH
            ).collect()
        }
        det = {
            r["source"]: r
            for r in doremi_domain_weights(
                docs, ref, eta=ETA, smoothing=SMOOTH, deterministic=True
            ).collect()
        }
        assert set(prod) == set(det)
        for dom in det:
            for c in ("n_docs", "n_bigrams"):
                assert prod[dom][c] == det[dom][c]
            for c in ("nll_ref", "nll_self", "excess", "weight"):
                assert prod[dom][c] == pytest.approx(
                    det[dom][c], rel=1e-12
                ), (dom, c)

    def test_default_path_has_no_corpus_sized_collect_list(self, spark):
        # the per-DOMAIN aggregation (state grows with the corpus) must
        # be a plain sum on the default path; the only collect_list
        # allowed in the whole plan is the <= n_domains normalizer fold
        docs = spark.createDataFrame(
            DOCS, "doc_id long, source string, text string"
        )
        ref = spark.createDataFrame(REF, "doc_id long, text string")
        plan = (
            doremi_domain_weights(docs, ref)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        # normalizer folds struct(_dom, _wraw); the unbounded per-domain
        # fold collected struct(doc_id, ...) — its signature must be
        # gone (plans print named structs as "struct(doc_id, doc_id#N,")
        assert "struct(doc_id," not in plan
        det_plan = (
            doremi_domain_weights(docs, ref, deterministic=True)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "struct(doc_id," in det_plan

    def test_smoothing_validation(self, spark):
        docs = spark.createDataFrame(
            DOCS, "doc_id long, source string, text string"
        )
        ref = spark.createDataFrame(REF, "doc_id long, text string")
        with pytest.raises(ValueError):
            doremi_domain_weights(docs, ref, smoothing=1.5)
