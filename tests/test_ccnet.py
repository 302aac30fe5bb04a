"""CCNet-style per-paragraph LM filtering (operators/ccnet.py): python
reference parity for paragraph scoring + rank-tercile bucketing, the
reference-corpus LM path, and document reassembly."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from pylluminator_spark.operators.ccnet import (
    ccnet_paragraph_filter,
    paragraph_lm_buckets,
)
from pylluminator_spark.operators.corpus import bigram_lm_scores

DOCS = [
    (1, "the cat sat on the mat\n\nthe cat sat on the mat again today"),
    (2, "zq xv jj kk qq ww\n\nthe cat sat on the mat"),
    (3, "Hi\n\nthe dog sat on the mat\n\n\n\nzq xv zq xv zq xv mm nn"),
    (4, ""),
    (5, "one two three four five six seven\n\nHeader"),
]

REF = [
    (10, "the cat sat on the mat\n\nthe dog sat on the mat"),
    (11, "one two three four five six"),
]


def _paras(rows):
    out = []
    for doc_id, text in rows:
        for idx, p in enumerate(re.split(r"\n{2,}", text)):
            p = p.strip()
            if p:
                out.append((doc_id, idx, p))
    return out


def _toks(p):
    return [t for t in re.split(r"\s+", p.lower()) if t]


def _bigrams(paras):
    per = {}
    for doc_id, idx, p in paras:
        t = _toks(p)
        if len(t) >= 2:
            per[(doc_id, idx)] = Counter(zip(t[:-1], t[1:]))
    return per


def _score(per_doc, per_ref, alpha=1.0, backoff=0.4, min_count=1):
    """Python twin of bigram_lm_scores: stupid backoff, sorted-(u,w)
    contribution fold."""
    model = Counter()
    for c in per_ref.values():
        model.update(c)
    model = {k: v for k, v in model.items() if v >= min_count}
    u_tot = Counter()
    uni = Counter()
    for c in per_ref.values():
        for (u, w), n in c.items():
            u_tot[u] += n
            uni[w] += n
    t_total = sum(uni.values())
    v_size = len(uni)
    denom = t_total + alpha * (v_size + 1)
    out = {}
    for key, cnts in per_doc.items():
        s = 0.0
        n = 0
        for (u, w) in sorted(cnts):
            dcnt = cnts[(u, w)]
            if (u, w) in model:
                p = model[(u, w)] / u_tot[u]
            else:
                p = backoff * ((uni.get(w, 0) + alpha) / denom)
            s += dcnt * math.log(p)
            n += dcnt
        out[key] = (n, -s / n)
    return out


def _expected_buckets(rows, ref_rows=None, head=1 / 3, mid=1 / 3, **kw):
    paras = _paras(rows)
    per_doc = _bigrams(paras)
    per_ref = per_doc if ref_rows is None else _bigrams(_paras(ref_rows))
    scores = _score(per_doc, per_ref, **kw)
    ranked = sorted(scores, key=lambda k: (scores[k][1], k))
    n = len(ranked)
    head_cut = math.floor(n * head)
    mid_cut = math.floor(n * (head + mid))
    bucket = {}
    for r, key in enumerate(ranked, start=1):
        bucket[key] = (
            "head" if r <= head_cut else "middle" if r <= mid_cut else "tail"
        )
    out = {}
    for doc_id, idx, p in paras:
        key = (doc_id, idx)
        if key in scores:
            out[key] = (p, scores[key][0], scores[key][1], bucket[key])
        else:
            out[key] = (p, None, None, "short")
    return out


class TestParagraphLmBuckets:
    def test_matches_python_reference_self_fit(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {
            (r["doc_id"], r["para_idx"]): (
                r["para"],
                r["n_bigrams"],
                r["avg_nll"],
                r["bucket"],
            )
            for r in paragraph_lm_buckets(df).collect()
        }
        exp = _expected_buckets(DOCS)
        assert set(got) == set(exp)
        for k in exp:
            assert got[k][0] == exp[k][0]
            assert got[k][1] == exp[k][1]
            if exp[k][2] is None:
                assert got[k][2] is None
            else:
                assert got[k][2] == pytest.approx(exp[k][2], abs=1e-12)
            assert got[k][3] == exp[k][3], k

    def test_matches_python_reference_with_reference_corpus(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        ref = spark.createDataFrame(REF, "doc_id long, text string")
        got = {
            (r["doc_id"], r["para_idx"]): (r["avg_nll"], r["bucket"])
            for r in paragraph_lm_buckets(df, reference=ref).collect()
        }
        exp = _expected_buckets(DOCS, REF)
        assert set(got) == set(exp)
        for k, (_p, _n, nll, b) in exp.items():
            if nll is None:
                assert got[k][0] is None
            else:
                assert got[k][0] == pytest.approx(nll, abs=1e-12)
            assert got[k][1] == b, k

    def test_reference_scores_differ_from_self_fit(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        ref = spark.createDataFrame(REF, "doc_id long, text string")
        self_fit = bigram_lm_scores(df).collect()
        ref_fit = bigram_lm_scores(df, reference=ref).collect()
        s = {r["doc_id"]: r["avg_nll"] for r in self_fit}
        rf = {r["doc_id"]: r["avg_nll"] for r in ref_fit}
        assert set(s) == set(rf)
        assert any(abs(s[d] - rf[d]) > 1e-9 for d in s)

    def test_bad_fracs_raise(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        with pytest.raises(ValueError):
            paragraph_lm_buckets(df, head_frac=0.8, middle_frac=0.5)


class TestCcnetParagraphFilter:
    def test_reassembly_keeps_head_middle_and_short(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {
            r["doc_id"]: (
                r["clean_text"],
                r["n_paras_kept"],
                r["n_paras_dropped"],
            )
            for r in ccnet_paragraph_filter(df).collect()
        }
        exp_buckets = _expected_buckets(DOCS)
        exp = {}
        for doc_id, _text in DOCS:
            kept, dropped = [], 0
            for (d, idx), (p, _n, _nll, b) in sorted(exp_buckets.items()):
                if d != doc_id:
                    continue
                if b in ("head", "middle", "short"):
                    kept.append((idx, p))
                else:
                    dropped += 1
            exp[doc_id] = (
                "\n\n".join(p for _i, p in sorted(kept)),
                len(kept),
                dropped,
            )
        assert got == exp
        # every input document survives, even the empty one
        assert got[4] == ("", 0, 0)

    def test_keep_tail_only_and_drop_short(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        rows = ccnet_paragraph_filter(
            df, keep=("tail",), keep_short=False
        ).collect()
        exp_buckets = _expected_buckets(DOCS)
        n_tail = sum(1 for v in exp_buckets.values() if v[3] == "tail")
        assert sum(r["n_paras_kept"] for r in rows) == n_tail
        assert sum(
            r["n_paras_kept"] + r["n_paras_dropped"] for r in rows
        ) == len(exp_buckets)
