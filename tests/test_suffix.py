"""Suffix-array machinery vs brute-force Python references.

The module's claim is EXACTNESS (no hash collisions, no stride
quantization), so every test compares against a literal-substring
reference that shares no code with the doubling implementation."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.suffix import (
    exact_substring_dedup,
    exact_substring_spans,
    exact_substring_windows,
    suffix_array,
    suffix_ranks,
)


def _corpus(spark, seed=11, n_docs=12, alpha="ab", length=60):
    rng = random.Random(seed)
    rows = []
    for d in range(n_docs):
        text = "".join(rng.choice(alpha) for _ in range(length))
        rows.append((d, text))
    # plant exact cross-document duplicates (when the corpus is big enough)
    if n_docs > 3 and length >= 40:
        rows[3] = (3, rows[0][1][:25] + rows[3][1][25:])
    if n_docs > 7 and length >= 40:
        rows[7] = (7, rows[7][1][:10] + rows[1][1][5:35] + rows[7][1][40:])
    return rows, spark.createDataFrame(rows, ["doc_id", "text"])


def _flag_ref(rows, L, keep_first):
    """Brute force: group literal L-grams, flag non-first occurrences."""
    grams = {}
    for d, t in rows:
        for i in range(1, len(t) - L + 2):
            grams.setdefault(t[i - 1 : i - 1 + L], []).append((d, i))
    flagged = set()
    for occ in grams.values():
        if len(occ) < 2:
            continue
        first = min(occ)
        for o in occ:
            if keep_first and o == first:
                continue
            flagged.add(o)
    return flagged


def test_suffix_array_matches_python_sort(spark):
    rows, df = _corpus(spark, n_docs=5, length=40)
    got = {
        (r.doc_id, r.pos): r.sa_rank for r in suffix_array(df).collect()
    }
    for d, t in rows:
        order = sorted(range(1, len(t) + 1), key=lambda i: t[i - 1 :])
        for rank, pos in enumerate(order, start=1):
            assert got[(d, pos)] == rank, (d, pos)


@pytest.mark.parametrize("L", [2, 7, 15, 16])
@pytest.mark.parametrize("keep_first", [True, False])
def test_flagged_windows_match_bruteforce(spark, L, keep_first):
    rows, df = _corpus(spark)
    got = {
        (r.doc_id, r.pos)
        for r in exact_substring_windows(
            df, L, keep_first=keep_first
        ).collect()
    }
    assert got == _flag_ref(rows, L, keep_first)


def test_spans_are_merged_maximal_islands(spark):
    rows, df = _corpus(spark)
    L = 12
    flagged = _flag_ref(rows, L, keep_first=True)
    # reference island merge
    ref = set()
    by_doc: dict[int, list[int]] = {}
    for d, i in flagged:
        by_doc.setdefault(d, []).append(i)
    for d, ps in by_doc.items():
        ps.sort()
        start, end, n = ps[0], ps[0] + L, 1
        for i in ps[1:]:
            if i <= end:
                end, n = i + L, n + 1
            else:
                ref.add((d, start, end, n))
                start, end, n = i, i + L, 1
        ref.add((d, start, end, n))
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in exact_substring_spans(df, L).collect()
    }
    assert got == ref


def test_dedup_excises_exactly_the_spans(spark):
    rows, df = _corpus(spark)
    L = 12
    spans = {
        (r.doc_id): []
        for r in exact_substring_spans(df, L).collect()
    }
    for r in exact_substring_spans(df, L).collect():
        spans[r.doc_id].append((r.span_start, r.span_end))
    out = {r.doc_id: r.deduped for r in exact_substring_dedup(df, L).collect()}
    for d, t in rows:
        if d not in spans:
            assert out[d] == t
            continue
        kept, cur = [], 1
        for s, e in sorted(spans[d]):
            kept.append(t[cur - 1 : s - 1])
            cur = e
        kept.append(t[cur - 1 :])
        assert out[d] == "".join(kept), d
    # at least one doc actually shrank (the planted duplicates)
    assert any(len(out[d]) < len(t) for d, t in rows)


def test_ranks_group_equal_substrings_only(spark):
    rows, df = _corpus(spark, alpha="abc", length=30, n_docs=6)
    ranks, w = suffix_ranks(df, width=8)
    texts = dict(rows)
    sub = {}
    for r in ranks.collect():
        t = texts[r._doc]
        sub.setdefault(r._rank, set()).add(t[r._pos - 1 : r._pos - 1 + w])
    # a rank class contains exactly one literal width-w substring
    assert all(len(v) == 1 for v in sub.values())
    # and distinct rank classes hold distinct substrings of FULL width
    full = {
        rk: next(iter(v)) for rk, v in sub.items() if len(next(iter(v))) == w
    }
    assert len(set(full.values())) == len(full)


def test_suffix_array_max_width_cap_raises_on_residual_ties(spark):
    """ADVICE r7: if max_width halts doubling while in-document
    duplicate ranks remain, the result would be silently
    non-lexicographic — it must raise instead."""
    from pylluminator_spark.operators.suffix import _BASE_WIDTH

    docs = spark.createDataFrame([(0, "a" * (3 * _BASE_WIDTH))], ["doc_id", "text"])
    with pytest.raises(ValueError, match="max_width"):
        suffix_array(docs, max_width=_BASE_WIDTH)
    # and a cap that is never the binding constraint still succeeds
    out = suffix_array(docs, max_width=1 << 20)
    assert out.count() == 3 * _BASE_WIDTH


class TestCrossCorpusDecontamination:
    TRAIN = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completely original training text with nothing shared"),
        (3, "benchmark sentence alpha is hidden inside this document"),
    ]
    BENCH = [
        # shares "the quick brown fox jumps" with train doc 1 and
        # "benchmark sentence alpha" with train doc 3; doc_id collides
        # with train doc 1 on purpose (corpora are tagged internally)
        (1, "we evaluate on the quick brown fox jumps test set"),
        (2, "benchmark sentence alpha and benchmark sentence beta"),
    ]

    @staticmethod
    def _expected_spans(train, bench, L):
        bench_windows = set()
        for _i, t in bench:
            for p in range(len(t) - L + 1):
                bench_windows.add(t[p:p + L])
        spans = {}
        for did, t in train:
            flagged = [
                p + 1  # 1-based
                for p in range(len(t) - L + 1)
                if t[p:p + L] in bench_windows
            ]
            cur = []
            for p in flagged:
                if cur and p <= cur[-1][1] - L + (L - 1) and p <= cur[-1][1]:
                    cur[-1] = (cur[-1][0], max(cur[-1][1], p + L), cur[-1][2] + 1)
                elif cur and p <= cur[-1][1]:
                    cur[-1] = (cur[-1][0], max(cur[-1][1], p + L), cur[-1][2] + 1)
                else:
                    cur.append((p, p + L, 1))
            if cur:
                spans[did] = cur
        return spans

    def test_spans_match_bruteforce(self, spark):
        from pylluminator_spark.operators.suffix import cross_substring_spans

        L = 15
        train = spark.createDataFrame(self.TRAIN, "doc_id long, text string")
        bench = spark.createDataFrame(self.BENCH, "doc_id long, text string")
        got = {}
        for r in cross_substring_spans(train, bench, L).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_end"], r["n_windows"])
            )
        for k in got:
            got[k].sort()
        exp = self._expected_spans(self.TRAIN, self.BENCH, L)
        assert got == exp
        # sanity on the planted phenomena: docs 1 and 3 contaminated,
        # doc 2 clean
        assert set(got) == {1, 3}

    def test_excision_removes_exactly_the_spans(self, spark):
        from pylluminator_spark.operators.suffix import decontaminate_spans

        L = 15
        train = spark.createDataFrame(self.TRAIN, "doc_id long, text string")
        bench = spark.createDataFrame(self.BENCH, "doc_id long, text string")
        got = {
            r["doc_id"]: r["deduped"]
            for r in decontaminate_spans(train, bench, L).collect()
        }
        exp_spans = self._expected_spans(self.TRAIN, self.BENCH, L)
        for did, t in self.TRAIN:
            if did not in exp_spans:
                assert got[did] == t
            else:
                kept, cur = [], 0
                for s, e, _n in exp_spans[did]:
                    kept.append(t[cur:s - 1])
                    cur = e - 1
                kept.append(t[cur:])
                assert got[did] == "".join(kept), did
        # every train doc survives
        assert set(got) == {d for d, _t in self.TRAIN}

    def test_no_bench_overlap_survives(self, spark):
        # after excision, NO length-L window of any cleaned train doc
        # appears in the bench corpus
        from pylluminator_spark.operators.suffix import decontaminate_spans

        L = 15
        train = spark.createDataFrame(self.TRAIN, "doc_id long, text string")
        bench = spark.createDataFrame(self.BENCH, "doc_id long, text string")
        cleaned = {
            r["doc_id"]: r["deduped"]
            for r in decontaminate_spans(train, bench, L).collect()
        }
        bench_windows = set()
        for _i, t in self.BENCH:
            for p in range(len(t) - L + 1):
                bench_windows.add(t[p:p + L])
        for t in cleaned.values():
            for p in range(len(t) - L + 1):
                assert t[p:p + L] not in bench_windows
