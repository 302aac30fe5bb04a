"""Randomized property tests: custom operators vs brute-force oracles.

Each test draws seeded random inputs (several seeds, adversarial shapes:
multi-bucket spans, duplicate rows, touching/zero-length/nested intervals)
and compares the distributed operator against an exact pandas/python oracle.
One Spark job per seed keeps runtime bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.range_join import (
    cluster_overlaps,
    count_overlaps,
    range_join,
    subtract_overlaps,
)


def _random_intervals(rng, n, max_pos=2000, max_len=400, n_chrom=3, dup_frac=0.1):
    start = rng.integers(0, max_pos, n)
    length = rng.integers(0, max_len, n)  # 0-length => start == end (closed)
    chrom = rng.integers(1, n_chrom + 1, n)
    pdf = pd.DataFrame(
        {
            "chromosome": [f"chr{c}" for c in chrom],
            "start": start.astype("int64"),
            "end": (start + length).astype("int64"),
        }
    )
    # inject exact duplicates to exercise join multiplicity
    n_dup = int(n * dup_frac)
    if n_dup:
        pdf = pd.concat([pdf, pdf.iloc[:n_dup]], ignore_index=True)
    return pdf


def _brute_pairs(lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
    m = lp.assign(_k=1).merge(
        rp.assign(_k=1), on=["_k", "chromosome"], suffixes=("_l", "_r")
    )
    return m[(m.start_l <= m.end_r) & (m.end_l >= m.start_r)]


@pytest.mark.parametrize("seed,bucket", [(0, 100), (1, 50), (2, 1000), (3, 137)])
def test_range_join_matches_brute_force(spark, seed, bucket):
    rng = np.random.default_rng(seed)
    lp = _random_intervals(rng, 120)
    rp = _random_intervals(rng, 150)
    lp["lid"] = range(len(lp))
    rp["rid"] = range(len(rp))
    got = (
        range_join(
            spark.createDataFrame(lp),
            spark.createDataFrame(rp),
            bucket=bucket,
        )
        .select("lid", "rid")
        .toPandas()
    )
    exp = _brute_pairs(lp, rp)[["lid", "rid"]]
    got_set = sorted(map(tuple, got.itertuples(index=False)))
    exp_set = sorted(map(tuple, exp.itertuples(index=False)))
    assert got_set == exp_set  # each overlapping pair exactly once


@pytest.mark.parametrize("seed", [0, 7])
def test_range_join_semi_anti_partition_left(spark, seed):
    rng = np.random.default_rng(seed)
    lp = _random_intervals(rng, 100)
    rp = _random_intervals(rng, 40, max_pos=1000)
    lp["lid"] = range(len(lp))
    l_df, r_df = spark.createDataFrame(lp), spark.createDataFrame(rp)
    semi = range_join(l_df, r_df, bucket=64, how="left_semi").toPandas()
    anti = range_join(l_df, r_df, bucket=64, how="left_anti").toPandas()
    matched = set(_brute_pairs(lp, rp)["lid"])
    assert sorted(semi["lid"]) == sorted(matched)
    assert sorted(anti["lid"]) == sorted(set(lp["lid"]) - matched)
    # semi + anti is a partition of the left table
    assert len(semi) + len(anti) == len(lp)


@pytest.mark.parametrize("seed", [0, 5])
def test_count_overlaps_keeps_zero_rows(spark, seed):
    rng = np.random.default_rng(seed)
    bins = pd.DataFrame(
        {
            "chromosome": ["chr1"] * 10 + ["chr2"] * 10,
            "start": list(np.arange(10) * 200) * 2,
        }
    ).astype({"start": "int64"})
    bins["end"] = bins["start"] + 199
    bins["bid"] = range(len(bins))
    pts = _random_intervals(rng, 80, max_pos=1800, max_len=50, n_chrom=2, dup_frac=0)
    got = (
        count_overlaps(
            spark.createDataFrame(bins),
            spark.createDataFrame(pts),
            group_cols=["bid"],
            bucket=128,
        )
        .select("bid", "n_overlaps")
        .toPandas()
        .set_index("bid")["n_overlaps"]
    )
    exp = _brute_pairs(bins.rename(columns={}), pts).groupby("bid").size()
    for bid in bins["bid"]:
        assert got[bid] == exp.get(bid, 0), bid
    assert len(got) == len(bins)  # zero-count bins retained


@pytest.mark.parametrize("seed,slack", [(0, 1), (1, 0), (2, 25)])
def test_cluster_overlaps_matches_brute_force(spark, seed, slack):
    rng = np.random.default_rng(seed)
    pdf = _random_intervals(rng, 150, max_pos=1500, max_len=120, dup_frac=0)
    got = (
        cluster_overlaps(spark.createDataFrame(pdf), slack=slack)
        .toPandas()
        .sort_values(["chromosome", "start", "end"])
        .reset_index(drop=True)
    )

    def brute(group):
        group = group.sort_values(["start", "end"]).reset_index(drop=True)
        cid, max_end, out = 0, None, []
        for _, r in group.iterrows():
            if max_end is None or r["start"] > max_end + slack:
                cid += 1
                max_end = r["end"]
            else:
                max_end = max(max_end, r["end"])
            out.append(cid)
        group["cid"] = out
        return group

    exp = (
        pdf.groupby("chromosome", group_keys=False)[pdf.columns]
        .apply(brute)
        .sort_values(["chromosome", "start", "end"])
        .reset_index(drop=True)
    )
    # cluster ids are labels: compare the induced partitions
    got_part = [
        frozenset(zip(g.chromosome, g.start, g.end))
        for _, g in got.groupby("cluster_id")
    ]
    exp_part = [
        frozenset(zip(g.chromosome, g.start, g.end))
        for _, g in exp.groupby(["chromosome", "cid"])
    ]
    assert sorted(got_part, key=str) == sorted(exp_part, key=str)


@pytest.mark.parametrize("seed", [0, 3, 11])
def test_subtract_overlaps_matches_coverage_mask(spark, seed):
    rng = np.random.default_rng(seed)
    tiles = _random_intervals(rng, 60, max_pos=1200, max_len=300, dup_frac=0)
    tiles = tiles.drop_duplicates(["chromosome", "start", "end"]).reset_index(
        drop=True
    )
    gaps = _random_intervals(rng, 25, max_pos=1300, max_len=150, dup_frac=0)
    got = (
        subtract_overlaps(spark.createDataFrame(tiles), spark.createDataFrame(gaps))
        .toPandas()
        .groupby("chromosome")
        .apply(
            lambda g: sorted(zip(g.start, g.end)), include_groups=False
        )
        .to_dict()
    )

    # oracle: per chromosome, boolean coverage mask over positions
    exp: dict[str, list[tuple[int, int]]] = {}
    for chrom, tg in tiles.groupby("chromosome"):
        mask_len = 3000
        covered = np.zeros(mask_len, dtype=bool)
        for _, g in gaps[gaps.chromosome == chrom].iterrows():
            covered[g["start"] : g["end"] + 1] = True
        pieces = []
        for _, tile in tg.iterrows():
            run_start = None
            for pos in range(tile["start"], tile["end"] + 2):
                free = pos <= tile["end"] and not covered[pos]
                if free and run_start is None:
                    run_start = pos
                elif not free and run_start is not None:
                    pieces.append((run_start, pos - 1))
                    run_start = None
        exp[chrom] = sorted(pieces)
    for chrom in set(exp) | set(got):
        assert got.get(chrom, []) == exp.get(chrom, []), chrom


# ---------------------------------------------------------------------------
# JPEG codec properties (operators/jpeg.py) — randomized over seeds/shapes
# ---------------------------------------------------------------------------

def test_jpeg_randomized_invariants():
    """Three invariants over random images and shapes:
    1. progressive decode == sequential decode BIT-EXACT (same quantized
       coefficients -> any scan-machinery bug shows up);
    2. restart-marker streams decode identically to unsegmented ones;
    3. per-8x8-block mean is preserved within the DC quantization step
       (high-frequency content is lossy by design, the DC term is not).
    """
    from pylluminator_spark.operators.jpeg import (
        _scale_q,
        STD_LUMA_Q,
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    for seed in range(6):
        rng = np.random.default_rng(seed)
        h = int(rng.integers(8, 50))
        w = int(rng.integers(8, 50))
        q = int(rng.choice([60, 85, 95]))
        gray = rng.integers(0, 256, (h, w), dtype=np.uint8)

        seq = decode_jpeg(encode_jpeg(gray, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(gray, quality=q))
        np.testing.assert_array_equal(prog, seq, err_msg=f"seed={seed}")

        rst = decode_jpeg(encode_jpeg(gray, quality=q, restart_interval=2))
        np.testing.assert_array_equal(rst, seq, err_msg=f"seed={seed} rst")

        # block-mean preservation: DC quantizer bounds the mean shift
        q0 = float(_scale_q(STD_LUMA_Q, q)[0])
        bh, bw2 = h // 8, w // 8
        for by in range(bh):
            for bx in range(bw2):
                a = gray[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                b = seq[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
                dc_err = abs(float(a.mean()) - float(b.mean()))
                # half a DC step (q0/8 in pixel units) + IDCT/clip rounding
                assert dc_err <= q0 / 16.0 + 1.0, (seed, by, bx, dc_err)


# ---------------------------------------------------------------------------
# Corpus operators: randomized text vs pure-python oracles
# ---------------------------------------------------------------------------


def _random_docs(rng, n_docs=40, vocab=12, min_len=0, max_len=60):
    words = [f"w{i}" for i in range(vocab)]
    docs = []
    for d in range(n_docs):
        ln = int(rng.integers(min_len, max_len + 1))
        docs.append((d, " ".join(rng.choice(words, ln))))
    # plant exact duplicates and shared blocks to exercise repeats
    if n_docs >= 4:
        docs[1] = (1, docs[0][1])
        shared = " ".join(rng.choice(words, 12))
        docs[2] = (2, shared + " " + docs[2][1])
        docs[3] = (3, docs[3][1] + " " + shared)
    return docs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_gopher_and_repetition_random_docs(spark, seed):
    from collections import Counter

    from pylluminator_spark.operators.corpus import (
        gopher_signals,
        repetition_stats,
    )

    rng = np.random.default_rng(seed)
    docs = _random_docs(rng)
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    sig = {r.doc_id: r for r in gopher_signals(df).collect()}
    rep = {r.doc_id: r for r in repetition_stats(df, n=2).collect()}
    for d, text in docs:
        toks = [t for t in text.lower().split() if t]
        if not toks:
            assert d not in sig  # zero-token docs emit no signal row
            assert rep[d].n_ngrams == 0
            continue
        c = Counter(toks)
        assert sig[d].n_words == len(toks)
        assert sig[d].n_distinct == len(c)
        assert 0.0 <= sig[d].dup_word_fraction < 1.0
        assert sig[d].top_word_fraction == pytest.approx(
            max(c.values()) / len(toks)
        )
        grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        assert rep[d].n_ngrams == len(grams)
        if grams:
            g = Counter(grams)
            assert rep[d].dup_ngram_fraction == pytest.approx(
                1 - len(g) / len(grams)
            )


@pytest.mark.parametrize("seed", [0, 1])
def test_repeated_spans_random_docs(spark, seed):
    from pylluminator_spark.operators.corpus import repeated_spans

    rng = np.random.default_rng(seed)
    docs = _random_docs(rng, n_docs=30, vocab=6, min_len=10, max_len=50)
    w, s = 12, 4
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    spans = {}
    for d, t in docs:
        for i in range((len(t) - w) // s + 1 if len(t) >= w else 0):
            spans.setdefault(t[i * s : i * s + w], set()).add(d)
    want = {
        (d, i * s)
        for d, t in docs
        if len(t) >= w
        for i in range((len(t) - w) // s + 1)
        if len(spans[t[i * s : i * s + w]]) >= 2
    }
    got = {
        (r.doc_id, r.offset)
        for r in repeated_spans(
            df, window=w, stride=s, min_docs=2, fingerprint=True
        ).collect()
    }
    assert got == want
    # exact duplicate docs (0 and 1) must have every span flagged
    t0 = docs[0][1]
    if len(t0) >= w:
        n_spans_0 = (len(t0) - w) // s + 1
        assert sum(1 for d, _ in got if d == 0) == n_spans_0


@pytest.mark.parametrize("seed", [0, 1])
def test_unigram_lm_random_docs(spark, seed):
    import math
    from collections import Counter

    from pylluminator_spark.operators.corpus import unigram_lm_scores

    rng = np.random.default_rng(seed)
    docs = [(d, t) for d, t in _random_docs(rng) if t.split()]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    vocab = Counter(t for _, text in docs for t in text.lower().split())
    T, V = sum(vocab.values()), len(vocab)
    got = {r.doc_id: r.avg_nll for r in unigram_lm_scores(df).collect()}
    for d, text in docs:
        toks = text.lower().split()
        nll = -sum(
            math.log((vocab[t] + 1.0) / (T + V + 1.0)) for t in toks
        ) / len(toks)
        assert got[d] == pytest.approx(nll)
        assert got[d] > 0  # probabilities < 1 => NLL strictly positive


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_incremental_dedup_equals_union_dedup(spark, seed):
    """Randomized equivalence: when every batch id sorts after every
    existing id, dedup_exact_against(batch, existing) must equal the
    batch-id rows of dedup_exact(existing UNION batch) — the min-id
    winner rule makes the incremental and one-shot formulations
    interchangeable. Same for the paragraph operators. Small vocabulary
    and short docs force plenty of cross- and within-set collisions."""
    from pylluminator_spark.operators.cleanup import (
        dedup_paragraphs,
        dedup_paragraphs_against,
    )
    from pylluminator_spark.operators.dedup import (
        dedup_exact,
        dedup_exact_against,
    )

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(10)]

    def _doc():
        return " ".join(rng.choice(vocab, rng.integers(2, 5)))

    existing = spark.createDataFrame(
        [(i, _doc()) for i in range(40)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        [(100 + i, _doc()) for i in range(30)], ["doc_id", "text"]
    )
    inc = {
        r.doc_id for r in dedup_exact_against(batch, existing).collect()
    }
    union_surv = {
        r.doc_id
        for r in dedup_exact(existing.unionByName(batch)).collect()
        if r.doc_id >= 100
    }
    assert inc == union_surv

    def _pdoc():
        return "\n\n".join(_doc() for _ in range(rng.integers(1, 4)))

    p_existing = spark.createDataFrame(
        [(i, _pdoc()) for i in range(25)], ["doc_id", "text"]
    )
    p_batch = spark.createDataFrame(
        [(100 + i, _pdoc()) for i in range(20)], ["doc_id", "text"]
    )
    inc_p = {
        r.doc_id: (r.clean_text, r.n_paras_kept, r.n_paras_dropped)
        for r in dedup_paragraphs_against(p_batch, p_existing).collect()
    }
    union_p = {
        r.doc_id: (r.clean_text, r.n_paras_kept, r.n_paras_dropped)
        for r in dedup_paragraphs(
            p_existing.unionByName(p_batch)
        ).collect()
        if r.doc_id >= 100
    }
    assert inc_p == union_p
