"""Gate-strength regressions: entries whose hash match would be vacuous
on degenerate output must produce NON-degenerate output at every test SF
(VERDICT r7 "what's wrong" #2: interval_anti_join hash-matched on 0 rows
for six rounds — both engines merely agreed on emptiness)."""

from __future__ import annotations

import pytest

import __spark_entry__ as em

SF = "/root/testdata/sf0.001"


def test_interval_anti_join_has_empty_bins(spark):
    rows = em.queries()["interval_anti_join"](spark, SF).collect()
    assert len(rows) > 0, "anti-join produced no chromosomes"
    assert all(r["n_empty_bins"] > 0 for r in rows), rows


def test_langid_gate_scores_carry_signal(spark):
    """The synthetic documents' TEXT is the same token soup for every
    lang label (labels are random), so a correct NB classifier predicts
    the majority prior for ~every doc — pred_lang is expected-constant
    on this fixture and carries little hash signal BY THE DATA'S DOING.
    The gate's real surface is the score column (and the langid_scores
    entry hashing all 5 per-language scores): assert scores vary across
    documents, i.e. the hash is not matching on a constant."""
    rows = em.queries()["langid_predict"](spark, SF).collect()
    assert len(rows) > 0
    assert len({r["score"] for r in rows}) > len(rows) // 2
    srows = em.queries()["langid_scores"](spark, SF).collect()
    per_doc_langs = {}
    for r in srows:
        per_doc_langs.setdefault(r["doc_id"], set()).add(r["score"])
    # within a document the 5 language scores are not all identical
    assert sum(1 for s in per_doc_langs.values() if len(s) >= 2) > 0


def test_gated_entries_nonempty(spark):
    """Every r8 gate slot must return at least one row at the smallest
    SF — a 0-row hash match only proves agreement on emptiness. Cheap
    subset: the entries with the smallest historical outputs."""
    for name in (
        "mask_builders",
        "beta_distribution",
        "explode_tokens",
        "top_intensity_median",
    ):
        assert em.queries()[name](spark, SF).count() > 0, name


def test_r10_debut_entries_carry_signal(spark):
    """The r10 incremental-curation debuts must do real work at the
    smallest SF, not hash-match on emptiness or passthrough.
    stream_dedup_inc is the cautionary tale: with a mid-month store
    cutoff every key pair already existed and the entry hash-matched on
    0 rows — the cutoff was moved to Jan 5 so keys genuinely first
    appear after the store snapshot at every SF."""
    rows = em.queries()["stream_dedup_inc"](spark, SF).collect()
    assert len(rows) > 0, "store cutoff regressed to a degenerate 0-row gate"
    # exact-inc: both drop paths exercised — batch survivors exist AND
    # planted corpus/batch duplicates were dropped (fewer rows than the
    # raw batch)
    inc = em.queries()["dedup_exact_inc"](spark, SF)
    n = inc.count()
    assert n > 0
    import pyspark.sql.functions as F

    docs = em._t(spark, SF, "documents")
    raw_batch = (
        docs.filter(F.col("doc_id") % 3 == 0).count()
        + docs.filter(F.col("doc_id") % 11 == 1).count()
        + docs.filter(
            (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 13 == 2)
        ).count()
    )
    assert n < raw_batch
    # paragraph-inc: suppression happened (some doc dropped paragraphs)
    pinc = em.queries()["dedup_paragraphs_inc"](spark, SF)
    assert pinc.filter(F.col("n_paras_dropped") > 0).count() > 0
    # curate gate: survivors exist AND are fewer than the injected
    # input (docs plus the planted doc_id % 7 duplicates) — equality
    # would mean a passthrough gate doing no dedup/filter work
    cur = em.queries()["curate_corpus"](spark, SF)
    n_cur = cur.count()
    n_injected = (
        docs.count() + docs.filter(F.col("doc_id") % 7 == 0).count()
    )
    assert 0 < n_cur < n_injected


def test_dedup_fuzzy_inc_carries_signal(spark):
    """The r11 incremental-LSH debut must exercise BOTH paths at the
    smallest SF: batch survivors exist (not hash-matching on
    emptiness) AND near-duplicates were dropped (fewer survivors than
    the raw batch — the planted upper-cased copies have token-set
    Jaccard 1.0 and must always drop)."""
    import pyspark.sql.functions as F

    out = em.queries()["dedup_fuzzy_inc"](spark, SF)
    n = out.count()
    assert n > 0, "degenerate 0-row fuzzy gate"
    docs = em._t(spark, SF, "documents").filter(F.col("doc_id") < 60)
    d = F.col("doc_id")
    raw_batch = (
        docs.filter((d % 3 != 0) & (d % 4 == 1)).count()
        + docs.filter(d % 3 == 0).count()
        + docs.filter((d % 3 == 0) & (d % 5 == 2)).count()
    )
    assert n < raw_batch, "no near-duplicate was dropped"
