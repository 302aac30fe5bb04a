"""Incremental LSH ingest: lsh_incremental_candidates over a (new batch,
stored index) split must equal the full lsh_candidate_pairs over the
union RESTRICTED to pairs that involve a new document — same hash
function, same bands, so the equality is exact and deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from pylluminator_spark.operators.dedup import (
    lsh_band_table,
    lsh_candidate_pairs,
    lsh_incremental_candidates,
    minhash_signature,
)


def _sig_corpus(spark, n, dup_stride):
    # doc i and i+dup_stride share text (=> identical signatures)
    base = spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.substring(
                    F.md5(
                        F.concat(
                            ((F.col("id") % dup_stride)).cast("string"),
                            F.lit(f"w{k}"),
                        )
                    ),
                    1,
                    8,
                )
                for k in range(12)
            ],
        ).alias("text"),
    )
    return minhash_signature(base)


def test_incremental_equals_full_restricted_to_new(spark):
    sigs = _sig_corpus(spark, 60, 20).persist()
    index_sigs = sigs.filter(F.col("doc_id") < 40)
    new_sigs = sigs.filter(F.col("doc_id") >= 40)

    full = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, bands=8).collect()
    }
    want = {(a, b) for a, b in full if a >= 40 or b >= 40}
    assert want, "fixture must produce cross-batch duplicate pairs"

    got = {
        (r.id_a, r.id_b)
        for r in lsh_incremental_candidates(
            lsh_band_table(new_sigs, bands=8),
            lsh_band_table(index_sigs, bands=8),
        ).collect()
    }
    assert got == want
    # and no index-vs-index pair leaks through
    assert all(a >= 40 or b >= 40 for a, b in got)


def test_band_table_is_the_shared_primitive(spark):
    sigs = _sig_corpus(spark, 30, 10)
    via_table = lsh_band_table(sigs, bands=8)
    a = via_table.select(
        "_band", "_band_hash", F.col("doc_id").alias("id_a")
    )
    b = via_table.select(
        "_band", "_band_hash", F.col("doc_id").alias("id_b")
    )
    rebuilt = {
        (r.id_a, r.id_b)
        for r in a.join(b, ["_band", "_band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .collect()
    }
    direct = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, bands=8).collect()
    }
    assert rebuilt == direct


def test_empty_new_batch_yields_no_candidates(spark):
    sigs = _sig_corpus(spark, 20, 5)
    empty = sigs.filter(F.lit(False))
    got = lsh_incremental_candidates(
        lsh_band_table(empty), lsh_band_table(sigs)
    ).count()
    assert got == 0
