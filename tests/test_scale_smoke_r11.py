"""Opt-in scale smokes for the round-11 machinery (SPARK_GRAFT_SCALE=1).

- Incremental curation at volume probes PERSISTED fingerprints: a 120k-doc
  base run materializes content_fp / para_fps columns in its stage
  parquet; a 2k-doc increment's dedup stages scan the generation parquet
  WITHOUT the text column (asserted on the physical plan at volume — the
  VERDICT r10 "what's wrong" #1 fix), suppress planted duplicates, and
  persist the batch's own fingerprints for the next generation.
- Fuzzy increments at volume probe the STORED band table: a 60k-doc base
  with fuzzy enabled persists its LSH index once; a small increment's
  near-dups against the base drop via the index (ledger shows no
  re-banding of the corpus), and a second increment cache-hits both
  generations' band tables.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE"),
    reason="set SPARK_GRAFT_SCALE=1 to run the r11 scale smokes",
)


def _hash_words(col, salt: int, alphabet: str, n: int = 10):
    """n pseudo-words derived from keyed hashes — every token of every
    document distinct across documents with overwhelming probability,
    so unrelated documents share (almost) no shingles and bands-only
    LSH has no spurious buckets (the r10 smoke's generator)."""
    return F.concat_ws(
        " ",
        *[
            F.translate(
                F.conv(F.xxhash64(col, F.lit(salt * 100 + i)), 10, 4),
                "-0123",
                alphabet,
            )
            for i in range(n)
        ],
    )


def _synth_docs(spark, n, n_partitions=32, salt=0, start=0, boiler=True):
    """n synthetic documents with fully-distinct hash-word bodies; with
    ``boiler`` every 10th doc appends a shared boilerplate paragraph
    (paragraph-dedup work). Disable it for fuzzy smokes — a shared
    paragraph puts real shingle overlap between unrelated documents."""
    base = spark.range(start, start + n, 1, n_partitions).select(
        F.col("id").alias("doc_id")
    )
    body = _hash_words(F.col("doc_id"), salt, "zqvxjkwm")
    if not boiler:
        return base.select("doc_id", body.alias("text"))
    shared = F.lit("subscribe to the newsletter for updates")
    return base.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(body, F.lit("\n\n"), shared),
        )
        .otherwise(body)
        .alias("text"),
    )


def _no_text_read(df, root) -> None:
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and root.replace("\\", "/") in ln
    ]
    assert scans, plan
    for ln in scans:
        assert "text" not in ln.split("ReadSchema:")[-1], ln


def test_increment_probes_fingerprints_at_volume(spark, tmp_path):
    from pylluminator_spark.operators.curate import (
        _stage_inc_dedup_exact,
        _stage_inc_dedup_paragraphs,
        curate_increment,
        curate_pipeline,
    )

    root = str(tmp_path / "m")
    docs = _synth_docs(spark, 120_000)
    base = curate_pipeline(
        spark,
        root,
        docs,
        source_fingerprint="scale-base",
        keep_lang=None,
        min_tokens=3,
        pack_budget=None,
    )
    n_base = base.documents.count()
    assert n_base == 120_000  # unique bodies: nothing deduped away
    # batch: 1k fresh + 1k exact copies of base docs (planted dups)
    fresh = _synth_docs(spark, 1_000, 8, salt=7, start=1_000_000)
    dup_ids = docs.filter(F.col("doc_id") % 120 == 0).limit(1_000)
    dups = dup_ids.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    batch = fresh.unionByName(dups)
    res = curate_increment(
        spark,
        root,
        batch,
        source_fingerprint="scale-day1",
        min_tokens=3,
        max_tokens=100_000,
    )
    out_ids = {r.doc_id for r in res.documents.select("doc_id").collect()}
    assert len(out_ids) == 1_000  # every planted dup suppressed
    assert all(i >= 1_000_000 and i < 2_000_000 for i in out_ids)
    # the batch's own stage parquet persists fingerprints for the next
    # generation
    import pyarrow.parquet as pq

    exact_schema = pq.read_schema(
        next(
            os.path.join(res.stages["inc_dedup_exact"].path, f)
            for f in os.listdir(res.stages["inc_dedup_exact"].path)
            if f.endswith(".parquet")
        )
    )
    assert "content_fp" in exact_schema.names
    # physical-plan assertion AT VOLUME: the incremental stages scan the
    # 120k-doc generation parquet without its text column
    exact = spark.read.parquet(base.stages["dedup_exact"].path)
    paras = spark.read.parquet(base.stages["dedup_paragraphs"].path)
    gate = spark.read.parquet(base.stages["quality_gate"].path)
    kw = dict(text_col="text", doc_col="doc_id")
    _no_text_read(
        _stage_inc_dedup_exact(
            spark, batch, exact, gate, normalize=True, **kw
        ),
        root,
    )
    _no_text_read(
        _stage_inc_dedup_paragraphs(
            spark, batch.select("doc_id", "text"), paras, gate,
            min_chars=0, **kw
        ),
        root,
    )


def test_fuzzy_increment_probes_stored_index_at_volume(spark, tmp_path):
    from pylluminator_spark.operators.curate import (
        curate_increment,
        curate_pipeline,
    )
    from pylluminator_spark.plans.manifest import PipelineManifest

    root = str(tmp_path / "m")
    docs = _synth_docs(spark, 60_000, boiler=False)
    curate_pipeline(
        spark,
        root,
        docs,
        source_fingerprint="scale-fz-base",
        keep_lang=None,
        fuzzy={"threshold": None},  # bands-only: no corpus text read
        min_tokens=3,
        pack_budget=None,
    )
    m = PipelineManifest(spark, root)
    assert len(m.entries_named("fuzzy_bands")) == 1
    # batch: fresh docs + word-order-preserving near-dups of base docs
    # (an extra token appended leaves most shingles intact)
    fresh = _synth_docs(spark, 500, 8, salt=9, start=3_000_000, boiler=False)
    near = (
        docs.filter(F.col("doc_id") % 200 == 0)
        .limit(300)
        .select(
            (F.col("doc_id") + 4_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        )
    )
    res = curate_increment(
        spark,
        root,
        fresh.unionByName(near),
        source_fingerprint="scale-fz-day1",
        fuzzy={"threshold": None},
        min_tokens=3,
        max_tokens=100_000,
    )
    ids = {r.doc_id for r in res.documents.select("doc_id").collect()}
    assert all(i < 4_000_000 for i in ids)  # every near-dup dropped
    assert len(ids) == 500
    # base index reused (no corpus re-banding): exactly base + batch
    m = PipelineManifest(spark, root)
    assert len(m.entries_named("fuzzy_bands")) == 2
    # a second increment cache-hits BOTH generations' band tables:
    # the only new fuzzy_bands materialization is its own batch's
    b2 = _synth_docs(spark, 200, 4, salt=11, start=5_000_000, boiler=False)
    curate_increment(
        spark,
        root,
        b2,
        source_fingerprint="scale-fz-day2",
        fuzzy={"threshold": None},
        min_tokens=3,
        max_tokens=100_000,
    )
    m = PipelineManifest(spark, root)
    assert len(m.entries_named("fuzzy_bands")) == 3
