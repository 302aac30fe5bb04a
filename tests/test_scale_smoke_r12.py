"""Opt-in scale smokes for the round-12 machinery (SPARK_GRAFT_SCALE=1).

- Bands-only fuzzy dedup under pathological bucket skew: a planted
  10k-member template family (byte-identical docs -> every band bucket
  holds all 10k) amid 50k distinct docs. The r12 per-bucket-min rewrite
  keeps this LINEAR in the band table; the old bucket self-join would
  enumerate ~10k^2/2 pairs per band (~800M rows at 16 bands) before the
  distinct. Plan-asserted: exactly one (anti) join, no pair distinct.
- Fuzzy increments probe each generation's PERSISTED gate-filtered band
  stage (gate_bands): a 60k-doc base materializes it once; the
  increment's fuzzy plan scans ONLY band-schema parquet of the
  generation (never its gate or text — the r11 semi join is gone), and
  the increment's own gate_bands is added for the next generation.
"""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE"),
    reason="set SPARK_GRAFT_SCALE=1 to run the r12 scale smokes",
)

from test_scale_smoke_r11 import _synth_docs  # noqa: E402

_JOIN_RE = (
    r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"
    r"|BroadcastNestedLoopJoin|CartesianProduct"
)


def test_bands_only_hot_bucket_linear_at_volume(spark):
    from pylluminator_spark.operators.curate import _stage_fuzzy_dedup
    from pylluminator_spark.operators.dedup import (
        lsh_band_table,
        minhash_signature,
    )

    distinct = _synth_docs(spark, 50_000, boiler=False)
    family = spark.range(10_000).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.lit(
            "identical quarterly compliance boilerplate body repeated "
            "verbatim across every document of the scraped template "
            "family with no variation at all"
        ).alias("text"),
    )
    docs = distinct.unionByName(family)
    bands_tbl = lsh_band_table(
        minhash_signature(docs, "text", 64, 3), bands=16
    )
    out = _stage_fuzzy_dedup(
        spark, docs, bands_tbl,
        text_col="text", doc_col="doc_id",
        shingle_size=3, threshold=None,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the optimizer may push the single anti join below the input
    # Union (one copy per branch) — what must NOT appear is any
    # non-anti join (the bucket self-join of the pair formulation)
    join_lines = [
        ln for ln in plan.splitlines() if re.search(_JOIN_RE, ln)
    ]
    assert join_lines
    for ln in join_lines:
        assert "LeftAnti" in ln, f"non-anti join in bands-only plan: {ln}"
    n = out.count()
    # 50k distinct survive; the 10k family keeps exactly its min id
    assert n == 50_001
    assert (
        out.filter(F.col("doc_id") >= 1_000_000).count() == 1
    )


def test_inc_fuzzy_gate_bands_one_scan_at_volume(spark, tmp_path):
    from pylluminator_spark.operators.curate import (
        _stage_inc_fuzzy_dedup,
        curate_increment,
        curate_pipeline,
    )
    from pylluminator_spark.operators.dedup import (
        lsh_band_table,
        minhash_signature,
    )
    from pylluminator_spark.plans.manifest import PipelineManifest

    root = str(tmp_path / "m")
    docs = _synth_docs(spark, 60_000, boiler=False)
    base = curate_pipeline(
        spark,
        root,
        docs,
        source_fingerprint="r12-gb-base",
        keep_lang=None,
        fuzzy={"threshold": None},
        min_tokens=3,
        pack_budget=None,
    )
    m = PipelineManifest(spark, root)
    assert len(m.entries_named("gate_bands")) == 1  # built by the base
    fresh = _synth_docs(spark, 500, 8, salt=13, start=7_000_000,
                        boiler=False)
    near = (
        docs.filter(F.col("doc_id") % 300 == 0)
        .limit(150)
        .select(
            (F.col("doc_id") + 8_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        )
    )
    batch = fresh.unionByName(near)
    # plan assertion AT VOLUME on the stage function itself: the only
    # generation parquet the bands-only increment reads is gate_bands
    # (band schema) — no gate read, no text read, no band ⋉ gate join
    bb = lsh_band_table(
        minhash_signature(batch, "text", 64, 3), bands=16
    )
    out = _stage_inc_fuzzy_dedup(
        spark, batch, bb,
        spark.read.parquet(base.stages["gate_bands"].path),
        spark.read.parquet(base.stages["dedup_exact"].path),
        spark.read.parquet(base.stages["quality_gate"].path),
        text_col="text", doc_col="doc_id",
        shingle_size=3, threshold=None,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    gen_scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and root.replace("\\", "/") in ln
    ]
    assert gen_scans
    for ln in gen_scans:
        schema = ln.split("ReadSchema:")[-1]
        assert "text" not in schema and "n_tokens" not in schema, ln
        assert "_band" in schema, f"non-band generation scan: {ln}"
    ids = {r.doc_id for r in out.select("doc_id").collect()}
    assert len(ids) == 500 and all(i < 8_000_000 for i in ids)
    # the composed increment wires the same probe and persists its own
    # gate_bands for the next generation (base's is a pure cache hit)
    res = curate_increment(
        spark,
        root,
        batch,
        source_fingerprint="r12-gb-day1",
        fuzzy={"threshold": None},
        min_tokens=3,
        max_tokens=100_000,
    )
    got = {r.doc_id for r in res.documents.select("doc_id").collect()}
    assert got == ids
    m = PipelineManifest(spark, root)
    assert len(m.entries_named("gate_bands")) == 2
