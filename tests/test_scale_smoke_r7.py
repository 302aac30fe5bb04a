"""Opt-in scale smokes for the round-7 machinery (SPARK_GRAFT_SCALE=1).

- suffix stack at corpus volume: 1.5M characters (full sf0.1 documents)
  through the prefix-doubling rank rounds — every dense rank takes the
  DISTRIBUTED two-phase path (well past SMALL_INPUT_ROWS), rounds
  localCheckpoint, spans must stay inside their documents.
- manifest store over a wide synthetic stage output: cache round-trip
  at 1M rows.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE"),
    reason="set SPARK_GRAFT_SCALE=1 to run the r7 scale smokes",
)

SF01 = "/root/testdata/sf0.1"


def test_exact_substring_spans_at_corpus_volume(spark):
    from pylluminator_spark.operators.suffix import exact_substring_spans

    docs = spark.read.parquet(f"{SF01}/documents.parquet").select(
        "doc_id", "text"
    )
    n_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
    assert n_chars > 1_000_000  # the rank rounds must take the scale path

    t0 = time.perf_counter()
    spans = exact_substring_spans(docs, 25, keep_first=True)
    joined = spans.join(
        docs.select("doc_id", F.length("text").alias("_len")), "doc_id"
    )
    bad = joined.filter(
        (F.col("span_start") < 1)
        | (F.col("span_end") > F.col("_len") + 1)
        | (F.col("span_end") <= F.col("span_start"))
    ).count()
    n = spans.count()
    elapsed = time.perf_counter() - t0
    print(f"\n1.5M-char exact-substr spans: {n} spans in {elapsed:.1f}s")
    assert bad == 0
    assert n > 0  # the synthetic corpus is repetitive by construction
    assert elapsed < 600


def test_manifest_cache_roundtrip_at_1m_rows(spark, tmp_path):
    from pylluminator_spark.plans.manifest import PipelineManifest

    src_dir = str(tmp_path / "src")
    spark.range(1_000_000, numPartitions=16).select(
        F.col("id"),
        (F.col("id") % 1000).alias("k"),
        (F.col("id") * 2654435761 % 97).cast("double").alias("v"),
    ).write.parquet(src_dir)

    m = PipelineManifest(spark, str(tmp_path / "store"))
    src = m.source("big", src_dir)

    def agg_fn(spark, df):
        return df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        )

    t0 = time.perf_counter()
    s1 = m.stage("agg", agg_fn, [src], {})
    warm = time.perf_counter() - t0
    assert not s1.from_cache and s1.df.count() == 1000

    t0 = time.perf_counter()
    s2 = m.stage("agg", agg_fn, [src], {})
    cached = time.perf_counter() - t0
    assert s2.from_cache and s2.df.count() == 1000
    print(f"\n1M-row stage: compute {warm:.1f}s, cached {cached:.2f}s")
