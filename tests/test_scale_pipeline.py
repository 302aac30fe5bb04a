"""Opt-in end-to-end preprocessing scale run at realistic per-sample size:
6 samples x 1M probes (EPICv2 is 937,688/sample — reference
tests/test_samples.py:33), the full SURVEY §3.2 chain:

    infer_type1_channel -> dye_bias_correction -> noob -> poobah -> betas

No golden values here (test_preprocessing pins those at small n); this run
asserts the chain completes with sane distributed plans, bounded outputs,
and no single-task collapse at 6M signal rows. Enable with
SPARK_GRAFT_SCALE=1 (~2-4 min).
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from pylluminator_spark import preprocessing as pp
from pylluminator_spark.functions.methyl import beta_expr, meth_unmeth_exprs

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE"),
    reason="set SPARK_GRAFT_SCALE=1 to run the 6M-row pipeline scale smoke",
)

N_PROBES = 1_000_000
N_SAMPLES = 6


@pytest.fixture(scope="module")
def big_signal(spark):
    """Synthetic semi-wide signal: ~13% type I (EPICv2 ratio), 0.5% negative
    controls, deterministic pseudo-random intensities from hash mixing."""
    probes = spark.range(N_PROBES, numPartitions=32).select(
        F.col("id").alias("pid")
    )
    samples = spark.range(N_SAMPLES).select(F.col("id").alias("sid"))
    base = probes.crossJoin(F.broadcast(samples))

    def mix(tag: int):
        h = F.xxhash64(F.col("pid") * 1000 + F.col("sid"), F.lit(tag))
        return (F.pmod(h, F.lit(4000)) + 50).cast("float")

    df = base.select(
        F.concat(F.lit("s"), F.col("sid")).alias("sample"),
        F.concat(F.lit("cg"), F.col("pid")).alias("probe_id"),
        F.when(F.col("pid") % 200 == 0, "ctl")
        .when(F.col("pid") % 100 < 87, "cg")
        .otherwise("ch")
        .alias("probe_type"),
        F.when(F.col("pid") % 200 == 0, "II")
        .when(F.col("pid") % 100 < 13, "I")
        .otherwise("II")
        .alias("type"),
        F.when(
            (F.col("pid") % 200 != 0) & (F.col("pid") % 100 < 13),
            F.when(F.col("pid") % 2 == 0, "G").otherwise("R"),
        ).alias("channel"),
        F.lit("").alias("mask_info"),
        mix(1).alias("mg"),
        mix(2).alias("mr"),
        mix(3).alias("ug"),
        mix(4).alias("ur"),
    )
    # negative controls get the reference naming convention
    df = df.withColumn(
        "probe_id",
        F.when(
            F.col("probe_type") == "ctl",
            F.concat(F.lit("ctl_negative_"), F.col("probe_id")),
        ).otherwise(F.col("probe_id")),
    ).persist()
    df.count()
    yield df
    df.unpersist()


def test_full_preprocessing_chain_at_scale(spark, big_signal):
    t0 = time.perf_counter()
    inferred, summary, _failed = pp.infer_type1_channel(big_signal)
    dyed = pp.dye_bias_correction(inferred)
    # cache the post-preprocess signal: the SURVEY §3.2 reuse point — both
    # poobah and betas consume it, and without the cache each consumer
    # re-runs the whole upstream chain
    noobed = pp.noob_background_correction(dyed).persist()
    pvals, _mask = pp.poobah(noobed)
    meth, unmeth = meth_unmeth_exprs(include_out_of_band=False)
    betas = noobed.withColumn("beta", beta_expr(meth, unmeth))

    stats = betas.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("beta").alias("bmin"),
        F.max("beta").alias("bmax"),
    ).collect()[0]
    assert stats["n"] == N_PROBES * N_SAMPLES
    assert 0.0 <= stats["bmin"] <= stats["bmax"] <= 1.0

    pstats = pvals.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("p_value").alias("pmin"),
        F.max("p_value").alias("pmax"),
    ).collect()[0]
    # p-values for every non-control probe x sample
    assert pstats["n"] > 0.9 * N_PROBES * N_SAMPLES
    assert 0.0 <= pstats["pmin"] <= pstats["pmax"] <= 1.0

    # channel inference summary is a tiny grouped count
    assert summary.count() <= 8
    noobed.unpersist()
    elapsed = time.perf_counter() - t0
    print(f"\n6M-row chain: {elapsed:.1f}s")
    assert elapsed < 600


def test_reference_style_invariants_at_scale(spark, big_signal):
    """Golden-parity invariants at reference fixture scale (VERDICT r6
    #6, SURVEY §5.3): the reference pins EXACT probe-universe counts
    (937,688 probes; type1=128,295; ... — test_read_samples.py:90-103),
    mask cardinalities (test_mask.py:66-84) and pOOBAH NA/mask counts
    (test_preprocessing.py:6-14) on its 6-sample EPICv2 fixture. The 1M-
    probe synthetic fixture is hash-deterministic, so the same EXACT-
    count style applies: every cardinality below is derived from the
    fixture's pid arithmetic, then the chain + mask machinery must
    reproduce it to the row."""
    # fixture arithmetic: pid % 200 == 0 -> ctl (5,000); else
    # pid % 100 < 13 -> type I (13 * 10,000 - 5,000 overlap = 125,000);
    # remaining non-ctl are type II (870,000)
    n_ctl, n_type1 = 5_000, 125_000
    n_nonctl = N_PROBES - n_ctl

    # probe-universe counts, exact (reference test_read_samples.py:90)
    universe = big_signal.groupBy("type").agg(
        F.countDistinct("probe_id").alias("n")
    )
    counts = {r["type"]: r["n"] for r in universe.collect()}
    assert counts["I"] == n_type1
    assert counts["II"] == (N_PROBES - n_type1)  # ctl probes are type II

    inferred, _summary, failed = pp.infer_type1_channel(big_signal)
    # every type I probe x sample gets exactly one non-null channel
    t1 = inferred.filter(F.col("type") == "I")
    assert t1.count() == n_type1 * N_SAMPLES
    assert t1.filter(F.col("channel").isNull()).count() == 0
    # failed-probe set (max < bg p95 — reference samples.py:986-995): a
    # strict subset of the type I universe, never spilling into type II
    n_failed = failed.count()
    assert 0 < n_failed < n_type1  # uniform intensities straddle bg p95
    assert (
        failed.join(
            big_signal.filter(F.col("type") != "I").select("probe_id"),
            "probe_id",
            "left_semi",
        ).count()
        == 0
    )

    noobed = pp.noob_background_correction(
        pp.dye_bias_correction(inferred)
    ).persist()
    try:
        pvals, mask = pp.poobah(noobed, threshold=0.05)
        # pOOBAH coverage: EXACTLY one non-null p-value per probe x
        # sample — controls included, like the reference, whose ECDF
        # covers the whole signal frame (test_preprocessing.py:6-14
        # pins the NA count; this fixture admits none)
        assert pvals.count() == N_PROBES * N_SAMPLES
        assert pvals.filter(F.col("p_value").isNull()).count() == 0

        # mask cardinality == the p >= threshold row count, and the
        # mask names follow the reference convention
        n_masked = pvals.filter(F.col("p_value") >= 0.05).count()
        assert mask.count() == n_masked
        assert (
            mask.filter(F.col("mask_name") != "poobah_0.05").count() == 0
        )

        # NA structure after mask application (reference samples.py
        # sigdf.loc[probes] = None): the masked betas are NULL for
        # exactly the masked (sample, probe) pairs — no more, no less
        from pylluminator_spark.operators.masks import apply_mask_nullout

        meth, unmeth = meth_unmeth_exprs(include_out_of_band=False)
        betas = noobed.withColumn("beta", beta_expr(meth, unmeth)).select(
            "sample", "probe_id", "beta"
        )
        masked_betas = apply_mask_nullout(betas, mask)
        assert (
            masked_betas.filter(F.col("beta").isNull()).count() == n_masked
        )
        assert masked_betas.count() == N_PROBES * N_SAMPLES
    finally:
        noobed.unpersist()

def test_manifest_pipeline_incremental_at_scale(spark, big_signal, tmp_path):
    """VERDICT r7 #6: the preprocessing chain as a content-addressed
    manifest pipeline at 6M signal rows — second run is pure cache, and a
    betas-only param change recomputes exactly the betas stage (the
    reference's reset_betas invalidation, samples.py:1116-1120)."""
    from pylluminator_spark.plans.manifest import PipelineManifest
    from pylluminator_spark.plans.session import MethylSession

    sess = MethylSession(spark=spark, signal=big_signal)
    m = PipelineManifest(spark, str(tmp_path / "pl"))

    t0 = time.time()
    piped, first = sess.run_pipeline(m, source_fingerprint="big-v1")
    n_betas = piped.betas_df.count()
    cold = time.time() - t0
    assert n_betas > 0
    assert not first["betas"].from_cache

    t0 = time.time()
    piped2, second = sess.run_pipeline(m, source_fingerprint="big-v1")
    assert piped2.betas_df.count() == n_betas
    warm = time.time() - t0
    assert all(r.from_cache for r in second.values())
    # the warm path reads parquet instead of recomputing the chain
    assert warm < cold, (warm, cold)

    _, third = sess.run_pipeline(
        m, source_fingerprint="big-v1", include_out_of_band=True
    )
    flags = {k: r.from_cache for k, r in third.items()}
    assert not flags["betas"]
    assert all(v for k, v in flags.items() if k != "betas"), flags
