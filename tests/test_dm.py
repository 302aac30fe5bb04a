"""DM layer tests: closed-form OLS vs independent numpy math, special-function
accuracy vs published constants, BH vs hand-rolled numpy, DMR segmentation
boundary behavior."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pylluminator_spark import dm
from pylluminator_spark.functions.stats import bh_adjust

SAMPLES = [f"s{i}" for i in range(6)]
SHEET = pd.DataFrame(
    {
        "sample": SAMPLES,
        "sample_type": ["LNCAP"] * 3 + ["PREC"] * 3,
        "sample_number": [1, 2, 3, 1, 2, 3],
    }
)


def test_t_sf_known_values():
    # classic table values
    assert dm.t_sf_two_sided(np.array([2.0]), 4)[0] == pytest.approx(0.116116, abs=1e-5)
    assert dm.t_sf_two_sided(np.array([1.0]), 10)[0] == pytest.approx(0.340893, abs=1e-5)
    assert dm.t_sf_two_sided(np.array([0.0]), 7)[0] == pytest.approx(1.0, abs=1e-12)


def test_f_sf_known_values():
    # F(1,10) upper 5% critical value is 4.9646
    assert dm.f_sf(np.array([4.9646]), 1, 10)[0] == pytest.approx(0.05, abs=1e-4)
    assert dm.f_sf(np.array([0.0]), 2, 8)[0] == pytest.approx(1.0, abs=1e-12)


def test_design_matrix_treatment_coding():
    d = dm.build_design_matrix(SHEET.set_index("sample"), "~ sample_type + sample_number")
    assert list(d.columns) == ["Intercept", "sample_type[T.PREC]", "sample_number"]
    assert d["sample_type[T.PREC]"].tolist() == [0, 0, 0, 1, 1, 1]
    d2 = dm.build_design_matrix(
        SHEET.set_index("sample"), "~ sample_type", reference_value={"sample_type": "PREC"}
    )
    assert "sample_type[T.LNCAP]" in d2.columns


@pytest.fixture(scope="module")
def betas_df(spark):
    rng = np.random.RandomState(5)
    rows = []
    for p in range(80):
        base = rng.uniform(0.2, 0.8)
        delta = 0.3 if p < 20 else 0.0  # first 20 probes differ by group
        for i, s in enumerate(SAMPLES):
            group_shift = delta if i >= 3 else 0.0
            beta = np.clip(base + group_shift + rng.normal(0, 0.02), 0, 1)
            # inject NA for one probe/sample
            if p == 5 and s == "s2":
                beta = None
            rows.append((s, f"cg{p:05d}", float(beta) if beta is not None else None))
    return spark.createDataFrame(rows, "sample string, probe_id string, beta double")


def test_compute_dmp_matches_numpy_ols(betas_df):
    dmps, contrasts = dm.compute_dmp(betas_df, SHEET, "~ sample_type")
    assert contrasts == ["sample_type[T.PREC]"]
    got = dmps.toPandas().set_index("probe_id")
    pdf = betas_df.toPandas().pivot(index="probe_id", columns="sample", values="beta")
    x = np.column_stack([np.ones(6), np.array([0, 0, 0, 1, 1, 1], dtype=float)])
    for pid in ["cg00000", "cg00030", "cg00050"]:
        y = pdf.loc[pid, SAMPLES].to_numpy(dtype=float)
        coef, res_, _, _ = np.linalg.lstsq(x, y, rcond=None)
        resid = y - x @ coef
        rss = (resid**2).sum()
        sigma2 = rss / (6 - 2)
        xtx_inv = np.linalg.inv(x.T @ x)
        se = np.sqrt(sigma2 * np.diag(xtx_inv))
        t = coef / se
        assert got.loc[pid, "sample_type[T.PREC]_estimate"] == pytest.approx(
            coef[1], rel=1e-9
        )
        assert got.loc[pid, "sample_type[T.PREC]_std_err"] == pytest.approx(
            se[1], rel=1e-9
        )
        assert got.loc[pid, "sample_type[T.PREC]_t_value"] == pytest.approx(
            t[1], rel=1e-9
        )
        expected_p = dm.t_sf_two_sided(np.array([t[1]]), 4)[0]
        assert got.loc[pid, "sample_type[T.PREC]_p_value"] == pytest.approx(
            expected_p, rel=1e-9
        )
        # avg beta per level + delta
        assert got.loc[pid, "sample_type[T.LNCAP]_avg_beta"] == pytest.approx(
            np.nanmean(y[:3]), rel=1e-9
        )
        assert got.loc[pid, "sample_type[T.PREC]_avg_beta_delta"] == pytest.approx(
            np.nanmean(y[:3]) - np.nanmean(y[3:]), rel=1e-9
        )
    # signal probes detected
    sig = got[got["sample_type[T.PREC]_p_value_adjusted"] < 0.01]
    assert set(sig.index) >= {f"cg{p:05d}" for p in range(20)} - {"cg00005"}


def test_compute_dmp_na_handling(betas_df):
    """cg00005 has an NA for s2: the fit must drop that sample (df=3)."""
    dmps, _ = dm.compute_dmp(betas_df, SHEET, "~ sample_type")
    got = dmps.toPandas().set_index("probe_id")
    pdf = betas_df.toPandas().pivot(index="probe_id", columns="sample", values="beta")
    y_full = pdf.loc["cg00005", SAMPLES].to_numpy(dtype=float)
    mask = ~np.isnan(y_full)
    x = np.column_stack([np.ones(6), np.array([0, 0, 0, 1, 1, 1], dtype=float)])[mask]
    y = y_full[mask]
    coef, _, _, _ = np.linalg.lstsq(x, y, rcond=None)
    assert got.loc["cg00005", "sample_type[T.PREC]_estimate"] == pytest.approx(
        coef[1], rel=1e-9
    )


def test_bh_adjust_matches_numpy(spark):
    rng = np.random.RandomState(3)
    pvals = rng.uniform(0, 1, 200)
    df = spark.createDataFrame(
        [(int(i), float(p)) for i, p in enumerate(pvals)], "id long, p double"
    )
    got = bh_adjust(df, "p").toPandas().set_index("id").sort_index()

    def numpy_bh(p):
        n = len(p)
        order = np.argsort(p)
        ranked = p[order] * n / (np.arange(n) + 1)
        cummin = np.minimum.accumulate(ranked[::-1])[::-1]
        out = np.empty(n)
        out[order] = np.minimum(cummin, 1)
        return out

    expected = numpy_bh(pvals)
    assert np.allclose(got["p_adj"].to_numpy(), expected, rtol=1e-12)


@pytest.fixture(scope="module")
def dmr_inputs(spark):
    """Two chromosomes; on chr1 two clearly-separated beta clusters."""
    rows, coords = [], []
    for p in range(40):
        chrom = "1" if p < 30 else "2"
        start = 1000 * (p if p < 30 else p - 30)
        coords.append((f"cg{p:05d}", chrom, start, start + 2))
        for i, s in enumerate(SAMPLES):
            # chr1: probes 0-14 near 0.2, probes 15-29 near 0.8 => one big jump
            if p < 15:
                val = 0.2 + 0.001 * p + 0.001 * i
            elif p < 30:
                val = 0.8 + 0.001 * p + 0.001 * i
            else:
                val = 0.5 + 0.001 * i
            rows.append((s, f"cg{p:05d}", float(val)))
    betas = spark.createDataFrame(rows, "sample string, probe_id string, beta double")
    granges = spark.createDataFrame(
        coords, "probe_id string, chromosome string, start long, end long"
    )
    return betas, granges


def test_compute_dmr_segments(spark, dmr_inputs, betas_df):
    betas, granges = dmr_inputs
    dmps, contrasts = dm.compute_dmp(betas, SHEET, "~ sample_type")
    segments, dmr_df = dm.compute_dmr(
        betas, dmps, granges, contrasts, dist_cutoff=0.1
    )
    seg_pdf = segments.toPandas().set_index("probe_id").sort_index()
    # probes 0-14 share a segment; 15-29 share another; chr2 separate
    seg_a = set(seg_pdf.loc[[f"cg{p:05d}" for p in range(15)], "segment_id"])
    seg_b = set(seg_pdf.loc[[f"cg{p:05d}" for p in range(15, 30)], "segment_id"])
    seg_c = set(seg_pdf.loc[[f"cg{p:05d}" for p in range(30, 40)], "segment_id"])
    assert len(seg_a) == 1 and len(seg_b) == 1 and len(seg_c) == 1
    assert seg_a != seg_b and seg_b != seg_c and seg_a != seg_c

    dmr_pdf = dmr_df.toPandas().set_index("segment_id")
    sa = seg_a.pop()
    assert dmr_pdf.loc[sa, "start"] == 0
    assert dmr_pdf.loc[sa, "end"] == 14 * 1000 + 2
    assert dmr_pdf.loc[sa, "chromosome"] == "1"
    # combined p-values in [0,1], adjusted >= raw is NOT guaranteed by BH,
    # but both must be valid probabilities
    pcol = "sample_type[T.PREC]_p_value"
    assert ((dmr_pdf[pcol].dropna() >= 0) & (dmr_pdf[pcol].dropna() <= 1)).all()
    assert (
        (dmr_pdf[f"{pcol}_adjusted"].dropna() >= 0)
        & (dmr_pdf[f"{pcol}_adjusted"].dropna() <= 1)
    ).all()


def test_stouffer_single_probe_segment_keeps_p(spark):
    """A one-probe segment keeps its p-value (reference dm.py:33-34)."""
    from pylluminator_spark.functions.stats import stouffer_combine

    df = spark.createDataFrame(
        [(1, 0.03), (2, 0.2), (2, 0.4)], "seg long, p double"
    )
    got = {
        r["seg"]: r["p_combined"]
        for r in stouffer_combine(df, ["seg"], "p").collect()
    }
    assert got[1] == pytest.approx(0.03, abs=1e-12)
    # two-p combine: z = (isf(0.2)+isf(0.4))/sqrt(2); p = sf(z)
    z = (0.8416212335729143 + 0.2533471031357997) / np.sqrt(2)
    from math import erfc, sqrt

    expected = 0.5 * erfc(z / sqrt(2))
    assert got[2] == pytest.approx(expected, rel=1e-6)


def test_select_dmps(betas_df):
    dmps, _ = dm.compute_dmp(betas_df, SHEET, "~ sample_type")
    sel = dm.select_dmps(dmps, effect_size_th=0.2, p_value_th=0.05)
    assert 0 < sel.count() <= dmps.count()


def test_dm_facade_end_to_end(spark, betas_df):
    ranges = spark.createDataFrame(
        pd.DataFrame(
            {
                "probe_id": [f"cg{i:05d}" for i in range(80)],
                "chromosome": ["chr1"] * 40 + ["chr2"] * 40,
                "start": [100 * (i % 40) + 1 for i in range(80)],
                "end": [100 * (i % 40) + 50 for i in range(80)],
            }
        )
    )
    ann = spark.createDataFrame(
        pd.DataFrame(
            {
                "probe_id": [f"cg{i:05d}" for i in range(80)],
                "genes": [f"G{i % 9}" for i in range(80)],
            }
        )
    )
    model = dm.DM(betas_df, SHEET, "~ sample_type", genomic_ranges=ranges)
    assert model.contrasts == ["sample_type[T.PREC]"]
    assert model.dmp.count() == 80
    top = model.get_top_dmp(ann, n_dms=5, pval_threshold=1.1)
    assert top.count() == 5
    dmr = model.compute_dmr(seg_per_locus=0.5)
    assert model.segments is not None
    assert dmr.filter(F.col("`sample_type[T.PREC]_p_value_adjusted`").isNotNull()).count() > 0
    top_r = model.get_top_dmr(ann, n_dms=3, pval_threshold=1.1)
    rows = top_r.collect()
    assert len(rows) == 3 and "genes" in top_r.columns
    # default-contrast resolution + select_dmps passthrough
    assert model.select_dmps(p_value_th=1.1).count() == 80
    with pytest.raises(ValueError):
        dm.DM(betas_df, SHEET, "~ sample_type").compute_dmr()


def test_get_top_dmp_matches_pandas(spark, betas_df):
    dmps, contrasts = dm.compute_dmp(betas_df, SHEET, "~ sample_type")
    contrast = contrasts[0]
    # annotation with ';'-packed genes; probe cg00007 maps to two rows
    ann = spark.createDataFrame(
        pd.DataFrame(
            {
                "probe_id": [f"cg{i:05d}" for i in range(80)] + ["cg00007"],
                "genes": [f"G{i % 7};G{(i + 1) % 7}" for i in range(80)]
                + ["G1;G9"],
            }
        )
    )
    top = dm.get_top_dm(
        dmps, contrast, ann, n_dms=10, pval_threshold=0.05
    ).toPandas()
    assert len(top) == 10
    # pandas oracle for membership + gene merge
    pdf = dmps.toPandas()
    pcol = f"{contrast}_p_value_adjusted"
    expected = (
        pdf[pdf[pcol] < 0.05]
        .dropna(subset=[pcol])
        .sort_values([pcol, "probe_id"])
        .head(10)
    )
    assert sorted(top["probe_id"]) == sorted(expected["probe_id"])
    # ordered by adjusted p ascending
    assert top[pcol].tolist() == sorted(top[pcol].tolist())
    for _, r in top.iterrows():
        i = int(r["probe_id"][2:])
        genes = {f"G{i % 7}", f"G{(i + 1) % 7}"} | ({"G1", "G9"} if i == 7 else set())
        assert set(r["genes"].split(";")) == genes, r["probe_id"]


def test_get_top_dmr_merges_genes_per_segment(spark, betas_df):
    dmps, contrasts = dm.compute_dmp(betas_df, SHEET, "~ sample_type")
    contrast = contrasts[0]
    # 2 probes per segment, segment stats = dmp stats renamed
    segs = spark.createDataFrame(
        pd.DataFrame(
            {
                "probe_id": [f"cg{i:05d}" for i in range(80)],
                "segment_id": [i // 2 for i in range(80)],
            }
        )
    )
    dmrs = (
        dmps.withColumn("segment_id", (F.regexp_replace("probe_id", "cg", "").cast("int") / 2).cast("long"))
        .groupBy("segment_id")
        .agg(
            F.avg(f"`{contrast}_p_value_adjusted`").alias(
                f"{contrast}_p_value_adjusted"
            ),
            F.avg(f"`{contrast}_avg_beta_delta`").alias(
                f"{contrast}_avg_beta_delta"
            ),
        )
        .withColumn("chromosome", F.lit("chr1"))
    )
    top = dm.get_top_dm(
        dmrs,
        contrast,
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "probe_id": [f"cg{i:05d}" for i in range(80)],
                    "genes": [f"G{i}" for i in range(80)],
                }
            )
        ),
        kind="dmr",
        segments=segs,
        n_dms=5,
        pval_threshold=1.1,
        sort_by="effect_size",
    ).toPandas()
    assert len(top) == 5
    # each segment's genes = union over its 2 probes; sorted by |delta| desc
    for _, r in top.iterrows():
        sid = int(r["segment_id"])
        assert set(r["genes"].split(";")) == {f"G{2 * sid}", f"G{2 * sid + 1}"}
    deltas = top[f"{contrast}_avg_beta_delta"].abs().tolist()
    assert deltas == sorted(deltas, reverse=True)
    assert "probe_id" not in top.columns


# ---------------------------------------------------------------------------
# MixedLM (K9 random-intercept path, reference dm.py:61-67)
# ---------------------------------------------------------------------------

def test_mixedlm_balanced_one_way_closed_form():
    """Balanced one-way design: REML has a closed form (sigma_e^2 = MSE,
    sigma_u^2 = (MSB - MSE)/m); the profiled-lambda kernel must recover the
    grand mean and its exact standard error sqrt(MSB/n) on interior probes."""
    rng = np.random.RandomState(7)
    G, m = 6, 5
    n = G * m
    codes = np.repeat(np.arange(G), m)
    p = 120
    u = rng.normal(0, 0.8, (p, G))
    y = 2.0 + u[:, codes] + rng.normal(0, 0.5, (p, n))
    x = np.ones((n, 1))
    coef, se, t, pv = dm.mixedlm_fit_block(y, x, codes)

    gm = y.reshape(p, G, m)
    group_means = gm.mean(axis=2)
    grand = y.mean(axis=1)
    mse = ((gm - group_means[:, :, None]) ** 2).sum(axis=(1, 2)) / (n - G)
    msb = m * ((group_means - grand[:, None]) ** 2).sum(axis=1) / (G - 1)
    interior = (msb - mse) / m > 1e-4  # away from the sigma_u^2 = 0 boundary
    assert interior.sum() > p * 0.8
    np.testing.assert_allclose(coef[:, 0], grand, rtol=1e-9)
    np.testing.assert_allclose(
        se[interior, 0], np.sqrt(msb[interior] / n), rtol=1e-5
    )
    # Wald z p-values
    np.testing.assert_allclose(
        pv[:, 0], dm.norm_sf_two_sided(coef[:, 0] / se[:, 0]), rtol=1e-12
    )


def test_mixedlm_matches_dense_v_reference():
    """The group-sum (Sherman-Morrison) kernel must agree with a brute-force
    dense-V REML fit (explicit n x n inverse, fine lambda grid)."""
    rng = np.random.RandomState(11)
    G, m, k = 5, 4, 2
    n = G * m
    codes = np.repeat(np.arange(G), m)
    x = np.column_stack([np.ones(n), rng.normal(size=n)])
    p = 6
    y = (
        (x @ np.array([1.0, 0.5]))[None, :]
        + rng.normal(0, 0.7, (p, G))[:, codes]
        + rng.normal(0, 0.4, (p, n))
    )
    coef, se, _, _ = dm.mixedlm_fit_block(y, x, codes)

    z = np.zeros((n, G))
    z[np.arange(n), codes] = 1.0
    lams = np.concatenate([[0.0], np.logspace(-5, 5, 4001)])
    for i in range(p):
        best = (np.inf, None, None)
        for lam in lams:
            v = np.eye(n) + lam * (z @ z.T)
            vi = np.linalg.inv(v)
            xtvx = x.T @ vi @ x
            beta = np.linalg.solve(xtvx, x.T @ vi @ y[i])
            r = y[i] - x @ beta
            s2 = r @ vi @ r / (n - k)
            crit = (
                (n - k) * np.log(s2)
                + np.linalg.slogdet(v)[1]
                + np.linalg.slogdet(xtvx)[1]
            )
            if crit < best[0]:
                best = (
                    crit,
                    beta,
                    np.sqrt(s2 * np.diag(np.linalg.inv(xtvx))),
                )
        np.testing.assert_allclose(coef[i], best[1], atol=2e-4)
        np.testing.assert_allclose(se[i], best[2], atol=2e-3)


def test_compute_dmp_mixedlm_end_to_end(spark):
    """compute_dmp(group_column=...) runs the mixed path end-to-end:
    f_pvalue NaN (reference returns None), Wald p-values in [0,1], signal
    probes detected, NA probes routed through the per-pattern path."""
    rng = np.random.RandomState(3)
    donors = ["d0", "d0", "d1", "d1", "d2", "d2", "d3", "d3"]
    samples = [f"r{i}" for i in range(8)]
    sheet = pd.DataFrame(
        {
            "sample": samples,
            "sample_type": ["LNCAP", "PREC"] * 4,
            "donor": donors,
        }
    )
    rows = []
    for p in range(40):
        base = rng.uniform(0.3, 0.6)
        delta = 0.25 if p < 10 else 0.0
        donor_fx = {d: rng.normal(0, 0.05) for d in set(donors)}
        for s, st, d in zip(samples, sheet["sample_type"], donors):
            val = base + (delta if st == "PREC" else 0) + donor_fx[d]
            val += rng.normal(0, 0.01)
            if p == 3 and s == "r5":
                rows.append((s, f"cg{p:05d}", None))
            else:
                rows.append((s, f"cg{p:05d}", float(np.clip(val, 0, 1))))
    betas = spark.createDataFrame(
        rows, "sample string, probe_id string, beta double"
    )
    dmps, contrasts = dm.compute_dmp(
        betas, sheet, "~ sample_type", group_column="donor"
    )
    assert contrasts == ["sample_type[T.PREC]"]
    got = dmps.toPandas().set_index("probe_id")
    assert len(got) == 40
    # mixed fits have no F p-value (reference dm.py:80-83)
    assert got["f_pvalue"].isna().all()
    pcol = "sample_type[T.PREC]_p_value"
    assert got[pcol].between(0, 1).all()
    assert f"{pcol}_adjusted" in got.columns or "sample_type[T.PREC]_p_value_adjusted" in got.columns
    # estimates recover the injected group delta
    est = got["sample_type[T.PREC]_estimate"]
    assert est[[f"cg{p:05d}" for p in range(10)]].mean() == pytest.approx(
        0.25, abs=0.05
    )
    assert est[[f"cg{p:05d}" for p in range(10, 40)]].abs().mean() < 0.05
    # the NA probe still gets a finite estimate (pattern path)
    assert np.isfinite(got.loc["cg00003", "sample_type[T.PREC]_estimate"])
    # signal probes significant after BH
    adj = got["sample_type[T.PREC]_p_value_adjusted"]
    assert (adj[[f"cg{p:05d}" for p in range(10)]] < 0.05).all()
