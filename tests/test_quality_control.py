"""QC aggregates vs pandas-computed expectations on a synthetic signal."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pylluminator_spark import quality_control as qc


@pytest.fixture(scope="module")
def signal_pdf() -> pd.DataFrame:
    rng = np.random.RandomState(11)
    rows = []
    for s in ("s1", "s2"):
        for i in range(60):
            t = "I" if i < 20 else "II"
            ch = (None if t == "II" else ("G" if i % 2 == 0 else "R"))
            pt = "cg" if i % 10 else ("snp" if i % 20 else "ch")
            base = rng.randint(100, 5000)
            if t == "I":
                mg, mr, ug, ur = base, base + 10, base + 20, base + 30
            else:
                mg, mr, ug, ur = base, None, None, base + 5
            if i % 13 == 0:  # sprinkle NAs
                mg = None
            rows.append(
                dict(
                    sample=s, probe_id=f"p{i:03d}", type=t, channel=ch,
                    probe_type=pt, mask_info="", mg=mg, mr=mr, ug=ug, ur=ur,
                )
            )
    pdf = pd.DataFrame(rows)
    for c in ("mg", "mr", "ug", "ur"):
        pdf[c] = pdf[c].astype("float64")
    return pdf


@pytest.fixture(scope="module")
def signal(spark, signal_pdf):
    df = spark.createDataFrame(signal_pdf).cache()
    df.count()
    return df


def test_nb_probes_stats(signal, signal_pdf):
    got = {r.sample: r for r in qc.nb_probes_stats(signal).collect()}
    for s, g in signal_pdf.groupby("sample"):
        r = got[s]
        assert r.n_total == len(g)
        assert r.n_type2 == (g["type"] == "II").sum()
        assert r.n_type1_green == ((g["type"] == "I") & (g["channel"] == "G")).sum()
        assert r.n_type1_red == ((g["type"] == "I") & (g["channel"] == "R")).sum()
        assert r.n_cg == (g["probe_type"] == "cg").sum()
        assert r.n_ch == (g["probe_type"] == "ch").sum()
        assert r.n_snp == (g["probe_type"] == "snp").sum()


def test_intensity_stats(signal, signal_pdf):
    got = {r.sample: r for r in qc.intensity_stats(signal).collect()}
    for s, g in signal_pdf.groupby("sample"):
        r = got[s]
        t1, t2 = g[g["type"] == "I"], g[g["type"] == "II"]
        t1g, t1r = t1[t1["channel"] == "G"], t1[t1["channel"] == "R"]
        ib_m = pd.concat([t2["mg"], t1g["mg"], t1r["mr"]])
        ib_u = pd.concat([t2["ur"], t1g["ug"], t1r["ur"]])
        assert r.mean_ib_intensity == pytest.approx(
            pd.concat([ib_m, ib_u]).mean(), rel=1e-9
        )
        assert r.mean_type2 == pytest.approx(
            pd.concat([t2["mg"], t2["ur"]]).mean(), rel=1e-9
        )
        assert r.mean_ib_red == pytest.approx(
            pd.concat([t1r["mr"], t1r["ur"]]).mean(), rel=1e-9
        )
        assert r.mean_oob_red == pytest.approx(
            pd.concat([t1g["mr"], t1g["ur"]]).mean(), rel=1e-9
        )
        assert r.na_meth == (
            t1["mg"].isna().sum() + t1["mr"].isna().sum() + t2["mg"].isna().sum()
        )
        assert r.na_type1_green == (
            t1g[["mg", "mr", "ug", "ur"]].isna().sum().sum()
        )
        assert r.na_type2 == t2["mg"].isna().sum() + t2["ur"].isna().sum()


def test_dye_bias_stats(signal, signal_pdf):
    got = {r.sample: r for r in qc.dye_bias_stats(signal).collect()}
    for s, g in signal_pdf.groupby("sample"):
        t1 = g[g["type"] == "I"].copy()
        t1["total"] = np.where(
            t1["channel"] == "R", t1["mr"] + t1["ur"], t1["mg"] + t1["ug"]
        )
        r = got[s]
        for ch, med_col, top_col in (
            ("R", "median_red", "top20_median_red"),
            ("G", "median_green", "top20_median_green"),
        ):
            vals = t1[t1["channel"] == ch]["total"].dropna()
            assert getattr(r, med_col) == pytest.approx(vals.median(), rel=1e-9)
            assert getattr(r, top_col) == pytest.approx(
                vals.nlargest(20).median(), rel=1e-9
            )
        assert r.red_green_ratio == pytest.approx(
            r.median_red / r.median_green, rel=1e-12
        )


def test_detection_stats(spark):
    pdf = pd.DataFrame(
        {
            "sample": ["s1"] * 8,
            "probe_id": [f"p{i}" for i in range(8)],
            "probe_type": ["cg"] * 5 + ["ch"] * 3,
            "p_value": [0.01, 0.2, None, 0.03, 0.04, 0.5, 0.01, None],
        }
    )
    df = spark.createDataFrame(pdf)
    res = qc.detection_stats(df, threshold=0.05, n_manifest_probes=10)
    rows = {(r.sample, r.probe_type): r for r in res.collect()}
    total = rows[("s1", None)]
    assert total.n_probes == 8
    assert total.n_missing == 2 + 2  # 2 NA p-values + 2 missing from manifest
    assert total.pct_missing == pytest.approx(4 / 10)
    assert total.n_detected == 4
    assert total.pct_detected == pytest.approx(4 / 6)
    cg = rows[("s1", "cg")]
    assert cg.n_probes == 5 and cg.n_detected == 3 and cg.n_missing == 1


def test_betas_stats(spark):
    pdf = pd.DataFrame(
        {
            "sample": ["s1"] * 6,
            "probe_id": [f"p{i}" for i in range(6)],
            "probe_type": ["cg", "cg", "cg", "ch", "ch", "snp"],
            "beta": [0.1, 0.9, 0.5, 0.8, None, 0.2],
        }
    )
    res = qc.betas_stats(spark.createDataFrame(pdf))
    rows = {(r.sample, r.probe_type): r for r in res.collect()}
    tot = rows[("s1", None)]
    assert tot.mean_beta == pytest.approx(np.nanmean([0.1, 0.9, 0.5, 0.8, 0.2]))
    assert tot.median_beta == pytest.approx(0.5)
    assert tot.pct_unmeth == pytest.approx(2 / 5)
    assert tot.pct_meth == pytest.approx(2 / 5)
    assert tot.n_na == 1 and tot.pct_na == pytest.approx(1 / 6)
    ch = rows[("s1", "ch")]
    assert ch.n_na == 1 and ch.mean_beta == pytest.approx(0.8)
