"""Merge operators (A2-A4) vs reference semantics on synthetic inputs."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.merge import (
    merge_betas_by,
    merge_dataframe_by,
    merge_samples_by,
    remove_probes_suffix,
    strip_probe_suffix_expr,
)


@pytest.fixture(scope="module")
def signal(spark):
    rows = []
    for p in range(6):
        for i, s in enumerate(["s0", "s1", "s2", "s3"]):
            rows.append(
                (
                    "I" if p % 2 else "II",
                    "G" if p % 2 else None,
                    "cg",
                    f"cg{p:03d}_TC2{i}" if p < 2 else f"cg{p:03d}",
                    s,
                    float(10 * p + i),
                    float(20 * p + i),
                    None if (p == 3 and s == "s0") else float(30 * p + i),
                    float(40 * p + i),
                )
            )
    return spark.createDataFrame(
        rows,
        "type string, channel string, probe_type string, probe_id string,"
        "sample string, mg double, mr double, ug double, ur double",
    )


SHEET_PDF = pd.DataFrame(
    {
        "sample": ["s0", "s1", "s2", "s3"],
        "grp": ["A", "A", "B", "B"],
    }
)


def test_merge_samples_by_averages_cells(spark, signal):
    sheet = spark.createDataFrame(SHEET_PDF)
    out = merge_samples_by(signal, sheet, "grp").toPandas()
    assert set(out["sample"]) == {"A", "B"}
    row = out[(out.probe_id == "cg002") & (out["sample"] == "A")].iloc[0]
    assert row["mg"] == pytest.approx((20.0 + 21.0) / 2)
    # NULL cells are skipped, not zero-counted (masked-value semantics)
    row = out[(out.probe_id == "cg003") & (out["sample"] == "A")].iloc[0]
    assert row["ug"] == pytest.approx(91.0)  # only s1 contributes


def test_merge_betas_by(spark):
    betas = spark.createDataFrame(
        [("p1", "s0", 0.2), ("p1", "s1", 0.4), ("p1", "s2", 0.9)],
        "probe_id string, sample string, beta double",
    )
    sheet = spark.createDataFrame(SHEET_PDF)
    out = {
        (r["probe_id"], r["sample"]): r["beta"]
        for r in merge_betas_by(betas, sheet, "grp").collect()
    }
    assert out[("p1", "A")] == pytest.approx(0.3)
    assert out[("p1", "B")] == pytest.approx(0.9)


def test_strip_probe_suffix(spark):
    df = spark.createDataFrame(
        [("cg001_TC21",), ("cg001_BC11",), ("rs12_3_TC12",), ("plain",)],
        "probe_id string",
    )
    got = [r[0] for r in df.select(strip_probe_suffix_expr("probe_id")).collect()]
    # last _part dropped; no underscore -> unchanged (reference utils.py:126-141)
    assert got == ["cg001", "cg001", "rs12_3", "plain"]


def test_remove_probes_suffix_merges_duplicates(spark, signal):
    out = remove_probes_suffix(signal).toPandas()
    # cg000_TC20..23 & cg001_TC2i collapse to cg000/cg001 per sample
    assert not out["probe_id"].str.contains("_TC").any()
    merged = out[(out.probe_id == "cg000") & (out["sample"] == "s0")]
    assert len(merged) == 1
    assert merged.iloc[0]["mg"] == pytest.approx(0.0)
    # non-suffixed probes untouched, one row per (probe, sample)
    assert len(out[(out.probe_id == "cg005")]) == 4


def test_merge_dataframe_by_type_dispatch(spark):
    pdf = pd.DataFrame(
        {
            "grp": ["a", "a", "a", "b"],
            "num": [1.0, 3.0, None, 7.0],
            "txt": ["x", "y", "x", None],
            "flag": [True, False, None, None],
        }
    )
    df = spark.createDataFrame(pdf).withColumn(
        "flag", F.col("flag").cast("boolean")
    )
    out = {
        r["grp"]: r for r in merge_dataframe_by(df, "grp").collect()
    }
    assert out["a"]["num"] == pytest.approx(2.0)
    assert out["a"]["txt"] == "x;y"
    assert out["a"]["flag"] is True
    assert out["b"]["num"] == pytest.approx(7.0)
    assert out["b"]["txt"] is None
    assert out["b"]["flag"] is None
    strict = {
        r["grp"]: r
        for r in merge_dataframe_by(df, "grp", bool_how="all").collect()
    }
    assert strict["a"]["flag"] is False
