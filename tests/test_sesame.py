"""SeSAMe SigDF import + session save/load round-trip."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pylluminator_spark.plans.session import MethylSession
from pylluminator_spark.sources.sesame import read_sesame_csvs


@pytest.fixture(scope="module")
def sesame_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sesame")
    for sample in ("lncap1", "prec1"):
        rows = []
        for i in range(30):
            pid = f"cg{i:06d}_BC11"
            if i < 10:  # type I
                rows.append((pid, 100 + i, 200 + i, 300 + i, 400 + i, i % 7 == 0))
            elif i < 20:  # type II green (signal in UG -> becomes MG)
                rows.append((pid, None, None, 500 + i, None, False))
            else:  # type II red (signal in UR, MG stays null -> channel R)
                rows.append((pid, None, 600 + i, None, 700 + i, False))
        pd.DataFrame(
            rows, columns=["Probe_ID", "MG", "MR", "UG", "UR", "mask"]
        ).to_csv(d / f"{sample}.csv", index=False)
    return str(d)


@pytest.fixture(scope="module")
def manifest(spark):
    rows = []
    for i in range(30):
        t = "I" if i < 10 else "II"
        ch = ("G" if i % 2 == 0 else "R") if t == "I" else None
        rows.append((f"cg{i:06d}_BC11", t, ch, "cg", ""))
    return spark.createDataFrame(
        rows, ["probe_id", "type", "channel", "probe_type", "mask_info"]
    )


def test_sesame_import(spark, sesame_dir, manifest):
    signal, masks = read_sesame_csvs(spark, sesame_dir + "/*.csv", manifest)
    pdf = signal.toPandas()
    assert set(pdf["sample"]) == {"lncap1", "prec1"}
    assert len(pdf) == 60  # 30 probes x 2 samples

    one = pdf[pdf["sample"] == "lncap1"].set_index("probe_id")
    # type I row untouched
    r = one.loc["cg000003_BC11"]
    assert (r["mg"], r["mr"], r["ug"], r["ur"]) == (103, 203, 303, 403)
    assert r["channel"] == "R"  # manifest channel for odd i
    # type II green: UG moved to MG, UG nulled, channel G (UR null)
    r = one.loc["cg000015_BC11"]
    assert r["mg"] == 515 and pd.isna(r["ug"]) and pd.isna(r["ur"])
    assert r["channel"] == "G"
    # type II red: MG null -> channel R
    r = one.loc["cg000025_BC11"]
    assert pd.isna(r["mg"]) and r["ur"] == 725
    assert r["channel"] == "R"

    # masks: i % 7 == 0 among type I (i < 10) -> i in {0, 7} per sample
    mk = masks.toPandas()
    assert len(mk) == 4
    assert set(mk["mask_name"]) == {"sesame"}
    assert sorted(mk[mk["sample"] == "prec1"]["probe_id"]) == [
        "cg000000_BC11",
        "cg000007_BC11",
    ]


def test_sesame_missing_column_raises(spark, tmp_path, manifest):
    pd.DataFrame({"Probe_ID": ["cg1"], "MG": [1]}).to_csv(
        tmp_path / "bad.csv", index=False
    )
    with pytest.raises(ValueError, match="mandatory"):
        read_sesame_csvs(spark, str(tmp_path / "bad.csv"), manifest)


def test_session_save_load_roundtrip(spark, sesame_dir, manifest, tmp_path):
    signal, masks = read_sesame_csvs(spark, sesame_dir + "/*.csv", manifest)
    sess = MethylSession(
        spark=spark, signal=signal, manifest=manifest, masks=masks, min_beads=3
    )
    out = str(tmp_path / "session")
    sess.save(out)
    loaded = MethylSession.load(spark, out)
    assert loaded.min_beads == 3
    assert loaded.sample_sheet is None
    assert loaded.signal.count() == signal.count()
    assert loaded.masks.count() == masks.count()
    # betas computable from the restored session
    assert loaded.betas(apply_mask=True).filter(F.col("beta").isNotNull()).count() > 0
