"""Time-series toolkit: resample/gap-fill vs a pure-python reference,
EWMA vs pandas ewm(adjust=False), rolling z-score vs pandas rolling."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pylluminator_spark.datasets import load_table
from pylluminator_spark.operators.timeseries import (
    ewma,
    forward_fill,
    resample,
    rolling_zscore,
)

SF_DIR = "/root/testdata/sf0.001"
SIX_H_US = 21_600_000_000


@pytest.fixture(scope="module")
def ev(spark):
    return (
        load_table(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .cache()
    )


@pytest.fixture(scope="module")
def ev_pd(ev):
    return ev.select("user_id", "ts", "event_id", "value").toPandas()


def test_resample_dense_grid_and_counts(spark, ev, ev_pd):
    out = resample(
        ev, "ts", "value", every_us=SIX_H_US, group_cols=["user_id"]
    ).toPandas()
    # dense: every group covers min..max bucket with no holes
    for uid, g in out.groupby("user_id"):
        b = sorted(g["bucket"])
        assert b == list(range(b[0], b[-1] + 1))
    # counts and sums match pandas on non-gap buckets; gaps are 0/NaN
    pdf = ev_pd.copy()
    pdf["bucket"] = (
        pdf["ts"].astype("datetime64[us]").astype("int64") // SIX_H_US
    )
    ref = pdf.groupby(["user_id", "bucket"]).agg(
        n=("value", "size"),
        s=("value", lambda v: round(np.round(v * 100).sum() / 100, 2)),
    )
    for row in out.itertuples():
        key = (row.user_id, row.bucket)
        if key in ref.index:
            assert row.n_rows == ref.loc[key, "n"]
            assert row.sum_value == pytest.approx(ref.loc[key, "s"])
        else:
            assert row.n_rows == 0 and pd.isna(row.sum_value)
    # bucket_ts round-trips the bucket index
    assert (
        out["bucket_ts"].astype("datetime64[us]").astype("int64")
        == out["bucket"] * SIX_H_US
    ).all()


def test_resample_no_fill_has_no_gap_rows(spark, ev):
    sparse = resample(
        ev, "ts", "value", every_us=SIX_H_US, group_cols=["user_id"],
        fill=False,
    ).toPandas()
    assert (sparse["n_rows"] > 0).all()


def test_forward_fill(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 5.0), ("a", 3, None), ("a", 4, None),
         ("b", 1, 7.0), ("b", 2, None)],
        "g string, i int, v double",
    )
    got = {
        (r.g, r.i): r.v
        for r in forward_fill(
            df, ["v"], order_col="i", group_cols=["g"]
        ).collect()
    }
    assert got == {("a", 1): None, ("a", 2): 5.0, ("a", 3): 5.0,
                   ("a", 4): 5.0, ("b", 1): 7.0, ("b", 2): 7.0}


def test_ewma_final_matches_pandas(spark, ev, ev_pd):
    out = ewma(
        ev, "value", alpha=0.3, order_cols=["ts", "event_id"],
        group_cols=["user_id"],
    ).toPandas().set_index("user_id")["ewma"]
    for uid, g in ev_pd.groupby("user_id"):
        series = g.sort_values(["ts", "event_id"])["value"]
        want = series.ewm(alpha=0.3, adjust=False).mean().iloc[-1]
        assert out[uid] == pytest.approx(want, rel=1e-12)


def test_ewma_per_row_matches_pandas(spark, ev, ev_pd):
    out = ewma(
        ev, "value", alpha=0.3, order_cols=["ts", "event_id"],
        group_cols=["user_id"], per_row=True,
    ).toPandas()
    assert len(out) == len(ev_pd)
    merged = out.sort_values(["user_id", "ts", "event_id"]).reset_index(
        drop=True
    )
    for uid, g in ev_pd.groupby("user_id"):
        series = g.sort_values(["ts", "event_id"])["value"]
        want = series.ewm(alpha=0.3, adjust=False).mean().to_numpy()
        got = merged[merged["user_id"] == uid]["ewma"].to_numpy()
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_ewma_single_row_group(spark):
    df = spark.createDataFrame([("a", 1, 3.5)], "g string, i int, v double")
    row = ewma(
        df, "v", alpha=0.5, order_cols=["i"], group_cols=["g"]
    ).collect()[0]
    assert row.ewma == 3.5


def test_rolling_zscore_matches_pandas(spark, ev, ev_pd):
    out = rolling_zscore(
        ev, "value", order_cols=["ts", "event_id"], group_cols=["user_id"],
        window_rows=10, min_rows=3,
    ).toPandas()
    merged = out.sort_values(["user_id", "ts", "event_id"]).reset_index(
        drop=True
    )
    for uid, g in ev_pd.groupby("user_id"):
        cents = np.round(
            g.sort_values(["ts", "event_id"])["value"].to_numpy() * 100
        )
        s = pd.Series(cents)
        n = s.rolling(10, min_periods=1).count().to_numpy()
        mean = s.rolling(10, min_periods=1).mean().to_numpy()
        # population variance over the window, like the operator
        var = s.rolling(10, min_periods=1).var(ddof=0).to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (cents - mean) / np.sqrt(var)
        z = np.where((n >= 3) & (var > 0), np.round(z, 6), np.nan)
        got = merged[merged["user_id"] == uid]["zscore"].to_numpy()
        np.testing.assert_allclose(got, z, rtol=1e-6, equal_nan=True)
    # roll_mean is the descaled window mean
    assert (
        merged["roll_mean"].notna().all()
        and (merged["roll_n"] >= 1).all()
    )


def test_rolling_zscore_constant_series_null(spark):
    df = spark.createDataFrame(
        [("a", i, 4.0) for i in range(6)], "g string, i int, v double"
    )
    out = rolling_zscore(
        df, "v", order_cols=["i"], group_cols=["g"], window_rows=4,
        min_rows=3,
    ).toPandas()
    assert out["zscore"].isna().all()  # zero variance -> NULL, not error


def test_rolling_zscore_null_row_does_not_deflate_neighbors(spark):
    # ADVICE r4 regression: a NULL value row inside the trailing window must
    # not count toward n (it contributes nothing to the sums), else
    # roll_mean deflates and z skews for every neighbor that sees it.
    rows = [("a", 0, 10.0), ("a", 1, None), ("a", 2, 20.0), ("a", 3, 30.0)]
    df = spark.createDataFrame(rows, "g string, i int, v double")
    out = (
        rolling_zscore(
            df, "v", order_cols=["i"], group_cols=["g"], window_rows=4,
            min_rows=3,
        )
        .orderBy("i")
        .toPandas()
    )
    # window at i=3 sees values {10, 20, 30}: n=3, mean=20
    assert out.loc[3, "roll_n"] == 3
    assert out.loc[3, "roll_mean"] == 20.0
    # z = (30-20)/std([10,20,30], ddof=0) = 10/8.164966
    np.testing.assert_allclose(out.loc[3, "zscore"], 1.224745, rtol=1e-6)
    # the NULL row itself: moments from {10} alone, z NULL (n < min_rows)
    assert out.loc[1, "roll_n"] == 1 and np.isnan(out.loc[1, "zscore"])


def test_rolling_corr_matches_pandas(spark, ev, ev_pd):
    from pylluminator_spark.operators.timeseries import rolling_corr
    from pyspark.sql import Window as W

    # y = previous value per user (autocorrelation setup)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    df = ev.withColumn("prev", F.lag("value").over(w))
    out = (
        rolling_corr(
            df, "value", "prev",
            order_cols=["ts", "event_id"], group_cols=["user_id"],
            window_rows=20, min_rows=3,
        )
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )
    for uid, g in ev_pd.groupby("user_id"):
        s = g.sort_values(["ts", "event_id"])["value"].reset_index(drop=True)
        xc = np.round(s * 100)
        yc = np.round(s.shift(1) * 100)
        got = out[out["user_id"] == uid]["rolling_corr"].to_numpy()
        for i in range(len(s)):
            lo = max(0, i - 19)
            xs, ys = xc[lo : i + 1], yc[lo : i + 1]
            mask = ys.notna()
            n = int(mask.sum())
            if n < 3:
                assert np.isnan(got[i])
                continue
            r = np.corrcoef(xs[mask], ys[mask])[0, 1]
            assert got[i] == pytest.approx(r, abs=2e-6), (uid, i)


def test_rolling_corr_constant_null(spark):
    from pylluminator_spark.operators.timeseries import rolling_corr

    df = spark.createDataFrame(
        [("a", i, 5.0, float(i)) for i in range(6)],
        "g string, i int, x double, y double",
    )
    out = rolling_corr(
        df, "x", "y", order_cols=["i"], group_cols=["g"], window_rows=4
    ).toPandas()
    assert out["rolling_corr"].isna().all()  # zero x-variance
