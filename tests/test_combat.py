"""ComBat vs an independent numpy implementation of the published
parametric EB algorithm (Johnson et al. 2007)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pylluminator_spark.combat import combat


def combat_numpy(Y, batch, X_cov=None, conv=1e-4, max_iter=200):
    """Reference implementation; Y is samples x probes."""
    batches = sorted(set(batch))
    n, p = Y.shape
    Xb = np.column_stack([(np.array(batch) == b).astype(float) for b in batches])
    X = Xb if X_cov is None else np.hstack([Xb, X_cov])
    nb = len(batches)
    B_hat = np.linalg.solve(X.T @ X, X.T @ Y)
    frac = Xb.sum(0) / n
    grand = frac @ B_hat[:nb]
    var_pooled = ((Y - X @ B_hat) ** 2).sum(0) / n
    stand = np.broadcast_to(grand[None, :], (n, p)).copy()
    if X.shape[1] > nb:
        stand = stand + X[:, nb:] @ B_hat[nb:]
    Z = (Y - stand) / np.sqrt(var_pooled)[None, :]

    out = Y.copy()
    for j, b in enumerate(batches):
        rows = np.array(batch) == b
        Zb = Z[rows]
        nB = Zb.shape[0]
        ghat = Zb.mean(0)
        dhat = Zb.var(0, ddof=1)
        gbar, t2 = ghat.mean(), ghat.var(ddof=1)
        dbar, ds2 = dhat.mean(), dhat.var(ddof=1)
        a_pr = (2 * ds2 + dbar**2) / ds2
        b_pr = (dbar * ds2 + dbar**3) / ds2
        g_old, d_old = ghat.copy(), dhat.copy()
        sum_z = Zb.sum(0)
        ssq = (Zb**2).sum(0)
        for _ in range(max_iter):
            g_new = (t2 * nB * ghat + d_old * gbar) / (t2 * nB + d_old)
            sum2 = ssq - 2 * g_new * sum_z + nB * g_new**2
            d_new = (0.5 * sum2 + b_pr) / (nB / 2 + a_pr - 1)
            change = max(
                np.max(np.abs(g_new - g_old) / np.abs(g_old + 1e-12)),
                np.max(np.abs(d_new - d_old) / np.abs(d_old + 1e-12)),
            )
            g_old, d_old = g_new, d_new
            if change < conv:
                break
        out[rows] = (Z[rows] - g_old[None, :]) / np.sqrt(d_old)[None, :] * np.sqrt(
            var_pooled
        )[None, :] + stand[rows]
    return out


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.RandomState(42)
    n, p = 12, 150
    batch = ["b1"] * 6 + ["b2"] * 6
    age = rng.uniform(20, 70, n)
    true_signal = rng.randn(p) * 2
    Y = (
        true_signal[None, :]
        + 0.02 * age[:, None]
        + np.where(np.array(batch) == "b2", 1.5, 0.0)[:, None]  # batch shift
        + rng.randn(n, p) * 0.5
    )
    Y[np.array(batch) == "b2"] *= 1.3  # batch scale effect
    samples = [f"s{i:02d}" for i in range(n)]
    return Y, batch, age, samples


def _long_df(spark, Y, samples):
    n, p = Y.shape
    recs = [
        (f"pr{j:04d}", samples[i], float(Y[i, j]))
        for i in range(n)
        for j in range(p)
    ]
    return spark.createDataFrame(recs, ["probe_id", "sample", "value"])


def test_combat_matches_numpy(spark, dataset):
    Y, batch, age, samples = dataset
    values = _long_df(spark, Y, samples)
    sheet = spark.createDataFrame(
        list(zip(samples, batch, [float(a) for a in age])),
        ["sample", "batch", "age"],
    )
    got = combat(values, sheet, "batch", ["age"]).toPandas()
    mat = got.pivot(index="sample", columns="probe_id", values="value").sort_index()

    want = combat_numpy(
        Y.copy(), batch, X_cov=np.array(age)[:, None]
    )
    cols = sorted(f"pr{j:04d}" for j in range(Y.shape[1]))
    order = np.argsort([f"pr{j:04d}" for j in range(Y.shape[1])])
    assert list(mat.columns) == cols
    assert np.allclose(mat.to_numpy(), want[:, order], atol=1e-6)


def test_combat_removes_batch_shift(spark, dataset):
    Y, batch, age, samples = dataset
    values = _long_df(spark, Y, samples)
    sheet = spark.createDataFrame(
        list(zip(samples, batch, [float(a) for a in age])),
        ["sample", "batch", "age"],
    )
    got = combat(values, sheet, "batch", ["age"]).toPandas()
    merged = got.merge(
        pd.DataFrame({"sample": samples, "batch": batch}), on="sample"
    )
    before_gap = abs(
        Y[np.array(batch) == "b1"].mean() - Y[np.array(batch) == "b2"].mean()
    )
    after = merged.groupby("batch")["value"].mean()
    after_gap = abs(after["b1"] - after["b2"])
    assert after_gap < before_gap * 0.1


def test_combat_no_covariates(spark, dataset):
    Y, batch, _age, samples = dataset
    values = _long_df(spark, Y, samples)
    sheet = spark.createDataFrame(list(zip(samples, batch)), ["sample", "batch"])
    got = combat(values, sheet, "batch").toPandas()
    mat = got.pivot(index="sample", columns="probe_id", values="value").sort_index()
    want = combat_numpy(Y.copy(), batch)
    order = np.argsort([f"pr{j:04d}" for j in range(Y.shape[1])])
    assert np.allclose(mat.to_numpy(), want[:, order], atol=1e-6)


def test_combat_batch_stats_matches_numpy(spark, dataset):
    """The gate-facing distributed stage (combat_batch_stats) must agree
    with the numpy standardization: per-(probe, batch) n / sum_z / ssq of
    Z = (Y - stand) / sqrt(var_pooled), plus var_pooled itself."""
    from pylluminator_spark.combat import combat_batch_stats

    Y, batch, age, samples = dataset
    values = _long_df(spark, Y, samples)
    sheet = spark.createDataFrame(
        list(zip(samples, batch, [float(a) for a in age])),
        ["sample", "batch", "age"],
    )
    got = combat_batch_stats(
        values, sheet, "batch", ["age"]
    ).toPandas().set_index(["probe_id", "batch"]).sort_index()

    # numpy twin of the standardization (same as combat_numpy's prologue)
    batches = sorted(set(batch))
    n, p = Y.shape
    Xb = np.column_stack(
        [(np.array(batch) == b).astype(float) for b in batches]
    )
    X = np.hstack([Xb, np.array(age)[:, None]])
    nb = len(batches)
    B_hat = np.linalg.solve(X.T @ X, X.T @ Y)
    frac = Xb.sum(0) / n
    grand = frac @ B_hat[:nb]
    var_pooled = ((Y - X @ B_hat) ** 2).sum(0) / n
    stand = grand[None, :] + X[:, nb:] @ B_hat[nb:]
    Z = (Y - stand) / np.sqrt(var_pooled)[None, :]

    for j, b in enumerate(batches):
        rows = np.array(batch) == b
        Zb = Z[rows]
        for pj in range(p):
            r = got.loc[(f"pr{pj:04d}", b)]
            assert r["n"] == rows.sum()
            np.testing.assert_allclose(r["sum_z"], Zb[:, pj].sum(), atol=1e-8)
            np.testing.assert_allclose(
                r["ssq"], (Zb[:, pj] ** 2).sum(), atol=1e-8
            )
            np.testing.assert_allclose(
                r["var_pooled"], var_pooled[pj], atol=1e-10
            )


def test_combat_batch_stats_null_betas_match_fsum_semantics(spark, dataset):
    """The deterministic sorted folds must keep F.sum's NULL semantics: a
    NULL beta is SKIPPED (not poisoning the probe's sums), and n counts
    non-null values only — a struct collect_list would otherwise keep
    null-field structs and turn every statistic of the probe NULL."""
    from pylluminator_spark.combat import combat_batch_stats

    Y, batch, age, samples = dataset
    values = _long_df(spark, Y, samples)
    # null out one value of probe 0 and ALL values of probe 1
    values = values.withColumn(
        "value",
        F.when(
            (F.col("probe_id") == "pr0000") & (F.col("sample") == samples[0]),
            F.lit(None),
        )
        .when(F.col("probe_id") == "pr0001", F.lit(None))
        .otherwise(F.col("value")),
    )
    sheet = spark.createDataFrame(
        list(zip(samples, batch)), ["sample", "batch"]
    )
    got = (
        combat_batch_stats(values, sheet, "batch")
        .toPandas()
        .set_index(["probe_id", "batch"])
        .sort_index()
    )
    b0 = sorted(set(batch))[0]
    r = got.loc[("pr0000", b0)]
    # sample[0] is in some batch; that batch's n drops by one and the
    # sums stay finite (the NULL was skipped, not propagated)
    import math

    assert math.isfinite(r["sum_z"]) and math.isfinite(r["ssq"])
    n_expected = sum(
        1
        for s, b in zip(samples, batch)
        if b == b0 and s != samples[0]
    ) + (0 if batch[0] == b0 else 0)
    # recompute exactly: batch-b0 samples minus the nulled one if it is in b0
    n_b0 = sum(1 for b in batch if b == b0)
    if batch[0] == b0:
        n_b0 -= 1
    assert r["n"] == n_b0
    # all-NULL probe: every statistic is NULL/NaN, never an error
    r1 = got.loc["pr0001"]
    assert r1["sum_z"].isna().all()
