"""Distributed IRLS logistic regression vs a pure-numpy reference, plus the
codegen predict expression and the quality-feature derivations."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.classifier import (
    LogRegModel,
    logreg_fit,
    logreg_predict_expr,
    newton_step,
    quality_feature_exprs,
)


def _numpy_irls(X, y, max_iter=25, tol=1e-8, ridge=1e-8):
    """Reference IRLS on the dense design (intercept prepended)."""
    Xd = np.hstack([np.ones((len(y), 1)), X])
    beta = np.zeros(Xd.shape[1])
    prev = np.inf
    for _ in range(max_iter):
        eta = Xd @ beta
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = np.maximum(mu * (1 - mu), 1e-10)
        z = eta + (y - mu) / w
        A = Xd.T @ (Xd * w[:, None]) + ridge * np.eye(Xd.shape[1])
        beta = np.linalg.solve(A, Xd.T @ (w * z))
        eps = 1e-12
        loss = -np.mean(
            y * np.log(np.maximum(mu, eps))
            + (1 - y) * np.log(np.maximum(1 - mu, eps))
        )
        if abs(prev - loss) < tol:
            break
        prev = loss
    return beta


@pytest.fixture(scope="module")
def synth(spark):
    rng = np.random.default_rng(42)
    n = 2_000
    X = rng.normal(size=(n, 3))
    true_beta = np.array([0.5, 2.0, -1.0, 0.3])
    p = 1.0 / (1.0 + np.exp(-(true_beta[0] + X @ true_beta[1:])))
    y = (rng.uniform(size=n) < p).astype(float)
    rows = [
        (float(a), float(b), float(c), float(t))
        for (a, b, c), t in zip(X, y)
    ]
    df = spark.createDataFrame(rows, ["x1", "x2", "x3", "y"])
    return df, X, y


def test_fit_matches_numpy_reference(synth):
    df, X, y = synth
    model = logreg_fit(df, ["x1", "x2", "x3"], "y")
    want = _numpy_irls(X, y)
    got = np.array([model.intercept, *model.weights])
    assert model.converged
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_fit_recovers_signs_and_scale(synth):
    df, _, _ = synth
    model = logreg_fit(df, ["x1", "x2", "x3"], "y")
    b = model.weights
    assert b[0] > 1.0 and b[1] < -0.5 and model.intercept > 0
    assert model.log_loss < 0.45


def test_single_newton_step_closed_form(spark):
    # from beta=0: mu=.5, w=.25, z=4y-2  =>  beta1 = 4 (X'X)^-1 X'(y-.5)
    rows = [(1.0, 1.0), (2.0, 0.0), (3.0, 1.0), (4.0, 1.0)]
    df = spark.createDataFrame(rows, ["x", "y"])
    beta, _, n = newton_step(df, ["x"], "y", [0.0, 0.0], ridge=0.0)
    X = np.array([[1.0, r[0]] for r in rows])
    y = np.array([r[1] for r in rows])
    want = 4.0 * np.linalg.solve(X.T @ X, X.T @ (y - 0.5))
    assert n == 4
    np.testing.assert_allclose(beta, want, rtol=1e-12)


def test_predict_expr_matches_model(spark, synth):
    df, X, y = synth
    model = logreg_fit(df, ["x1", "x2", "x3"], "y")
    got = (
        df.select(
            model.predict_expr(["x1", "x2", "x3"]).alias("p"), "x1", "x2", "x3"
        )
        .limit(50)
        .collect()
    )
    for r in got:
        eta = model.intercept + sum(
            w * r[c] for w, c in zip(model.weights, ["x1", "x2", "x3"])
        )
        assert abs(r["p"] - 1.0 / (1.0 + np.exp(-eta))) < 1e-12


def test_predict_expr_is_codegen_no_python(spark, synth):
    df, _, _ = synth
    out = df.select(logreg_predict_expr(["x1"], [1.5], -0.2).alias("p"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_predict_expr_validates_lengths():
    with pytest.raises(ValueError):
        logreg_predict_expr(["a", "b"], [1.0], 0.0)


def test_quality_features_on_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = quality_feature_exprs(F.col("text"))
    out = docs.select(
        *[e.alias(k) for k, e in feats.items()]
    ).limit(20).collect()
    for r in out:
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0.0 <= r["digit_ratio"] <= 1.0
        assert r["n_tokens"] > 0 and r["mean_tok_len"] > 0


def test_end_to_end_quality_model_separates(spark):
    # real shape test: label = "has many stopwords" proxy; the model should
    # fit a boundary that scores stopword-rich docs higher
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = quality_feature_exprs(F.col("text"))
    fdf = docs.select(
        *[e.alias(k) for k, e in feats.items()]
    ).withColumn("y", (F.col("stopword_ratio") > 0.05).cast("double"))
    cols = ["log_n_chars", "mean_tok_len", "punct_ratio", "stopword_ratio"]
    model = logreg_fit(fdf, cols, "y")
    scored = fdf.select(
        "y", model.predict_expr(cols).alias("p")
    ).groupBy("y").agg(F.avg("p").alias("avg_p")).collect()
    by_y = {r["y"]: r["avg_p"] for r in scored}
    assert by_y[1.0] > by_y[0.0] + 0.2


class TestCalibration:
    def _scored(self, spark):
        import random

        rng = random.Random(7)
        rows = []
        for i in range(400):
            p = rng.random()
            # well-calibrated by construction: label ~ Bernoulli(p)
            rows.append((i, p, 1 if rng.random() < p else 0))
        return rows, spark.createDataFrame(rows, ["id", "score", "label"])

    def test_bins_match_python(self, spark):
        from pylluminator_spark.operators.classifier import calibration_bins

        rows, df = self._scored(spark)
        got = {
            r["bin"]: r
            for r in calibration_bins(
                df, "score", "label", bins=10, key_col="id"
            ).collect()
        }
        for b in range(10):
            sub = [r for r in rows if min(9, int(r[1] * 10)) == b]
            assert got[b]["n"] == len(sub)
            assert got[b]["n_pos"] == sum(r[2] for r in sub)
            assert got[b]["frac_pos"] == pytest.approx(
                sum(r[2] for r in sub) / len(sub)
            )
            assert got[b]["avg_score"] == pytest.approx(
                sum(r[1] for r in sub) / len(sub)
            )

    def test_edge_scores_clamp_to_last_bin(self, spark):
        from pylluminator_spark.operators.classifier import calibration_bins

        df = spark.createDataFrame(
            [(0, 1.0, 1), (1, 0.0, 0), (2, 0.999, 1)],
            ["id", "score", "label"],
        )
        got = {r["bin"]: r["n"] for r in
               calibration_bins(df, "score", "label", bins=10).collect()}
        assert got == {0: 1, 9: 2}  # score 1.0 clamps into bin 9

    def test_ece_well_calibrated_is_small(self, spark):
        from pylluminator_spark.operators.classifier import (
            calibration_bins,
            expected_calibration_error,
        )

        _, df = self._scored(spark)
        bins_df = calibration_bins(df, "score", "label", bins=10, key_col="id")
        row = expected_calibration_error(bins_df).collect()[0]
        assert row["n"] == 400
        assert 0.0 <= row["ece"] < 0.15  # Bernoulli(p) labels: near-calibrated
        # miscalibrated scores must raise ECE: shift all scores toward 1
        shifted = df.withColumn("score", F.sqrt(F.col("score")))
        b2 = calibration_bins(shifted, "score", "label", bins=10, key_col="id")
        row2 = expected_calibration_error(b2).collect()[0]
        assert row2["ece"] > row["ece"]

    def test_null_scores_excluded(self, spark):
        from pylluminator_spark.operators.classifier import (
            calibration_bins,
            expected_calibration_error,
        )

        df = spark.createDataFrame(
            [(0, 0.5, 1), (1, None, 0), (2, 0.95, 1)],
            ["id", "score", "label"],
        )
        bins_df = calibration_bins(df, "score", "label", bins=10, key_col="id")
        got = {r["bin"]: r for r in bins_df.collect()}
        assert set(got) == {5, 9}
        assert got[9]["n"] == 1 and got[9]["avg_score"] is not None
        row = expected_calibration_error(bins_df).collect()[0]
        assert row["n"] == 2 and row["ece"] is not None
