"""ML layer: distributed Gram-trick PCA vs a numpy reference, variance
top-k, metadata correlation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pylluminator_spark import ml


@pytest.fixture(scope="module")
def betas(spark):
    """Deterministic synthetic long betas: 300 probes x 8 samples."""
    df = (
        spark.range(0, 300 * 8, 1, 4)
        .withColumn("probe_id", F.concat(F.lit("cg"), (F.col("id") % 300)))
        .withColumn("sample", F.concat(F.lit("s"), F.floor(F.col("id") / 300)))
        .withColumn(
            "beta",
            ((F.col("id") * 2654435761) % 1000) / 1000.0
            + F.when(F.col("id") % 300 < 30, F.floor(F.col("id") / 300) * 0.1).otherwise(0.0),
        )
        .select("probe_id", "sample", "beta")
        .cache()
    )
    df.count()
    return df


def _to_matrix(betas_df):
    pdf = betas_df.toPandas().pivot(index="sample", columns="probe_id", values="beta")
    return pdf.sort_index()


def test_probe_variance_matches_numpy(betas):
    got = {r.probe_id: r.variance for r in ml.probe_variance(betas).collect()}
    mat = _to_matrix(betas)
    want = mat.var(axis=0, ddof=0)
    for pid, v in want.items():
        assert got[pid] == pytest.approx(v, rel=1e-12)


def test_top_variance_probes(betas):
    top = ml.top_variance_probes(betas, k=25).collect()
    assert len(top) == 25
    mat = _to_matrix(betas)
    want = set(
        mat.var(axis=0, ddof=0)
        .sort_values(ascending=False, kind="stable")
        .head(40)
        .index
    )
    # all returned probes are within the numpy top-40 (ties allow reordering)
    assert {r.probe_id for r in top} <= want
    vs = [r.variance for r in top]
    assert vs == sorted(vs, reverse=True)


def test_pca_matches_numpy_reference(betas):
    scores_df, ratio = ml.pca(betas, n_components=3, n_probes=None)
    got = scores_df.toPandas().set_index("sample").sort_index()

    mat = _to_matrix(betas)
    X = mat.to_numpy()
    Xc = X - X.mean(axis=0, keepdims=True)
    G = Xc @ Xc.T
    eigvals, eigvecs = np.linalg.eigh(G)
    order = np.argsort(eigvals)[::-1]
    eigvals, eigvecs = np.clip(eigvals[order], 0, None), eigvecs[:, order]
    ref = eigvecs[:, :3] * np.sqrt(eigvals[:3])
    for j in range(3):
        pivot = np.argmax(np.abs(ref[:, j]))
        if ref[pivot, j] < 0:
            ref[:, j] = -ref[:, j]

    assert np.allclose(got.to_numpy(), ref, atol=1e-8)
    assert np.allclose(ratio, eigvals[:3] / eigvals.sum(), atol=1e-12)
    # explained variance ordered and in (0, 1]
    assert all(0 < r <= 1 for r in ratio)
    assert list(ratio) == sorted(ratio, reverse=True)


def test_pca_with_probe_selection_runs(betas):
    scores_df, ratio = ml.pca(betas, n_components=2, n_probes=50)
    assert scores_df.count() == 8
    assert len(ratio) == 2


def test_metadata_correlation(spark):
    pdf = pd.DataFrame(
        {
            "sample": [f"s{i}" for i in range(10)],
            "age": [20, 25, 30, 35, 40, 45, 50, 55, 60, 65],
            "dose": [1.0, 1.5, 2.0, 2.5, 3.0, 3.5, 4.0, 4.5, 5.0, 5.5],
            "group": ["a", "a", "a", "a", "a", "b", "b", "b", "b", "b"],
        }
    )
    sheet = spark.createDataFrame(pdf)
    corr = ml.metadata_correlation(sheet).collect()
    cm = {(r.col_a, r.col_b): r.corr for r in corr}
    assert cm[("age", "age")] == pytest.approx(1.0)
    assert cm[("age", "dose")] == pytest.approx(1.0)  # perfectly linear
    assert cm[("age", "group")] == pytest.approx(
        np.corrcoef(pdf["age"], pd.factorize(pdf["group"])[0])[0, 1], abs=1e-9
    )
    assert cm[("dose", "age")] == cm[("age", "dose")]
