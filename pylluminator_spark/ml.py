"""Dimensionality reduction & metadata association (reference ml.py:14-86,
visualizations.py:2198, SURVEY K16/A20).

The reference selects top-variance probes, transposes to a samples x probes
matrix, and runs sklearn models (PCA et al.). Spark-first re-design:

- Variance ranking is a distributed groupBy over the long betas table
  (probes can be billions of rows at 100 TB; never collected).
- PCA exploits the shape asymmetry: n_samples is small (dozens-thousands)
  while n_probes is huge. The samples x samples Gram matrix
  G = Xc Xc^T (Xc = row-centered data) is computed DISTRIBUTIVELY as a
  per-probe pairwise-product aggregation — O(n_samples^2) output, driver
  eigendecomposition is trivial. Identical math to sklearn PCA scores
  (X in samples-by-probes orientation), no giant matrix ever materializes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def probe_variance(betas: DataFrame, value_col: str = "beta") -> DataFrame:
    """Per-probe across-sample variance (population, ddof=0 like np.var) and
    support count, null-skipping."""
    return betas.groupBy("probe_id").agg(
        F.var_pop(value_col).alias("variance"),
        F.count(value_col).alias("n_samples"),
    )


def top_variance_probes(
    betas: DataFrame, k: int = 1000, value_col: str = "beta"
) -> DataFrame:
    """Top-k probes by variance (reference ml.py:62-66). Deterministic
    tie-break on probe_id. TakeOrdered (no full sort) at any scale."""
    return (
        probe_variance(betas, value_col)
        .orderBy(F.desc("variance"), "probe_id")
        .limit(k)
    )


def _gram_matrix(betas: DataFrame, value_col: str) -> tuple[np.ndarray, list[str]]:
    """Samples x samples Gram matrix of the probe-centered data, computed as
    a distributed sum of per-probe outer products.

    For each probe, center values across samples, emit all (s1, s2) value
    products, and sum per pair: G[i,j] = sum_p xc[p,i]*xc[p,j]. The shuffle
    key is (sample_i, sample_j) — n^2 groups, each a scalar.
    """
    centered = betas.withColumn(
        "_c",
        F.col(value_col)
        - F.avg(value_col).over(Window.partitionBy("probe_id")),
    ).select("probe_id", "sample", "_c")
    a = centered.select(
        "probe_id", F.col("sample").alias("s1"), F.col("_c").alias("x1")
    )
    b = centered.select(
        "probe_id", F.col("sample").alias("s2"), F.col("_c").alias("x2")
    )
    pairs = (
        a.join(b, "probe_id")
        .groupBy("s1", "s2")
        .agg(F.sum(F.col("x1") * F.col("x2")).alias("g"))
        .collect()
    )
    samples = sorted({r["s1"] for r in pairs})
    idx = {s: i for i, s in enumerate(samples)}
    G = np.zeros((len(samples), len(samples)))
    for r in pairs:
        G[idx[r["s1"]], idx[r["s2"]]] = r["g"]
    return G, samples


def pca(
    betas: DataFrame,
    n_components: int = 2,
    *,
    n_probes: int | None = 1000,
    value_col: str = "beta",
) -> tuple[DataFrame, np.ndarray]:
    """PCA of samples in probe-space (reference ml.py:37-76).

    Returns (scores DataFrame(sample, pc1..pcK), explained_variance_ratio).

    The data matrix is conceptually samples x probes; features (probes) are
    mean-centered, matching sklearn's PCA. With the Gram trick, scores are
    U * sqrt(eigvals) from the eigendecomposition of G = Xc Xc^T.
    """
    data = betas.na.drop(subset=[value_col])
    if n_probes is not None:
        top = top_variance_probes(data, n_probes, value_col).select("probe_id")
        data = data.join(F.broadcast(top), "probe_id")
    # probe-centering == feature centering in the samples x probes view
    G, samples = _gram_matrix(data, value_col)
    eigvals, eigvecs = np.linalg.eigh(G)
    order = np.argsort(eigvals)[::-1]
    eigvals, eigvecs = eigvals[order], eigvecs[:, order]
    eigvals = np.clip(eigvals, 0.0, None)
    k = min(n_components, len(samples))
    scores = eigvecs[:, :k] * np.sqrt(eigvals[:k])
    # deterministic sign: largest-|.| coordinate of each PC is positive
    for j in range(k):
        pivot = np.argmax(np.abs(scores[:, j]))
        if scores[pivot, j] < 0:
            scores[:, j] = -scores[:, j]
    total = eigvals.sum()
    ratio = eigvals[:k] / total if total > 0 else np.zeros(k)
    spark = betas.sparkSession
    rows = [
        (s, *[float(scores[i, j]) for j in range(k)])
        for i, s in enumerate(samples)
    ]
    out = spark.createDataFrame(
        rows, ["sample"] + [f"pc{j + 1}" for j in range(k)]
    )
    return out, ratio


def metadata_correlation(
    sheet: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Pearson correlation matrix between sample-sheet columns (reference
    visualizations.py:2198): non-numeric columns are factorized (dense-rank
    encoded), then pairwise corr via exact sum aggregations — one pass.

    Returns long form: (col_a, col_b, corr).
    """
    cols = columns or [c for c, _ in sheet.dtypes if c != "sample"]
    enc = sheet
    for c, t in sheet.dtypes:
        if c in cols and t in ("string", "boolean"):
            enc = enc.withColumn(
                c, F.dense_rank().over(Window.orderBy(F.col(c))).cast("double")
            )
        elif c in cols:
            enc = enc.withColumn(c, F.col(c).cast("double"))
    aggs = []
    for i, a in enumerate(cols):
        aggs.append(F.avg(a).alias(f"_m_{a}"))
        for b in cols[i:]:
            aggs.append(F.avg(F.col(a) * F.col(b)).alias(f"_p_{a}_{b}"))
    s = enc.agg(*aggs).collect()[0]
    rows = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            cov = s[f"_p_{a}_{b}"] - s[f"_m_{a}"] * s[f"_m_{b}"]
            va = s[f"_p_{a}_{a}"] - s[f"_m_{a}"] ** 2
            vb = s[f"_p_{b}_{b}"] - s[f"_m_{b}"] ** 2
            corr = (
                cov / np.sqrt(va * vb) if va > 0 and vb > 0 else float("nan")
            )
            rows.append((a, b, float(corr)))
            if a != b:
                rows.append((b, a, float(corr)))
    return sheet.sparkSession.createDataFrame(rows, ["col_a", "col_b", "corr"])
