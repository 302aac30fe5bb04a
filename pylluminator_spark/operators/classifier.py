"""Distributed logistic-regression quality classifier.

Beyond-reference operator (driver north star): the standard corpus-quality
filter (CCNet / GPT-3 / LLaMA pipelines) is a linear classifier over cheap
text features, scoring "does this look like reference text?". At 100 TB the
training shape matters as much as inference:

- **Inference** is a pure codegen expression (`logreg_predict_expr`):
  sigmoid of a dot product over feature columns — no shuffle, no Python.
- **Training** (`logreg_fit`) is Newton/IRLS over SUFFICIENT STATISTICS:
  each iteration aggregates X'WX (d x d) and X'Wz (d) with ONE map-side
  partial + final hash aggregation — O(d^2) running sums, never a row
  collect — and solves the tiny (d+1) system driver-side with numpy.
  d is the feature count (~10), so per-iteration driver state is ~1 KB
  regardless of corpus size; iterations are full-scan passes over a
  cached featurized projection (persist() once, unpersist at the end).

This is the same distributed-suffstats + driver-solve split as the
closed-form OLS in dm.py and the Gram-trick PCA in ml.py.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pylluminator_spark.functions.text import (
    mean_token_length_expr,
    punct_ratio_expr,
    stopword_ratio_expr,
    tokens_expr,
)


def quality_feature_exprs(text: Column) -> dict[str, Column]:
    """The cheap per-document features a corpus-quality classifier uses:
    log length, token stats, punctuation / stopword / digit ratios. All
    codegen; add domain features freely (the fit is generic)."""
    toks = tokens_expr(text)
    n_tok = F.size(toks)
    return {
        "log_n_chars": F.log(F.greatest(F.length(text), F.lit(1)).cast("double")),
        "n_tokens": n_tok.cast("double"),
        "mean_tok_len": mean_token_length_expr(toks).cast("double"),
        "punct_ratio": punct_ratio_expr(text).cast("double"),
        "stopword_ratio": stopword_ratio_expr(toks).cast("double"),
        "digit_ratio": (
            F.length(F.regexp_replace(text, r"[^0-9]", ""))
            / F.greatest(F.length(text), F.lit(1))
        ).cast("double"),
    }


def logreg_predict_expr(
    features: Sequence[Column | str],
    weights: Sequence[float],
    intercept: float,
) -> Column:
    """P(label=1 | x) = sigmoid(w.x + b) as a single codegen expression."""
    if len(features) != len(weights):
        raise ValueError("features and weights must align")
    s = F.lit(float(intercept))
    for f, w in zip(features, weights):
        col = F.col(f) if isinstance(f, str) else f
        s = s + col.cast("double") * F.lit(float(w))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-s))


class LogRegModel(NamedTuple):
    weights: list[float]
    intercept: float
    n_iter: int
    converged: bool
    log_loss: float

    def predict_expr(self, features: Sequence[Column | str]) -> Column:
        return logreg_predict_expr(features, self.weights, self.intercept)


def _suffstat_aggs(cols: list[str], w: Column, z: Column, y: Column):
    """The O(d^2) running sums one IRLS iteration needs (upper triangle of
    X'WX, the X'Wz vector, and the monitoring log-loss)."""
    d = len(cols)
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(
                F.sum(F.col(cols[i]) * F.col(cols[j]) * w).alias(f"xx_{i}_{j}")
            )
        aggs.append(F.sum(F.col(cols[i]) * w * z).alias(f"xz_{i}"))
    mu = F.col("_mu")
    eps = F.lit(1e-12)
    aggs.append(
        F.sum(
            -(y * F.log(F.greatest(mu, eps))
              + (1 - y) * F.log(F.greatest(1 - mu, eps)))
        ).alias("nll")
    )
    aggs.append(F.count(F.lit(1)).alias("n"))
    return aggs


def newton_step(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    beta: Sequence[float],
    ridge: float = 1e-8,
) -> tuple[list[float], float, int]:
    """One IRLS/Newton update: aggregate sufficient statistics over the
    corpus (single distributed pass), solve the (d+1) x (d+1) system on
    the driver. ``beta`` is [intercept, w_1..w_d]. Returns (new_beta,
    mean_log_loss, n_rows)."""
    cols = ["_one", *feature_cols]
    eta = F.lit(float(beta[0]))
    for c, b in zip(feature_cols, beta[1:]):
        eta = eta + F.col(c).cast("double") * F.lit(float(b))
    mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    work = df.select(
        F.lit(1.0).alias("_one"),
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("_y"),
        eta.alias("_eta"),
        mu.alias("_mu"),
    )
    # IRLS working weight/response; w floored so a saturated mu can't zero
    # the system (z uses eta, not logit(mu), to stay finite there)
    w = F.greatest(F.col("_mu") * (1 - F.col("_mu")), F.lit(1e-10))
    z = F.col("_eta") + (F.col("_y") - F.col("_mu")) / w
    row = work.agg(*_suffstat_aggs(cols, w, z, F.col("_y"))).collect()[0]

    d = len(cols)
    xtx = np.zeros((d, d))
    xtz = np.zeros(d)
    for i in range(d):
        for j in range(i, d):
            xtx[i, j] = xtx[j, i] = row[f"xx_{i}_{j}"]
        xtz[i] = row[f"xz_{i}"]
    xtx += ridge * np.eye(d)
    new_beta = np.linalg.solve(xtx, xtz)
    return [float(b) for b in new_beta], float(row["nll"]) / row["n"], row["n"]


def logreg_fit(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    *,
    max_iter: int = 25,
    tol: float = 1e-8,
    ridge: float = 1e-8,
) -> LogRegModel:
    """Fit logistic regression by distributed IRLS (see module docstring).
    Feature/label columns must already exist (use
    :func:`quality_feature_exprs` to derive them from text)."""
    cols = list(feature_cols)
    proj = df.select(label_col, *cols).persist()
    try:
        beta = [0.0] * (len(cols) + 1)
        prev_loss = math.inf
        converged = False
        loss = math.inf
        it = 0
        for it in range(1, max_iter + 1):
            beta, loss, _ = newton_step(proj, cols, label_col, beta, ridge)
            if abs(prev_loss - loss) < tol:
                converged = True
                break
            prev_loss = loss
        return LogRegModel(
            weights=beta[1:],
            intercept=beta[0],
            n_iter=it,
            converged=converged,
            log_loss=loss,
        )
    finally:
        proj.unpersist()


def calibration_bins(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    *,
    bins: int = 10,
    key_col: str | None = None,
) -> DataFrame:
    """Reliability table for a probabilistic classifier: bucket scores
    (assumed in [0, 1]) into ``bins`` equal-width bins and report, per
    bin: row count, positive count, empirical positive fraction, and the
    mean predicted score — the table behind reliability diagrams and ECE
    (Guo et al., ICML 2017), i.e. the QA step after training a
    FineWeb-Edu-style quality classifier.

    Rows with a NULL score are excluded (nothing to bin — and they would
    otherwise poison the bin mean). One keyed hash aggregate with
    map-side partial combine; output is at
    most ``bins`` rows. ``frac_pos`` is a single integer/integer
    division (bit-deterministic). ``avg_score`` is a float mean: when
    ``key_col`` is given it folds in sorted key order
    (bit-reproducible across engines/partitionings — the repo's
    hash-gate discipline); when None it uses the native unordered
    ``avg`` (engine-grade path, cheaper at scale)."""
    s = F.col(score_col).cast("double")
    # symmetric clamp (ADVICE r6): score 1.0 folds into the last bin,
    # and an out-of-range score < 0 folds into bin 0 instead of silently
    # emitting negative bin ids that downstream ECE would still weight
    b = F.greatest(
        F.lit(0),
        F.least(F.lit(bins - 1), F.floor(s * F.lit(bins)).cast("int")),
    ).alias("bin")
    y = F.col(label_col).cast("long")
    # NULL scores are excluded up front: F.least skips NULLs, so a NULL
    # score would otherwise land in bin bins-1 AND poison that bin's
    # avg_score fold (and any downstream ECE) to NULL
    base = scored.filter(s.isNotNull()).select(
        b,
        s.alias("_s"),
        y.alias("_y"),
        *( [F.col(key_col).alias("_k")] if key_col else [] ),
    )
    if key_col is None:
        sum_score = F.sum("_s")
    else:
        sum_score = F.aggregate(
            F.sort_array(
                F.collect_list(F.struct(F.col("_k"), F.col("_s").alias("s")))
            ),
            F.lit(0.0),
            lambda acc, r: acc + r["s"],
        )
    n = F.count(F.lit(1))
    return (
        base.groupBy("bin")
        .agg(
            n.alias("n"),
            F.sum("_y").alias("n_pos"),
            (F.sum("_y") / n.cast("double")).alias("frac_pos"),
            (sum_score / n.cast("double")).alias("avg_score"),
        )
    )


def expected_calibration_error(bins_df: DataFrame) -> DataFrame:
    """ECE off a ``calibration_bins`` table: sum_b (n_b / N) *
    |frac_pos_b - avg_score_b|. Folds the <= ``bins`` terms in bin order
    so the scalar is bit-reproducible. Returns a 1-row (n, ece) frame —
    the whole reduction runs over the dimension-sized bin table."""
    term = F.struct(
        F.col("bin"),
        (
            F.col("n").cast("double")
            * F.abs(F.col("frac_pos") - F.col("avg_score"))
        ).alias("t"),
    )
    return bins_df.agg(
        F.sum("n").alias("n"),
        (
            F.aggregate(
                F.sort_array(F.collect_list(term)),
                F.lit(0.0),
                lambda acc, r: acc + r["t"],
            )
            / F.sum("n").cast("double")
        ).alias("ece"),
    )
