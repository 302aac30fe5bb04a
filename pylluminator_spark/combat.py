"""ComBat batch-effect correction (reference samples.py:1609-1701, SURVEY
K12), re-derived for Spark from the published parametric empirical-Bayes
algorithm (Johnson, Li & Rabinovic 2007; the reference wraps pycombat_norm).

Shape asymmetry drives the design: probes are huge (the fact dimension),
samples/batches are small (the model dimension). Everything per-sample is
broadcast; everything per-probe stays distributed:

1. Standardization — per-probe OLS against the (batch one-hot | covariates)
   design. The design X is n_samples x k and SHARED by every probe, so the
   pseudo-inverse H = (X'X)^-1 X' is computed once on the driver and
   broadcast as literal rows; per-probe coefficients are then k sums over
   samples (one groupBy, no matrix library on executors).
2. EB priors — moments of gamma_hat/delta_hat across probes per batch:
   plain groupBy aggregations.
3. Iterative solver — per (probe, batch) fixed point over SUFFICIENT
   STATISTICS only (n, sum_z, ssq): sum_s (z_s - g)^2 = ssq - 2 g sum_z +
   n g^2, so each iteration is scalar arithmetic — run vectorized in an
   Arrow-batched mapInPandas over the (probe x batch)-sized table.
4. Adjustment — pure column expressions.

No probe-dimension data ever reaches the driver.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pylluminator_spark.functions.methyl import beta_to_m_expr, m_to_beta_expr
from pylluminator_spark.functions.text import let_expr


def _det_sum(value_expr, key_col: str = "sample"):
    """Order-fixed float sum: fold the group's values in ascending `key_col`
    order so the IEEE op sequence is identical on every engine and every
    run (the cross-engine determinism discipline used by
    tfidf_cosine_pairs / rolling_corr; DuckDB twin is
    ``list_reduce(list(x ORDER BY sample), (a, b) -> a + b)`` — the 0.0
    seed is exact because 0.0 + x == x for finite x). NULL semantics
    match ``F.sum`` exactly: NULL values are skipped, and a group with no
    non-NULL value yields NULL (a struct-typed collect_list would
    otherwise KEEP null-field structs and poison the fold). Costs a
    collect_list shuffle instead of a map-side partial sum, so it is
    opt-in: only the SQL-checkable gate surface pays it."""
    arr = F.filter(
        F.sort_array(
            F.collect_list(
                F.struct(F.col(key_col).alias("_k"), value_expr.alias("_v"))
            )
        ),
        lambda x: x["_v"].isNotNull(),
    )
    # let_expr binds the sorted/filtered array once (Spark does no CSE
    # across the size guard and the fold)
    return let_expr(
        arr,
        lambda a: F.when(
            F.size(a) > 0,
            F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x["_v"]),
        ),
    )


def _design_matrix(
    sheet_pdf: pd.DataFrame, batch_col: str, covariate_cols: list[str]
) -> tuple[np.ndarray, list[str], list[str]]:
    """Full-rank design [batch one-hots | covariates] in sample order."""
    batches = sorted(sheet_pdf[batch_col].astype(str).unique())
    X = np.zeros((len(sheet_pdf), len(batches) + len(covariate_cols)))
    for j, b in enumerate(batches):
        X[:, j] = (sheet_pdf[batch_col].astype(str) == b).to_numpy(dtype=float)
    for j, c in enumerate(covariate_cols):
        X[:, len(batches) + j] = sheet_pdf[c].to_numpy(dtype=float)
    return X, batches, list(sheet_pdf["sample"].astype(str))


def _standardize(
    values: DataFrame,
    sheet: DataFrame,
    batch_col: str,
    covariate_cols: list[str],
    value_col: str,
    deterministic: bool = False,
) -> DataFrame:
    """Steps 1 of the module docstring: per-probe OLS against the broadcast
    (batch one-hot | covariates) design, pooled variance, and the
    standardized residual ``_z`` per (probe, sample). Returns the long
    table with ``_batch``, ``_varp``, ``_stand``, ``_z`` attached — the
    shared input of the EB moment stage (``combat_batch_stats``) and the
    full ``combat`` solver.

    ``deterministic=True`` replaces every per-probe float SUM (the OLS
    coefficients and the pooled variance) with the sample-ordered fold of
    ``_det_sum`` so the result is bit-identical across engines and runs —
    required by the hash-compared ``combat_batch_stats`` gate, where the
    unordered-sum version flips ROUND(6) boundaries once row counts grow
    (observed at sf0.01+). The default keeps Spark's map-side partial
    sums for the iterative ``combat`` solver, which is convergence-bound,
    not hash-compared."""
    sheet_pdf = (
        sheet.select("sample", batch_col, *covariate_cols).toPandas()
    ).reset_index(drop=True)
    X, batches, sample_order = _design_matrix(sheet_pdf, batch_col, covariate_cols)
    n_samples, k = X.shape
    n_batches = len(batches)
    batch_sizes = X[:, :n_batches].sum(axis=0)
    batch_frac = batch_sizes / n_samples

    H = np.linalg.solve(X.T @ X, X.T)  # k x n_samples pseudo-inverse

    spark = values.sparkSession
    # broadcast per-sample model rows: H column, design row, batch label
    model_rows = [
        (
            sample_order[s],
            str(sheet_pdf[batch_col].iloc[s]),
            [float(H[j, s]) for j in range(k)],
            [float(X[s, j]) for j in range(k)],
        )
        for s in range(n_samples)
    ]
    model = spark.createDataFrame(
        model_rows, ["sample", "_batch", "_h", "_x"]
    )

    v = values.select("probe_id", "sample", F.col(value_col).alias("_y")).join(
        F.broadcast(model), "sample"
    )

    # 1. per-probe OLS coefficients: b_j = sum_s H[j,s] * y_s
    _sum = _det_sum if deterministic else F.sum
    if deterministic:
        # ONE sample-sorted collect shared by all k coefficient folds —
        # k separate _det_sum aggregates would collect and sort the same
        # per-probe rows k times over. Each fold walks the same sorted
        # sequence with term H[j,s] * y_s, so results are bit-identical
        # to per-coefficient folds; NULL y rows are skipped like F.sum
        # (H entries are never NULL).
        rows = F.filter(
            F.sort_array(F.collect_list(F.struct("sample", "_y", "_h"))),
            lambda x: x["_y"].isNotNull(),
        )

        def _coef_fold(j: int):
            return F.when(
                F.size("_rows") > 0,
                F.aggregate(
                    "_rows",
                    F.lit(0.0),
                    lambda acc, x: acc + x["_h"][j] * x["_y"],
                ),
            ).alias(f"_b{j}")

        coefs = v.groupBy("probe_id").agg(rows.alias("_rows")).select(
            "probe_id", *[_coef_fold(j) for j in range(k)]
        )
    else:
        coefs = v.groupBy("probe_id").agg(
            *[
                F.sum(F.element_at("_h", j + 1) * F.col("_y")).alias(
                    f"_b{j}"
                )
                for j in range(k)
            ]
        )

    # grand mean = batch-fraction-weighted batch intercepts; fitted value
    # uses the full design row
    grand_mean = sum(
        (F.lit(float(batch_frac[j])) * F.col(f"_b{j}") for j in range(n_batches)),
        F.lit(0.0),
    ).alias("_grand")
    coefs = coefs.select("probe_id", *[f"_b{j}" for j in range(k)], grand_mean)

    fitted = sum(
        (F.element_at("_x", j + 1) * F.col(f"_b{j}") for j in range(k)),
        F.lit(0.0),
    )
    with_fit = v.join(coefs, "probe_id").withColumn("_fit", fitted)
    # residual squared as an explicit multiply (not pow) so the IEEE op
    # matches the DuckDB twin's (y - fitted) * (y - fitted) bit-for-bit
    resid_sq = (F.col("_y") - F.col("_fit")) * (F.col("_y") - F.col("_fit"))
    var_pooled = with_fit.groupBy("probe_id").agg(
        (_sum(resid_sq) / F.lit(float(n_samples))).alias("_varp")
    )

    # stand_mean per (probe, sample) = grand + covariate part of the fit
    cov_part = sum(
        (
            F.element_at("_x", j + 1) * F.col(f"_b{j}")
            for j in range(n_batches, k)
        ),
        F.lit(0.0),
    )
    return (
        with_fit.join(var_pooled, "probe_id")
        .withColumn("_stand", F.col("_grand") + cov_part)
        .withColumn(
            "_z",
            (F.col("_y") - F.col("_stand")) / F.sqrt(F.col("_varp")),
        )
    )


def combat_batch_stats(
    values: DataFrame,
    sheet: DataFrame,
    batch_col: str = "batch",
    covariate_cols: list[str] | None = None,
    *,
    value_col: str = "value",
) -> DataFrame:
    """K12's DISTRIBUTED stage as a standalone, SQL-checkable operator
    (reference samples.py:1609-1701 wraps pycombat_norm whole; here the
    only part that touches fact-table-scale data is exactly this): the
    per-(probe, batch) sufficient statistics of the standardized values —
    (n, sum_z, ssq) — that the EB fixed point (``combat`` step 3) iterates
    over, plus the per-probe pooled variance. Everything after this table
    is (probe x batch)-sized scalar arithmetic.

    Returns (probe_id, batch, n, sum_z, ssq, var_pooled).

    Every float SUM here and in the standardization it calls is the
    sample-ordered ``_det_sum`` fold — this operator is hash-compared to
    a DuckDB twin, and unordered partial sums flip ROUND(6) boundaries
    at sf0.01+ (ADVICE r5)."""
    z = _standardize(
        values, sheet, batch_col, covariate_cols or [], value_col,
        deterministic=True,
    )
    return z.groupBy(
        "probe_id", F.col("_batch").alias("batch")
    ).agg(
        F.count("_z").alias("n"),
        _det_sum(F.col("_z")).alias("sum_z"),
        _det_sum(F.col("_z") * F.col("_z")).alias("ssq"),
        F.first("_varp").alias("var_pooled"),
    )


def combat(
    values: DataFrame,
    sheet: DataFrame,
    batch_col: str = "batch",
    covariate_cols: list[str] | None = None,
    *,
    value_col: str = "value",
    convergence: float = 1e-4,
    max_iter: int = 200,
) -> DataFrame:
    """EB batch correction of a long (probe_id, sample, value) table.

    `sheet` is the sample dimension (sample, batch, covariates...) — always
    dimension-sized, collected once. Returns (probe_id, sample, value)
    with batch effects removed. Probes with missing values in any sample are
    corrected with per-batch statistics over present values.
    """
    covariate_cols = covariate_cols or []
    z = _standardize(
        values, sheet, batch_col, covariate_cols, value_col
    ).persist()

    # 2. per-(probe, batch) sufficient statistics
    stats = z.groupBy("probe_id", "_batch").agg(
        F.count("_z").alias("_n"),
        F.sum("_z").alias("_sum_z"),
        F.sum(F.col("_z") * F.col("_z")).alias("_ssq"),
    )
    # EB priors per batch across probes (gamma_hat = mean z in batch)
    pri = (
        stats.withColumn("_ghat", F.col("_sum_z") / F.col("_n"))
        .withColumn(
            "_dhat",
            (F.col("_ssq") - F.col("_n") * F.col("_ghat") * F.col("_ghat"))
            / (F.col("_n") - 1),
        )
        .groupBy("_batch")
        .agg(
            F.avg("_ghat").alias("_gbar"),
            F.var_samp("_ghat").alias("_t2"),
            F.avg("_dhat").alias("_dbar"),
            F.var_samp("_dhat").alias("_ds2"),
        )
        .collect()
    )
    priors = {
        r["_batch"]: (
            float(r["_gbar"]),
            float(r["_t2"]),
            # inverse-gamma moment priors (aprior/bprior of the published
            # algorithm): a = (2 s2 + m^2)/s2, b = (m s2 + m^3)/s2
            (2 * float(r["_ds2"]) + float(r["_dbar"]) ** 2) / float(r["_ds2"]),
            (
                float(r["_dbar"]) * float(r["_ds2"]) + float(r["_dbar"]) ** 3
            ) / float(r["_ds2"]),
        )
        for r in pri
    }

    out_schema = StructType(
        [
            StructField("probe_id", StringType()),
            StructField("_batch", StringType()),
            StructField("_gstar", DoubleType()),
            StructField("_dstar", DoubleType()),
        ]
    )

    conv, mx = convergence, max_iter

    def it_sol(batches_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches_iter:
            out = []
            for b, grp in pdf.groupby("_batch"):
                gbar, t2, a_pr, b_pr = priors[b]
                n = grp["_n"].to_numpy(dtype=float)
                sum_z = grp["_sum_z"].to_numpy(dtype=float)
                ssq = grp["_ssq"].to_numpy(dtype=float)
                ghat = sum_z / n
                dhat = (ssq - n * ghat * ghat) / np.maximum(n - 1, 1)
                g_old, d_old = ghat.copy(), dhat.copy()
                for _ in range(mx):
                    g_new = (t2 * n * ghat + d_old * gbar) / (t2 * n + d_old)
                    # sum (z - g)^2 from sufficient stats
                    sum2 = ssq - 2 * g_new * sum_z + n * g_new * g_new
                    d_new = (0.5 * sum2 + b_pr) / (n / 2 + a_pr - 1)
                    change = max(
                        np.max(np.abs(g_new - g_old) / np.abs(g_old + 1e-12)),
                        np.max(np.abs(d_new - d_old) / np.abs(d_old + 1e-12)),
                    )
                    g_old, d_old = g_new, d_new
                    if change < conv:
                        break
                out.append(
                    pd.DataFrame(
                        {
                            "probe_id": grp["probe_id"],
                            "_batch": b,
                            "_gstar": g_old,
                            "_dstar": d_old,
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                columns=["probe_id", "_batch", "_gstar", "_dstar"]
            )

    star = stats.mapInPandas(it_sol, schema=out_schema)

    # 4. adjust
    adjusted = (
        z.join(star, ["probe_id", "_batch"])
        .withColumn(
            "_adj",
            (F.col("_z") - F.col("_gstar"))
            / F.sqrt(F.col("_dstar"))
            * F.sqrt(F.col("_varp"))
            + F.col("_stand"),
        )
        .select("probe_id", "sample", F.col("_adj").alias(value_col))
    )
    return adjusted


def combat_betas(
    betas: DataFrame,
    sheet: DataFrame,
    batch_col: str = "batch",
    covariate_cols: list[str] | None = None,
    *,
    value_col: str = "beta",
) -> DataFrame:
    """Reference flow (samples.py:1646-1698): betas -> M-values -> ComBat ->
    betas, all in-engine."""
    m = betas.select(
        "probe_id", "sample", beta_to_m_expr(F.col(value_col)).alias("value")
    )
    corrected = combat(m, sheet, batch_col, covariate_cols)
    return corrected.select(
        "probe_id", "sample", m_to_beta_expr(F.col("value")).alias(value_col)
    )
