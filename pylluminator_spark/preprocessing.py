"""Preprocessing transforms (SURVEY §2 M2): channel inference, dye-bias
corrections, NOOB background correction, scrub, and pOOBAH detection
p-values — the reference's canonical pipeline (SURVEY §3.2).

Spark-first decomposition of each kernel:

- per-(sample, channel) *scalars* (means, medians, Huber fits) are computed
  with aggregations / grouped-map pandas UDFs producing tiny parameter
  tables, broadcast-joined back, and applied as column expressions;
- the norm-exp convolution (reference stats.py:95-142) is pure column math
  (normal pdf/sf via erfc) running in whole-stage codegen over every cell;
- the ECDF behind pOOBAH (reference samples.py:1529-1607) is the
  sort-merge-window formulation: union background + foreground values, one
  window per (sample, channel) ordered by value, running count of background
  rows — fully distributed, no driver-side vectors;
- only the non-linear dye-bias fit (reference samples.py:1340-1427), whose
  state is a per-sample interpolation table over ~128k sorted intensities,
  uses a grouped-map pandas UDF per sample (bounded group size).

All citations are into /root/reference/pylluminator/.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pylluminator_spark.functions.stats import norm_logpdf_expr, norm_logsf_expr

NON_UNIQUE_MASK_PATTERN = "(?i)(nonuniq|M_nonuniq|multi|M_mapping)"


# ---------------------------------------------------------------------------
# Cell helpers over the semi-wide schema
# ---------------------------------------------------------------------------

def _ib_cells():
    """In-band (value, count) exprs per row: type I G -> (mg, ug), type I R
    -> (mr, ur), type II -> (mg, ur) (reference samples.py:1017-1042)."""
    t, ch = F.col("type"), F.col("channel")
    m = F.when(t == "II", F.col("mg")).when(ch == "G", F.col("mg")).otherwise(F.col("mr"))
    u = F.when(t == "II", F.col("ur")).when(ch == "G", F.col("ug")).otherwise(F.col("ur"))
    return m, u


def _oob_cells():
    """Out-of-band cells: type I only, opposite channel."""
    ch = F.col("channel")
    m = F.when(ch == "G", F.col("mr")).otherwise(F.col("mg"))
    u = F.when(ch == "G", F.col("ur")).otherwise(F.col("ug"))
    return m, u


def negative_controls(signal: DataFrame) -> DataFrame:
    """Negative control probes (reference samples.py:921-933)."""
    return signal.filter(
        (F.col("probe_type") == "ctl") & F.col("probe_id").rlike("(?i)negative")
    )


def mean_ib_intensity(signal: DataFrame) -> DataFrame:
    """A5 — per-sample mean over all in-band cells, NaN-skipping
    (reference samples.py:1017-1042). Returns (sample, mean_ib)."""
    m, u = _ib_cells()
    non_ctl = signal.filter(F.col("probe_type") != "ctl")
    long_vals = non_ctl.select(
        "sample", F.explode(F.array(m, u)).alias("v")
    ).filter(F.col("v").isNotNull())
    return long_vals.groupBy("sample").agg(F.avg("v").alias("mean_ib"))


def total_ib_intensity(signal: DataFrame) -> DataFrame:
    """A6 — per (probe, sample) sum of in-band cells; 0 -> NULL
    (reference samples.py:1044-1072)."""
    m, u = _ib_cells()
    tot = (
        F.when(m.isNull() & u.isNull(), F.lit(None))
        .otherwise(F.coalesce(m, F.lit(0.0)) + F.coalesce(u, F.lit(0.0)))
    )
    return signal.select(
        "sample",
        "probe_id",
        "type",
        "channel",
        F.nullif(tot, F.lit(0.0)).alias("total_ib"),
    )


# ---------------------------------------------------------------------------
# A9 — type I channel inference (reference samples.py:940-1011)
# ---------------------------------------------------------------------------

def infer_type1_channel(
    signal: DataFrame,
    switch_failed: bool = False,
    mask_failed: bool = False,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Rewrite the ``channel`` of type I probes to the channel carrying the
    max signal across samples; tie -> 'R' (reference samples.py:940-1011,
    docstring: "If max values are equals, the channel is set to R").

    Returns (new_signal, summary, failed_probes):
    - summary: (channel, inferred_channel, n) counts
    - failed_probes: probe_ids whose max < 95th pct of the inferred
      background or with any NA cell (for the 'failed_probes_inferTypeI'
      mask when ``mask_failed``).

    The reference mutates an index level then remaps every mask
    (samples.py:997-1008); in long form this is one groupBy + broadcast join
    — masks key on probe_id and need no remap.
    """
    t1 = signal.filter(F.col("type") == "I")
    per_probe = t1.groupBy("probe_id").agg(
        F.max(F.greatest("mg", "ug")).alias("_gmax"),
        F.max(F.greatest("mr", "ur")).alias("_rmax"),
        F.first("channel").alias("_manifest_channel"),
        F.max(
            F.when(
                F.col("mg").isNull()
                | F.col("mr").isNull()
                | F.col("ug").isNull()
                | F.col("ur").isNull(),
                1,
            ).otherwise(0)
        ).alias("_has_na"),
    )
    per_probe = per_probe.withColumn(
        "inferred_channel",
        F.when(F.col("_gmax").isNull() & F.col("_rmax").isNull(), F.col("_manifest_channel"))
        .when(F.col("_rmax").isNull(), F.lit("G"))
        .when(F.col("_gmax").isNull(), F.lit("R"))
        .when(F.col("_rmax") >= F.col("_gmax"), F.lit("R"))
        .otherwise(F.lit("G")),
    )

    # Background: cells on the channel NOT inferred (reference 980-984):
    # G-cells of R-inferred probes + R-cells of G-inferred probes.
    with_inf = t1.join(
        F.broadcast(per_probe.select("probe_id", "inferred_channel")), "probe_id"
    )
    bg_vals = with_inf.select(
        F.explode(
            F.when(
                F.col("inferred_channel") == "R", F.array("mg", "ug")
            ).otherwise(F.array("mr", "ur"))
        ).alias("v")
    ).filter(F.col("v").isNotNull())
    bg_max_row = bg_vals.agg(F.expr("percentile(v, 0.95)").alias("p95")).collect()[0]
    bg_max = bg_max_row["p95"] if bg_max_row["p95"] is not None else float("inf")

    per_probe = per_probe.withColumn(
        "_failed",
        (F.greatest(F.coalesce("_gmax", F.lit(float("-inf"))),
                    F.coalesce("_rmax", F.lit(float("-inf")))) < F.lit(bg_max))
        | (F.col("_has_na") == 1),
    )
    if not switch_failed:
        per_probe = per_probe.withColumn(
            "inferred_channel",
            F.when(F.col("_failed"), F.col("_manifest_channel")).otherwise(
                F.col("inferred_channel")
            ),
        )

    summary = (
        per_probe.groupBy(
            F.col("_manifest_channel").alias("channel"), F.col("inferred_channel")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    failed_probes = per_probe.filter(F.col("_failed")).select("probe_id")

    new_signal = (
        signal.join(
            F.broadcast(per_probe.select("probe_id", "inferred_channel")),
            "probe_id",
            "left",
        )
        .withColumn(
            "channel",
            F.when(
                (F.col("type") == "I") & F.col("inferred_channel").isNotNull(),
                F.col("inferred_channel"),
            ).otherwise(F.col("channel")),
        )
        .drop("inferred_channel")
    )
    _ = mask_failed  # caller adds the mask from failed_probes
    return new_signal, summary, failed_probes


# ---------------------------------------------------------------------------
# K6 — linear / control-based dye bias (reference samples.py:1257-1338)
# ---------------------------------------------------------------------------

def _scale_channels(signal: DataFrame, factors: DataFrame) -> DataFrame:
    """Multiply each sample's G cells by f_g and R cells by f_r.

    ``factors``: (sample, f_g, f_r) — broadcast-joined parameter table.
    """
    out = signal.join(F.broadcast(factors), "sample", "left")
    fg = F.coalesce(F.col("f_g"), F.lit(1.0))
    fr = F.coalesce(F.col("f_r"), F.lit(1.0))
    return (
        out.withColumn("mg", F.col("mg") * fg)
        .withColumn("ug", F.col("ug") * fg)
        .withColumn("mr", F.col("mr") * fr)
        .withColumn("ur", F.col("ur") * fr)
        .drop("f_g", "f_r")
    )


def dye_bias_correction(
    signal: DataFrame, reference: DataFrame | None = None
) -> DataFrame:
    """Control-probe dye-bias scaling (reference samples.py:1257-1297):
    factor_channel = reference_mean / mean(norm-control probes of channel).

    Norm controls: green = probe_id ~ 'norm_c|norm_g', mean of mg; red =
    'norm_a|norm_t', mean of ur (reference samples.py:910-911).
    """
    if reference is None:
        reference = mean_ib_intensity(signal)
    ctl = signal.filter(F.col("probe_type") == "ctl")
    green = ctl.filter(F.col("probe_id").rlike("(?i)(norm_c|norm_g)")).groupBy(
        "sample"
    ).agg(F.avg("mg").alias("norm_g"))
    red = ctl.filter(F.col("probe_id").rlike("(?i)(norm_a|norm_t)")).groupBy(
        "sample"
    ).agg(F.avg("ur").alias("norm_r"))
    factors = (
        reference.join(green, "sample")
        .join(red, "sample")
        .select(
            "sample",
            (F.col("mean_ib") / F.col("norm_g")).alias("f_g"),
            (F.col("mean_ib") / F.col("norm_r")).alias("f_r"),
        )
    )
    return _scale_channels(signal, factors)


def dye_bias_correction_l(
    signal: DataFrame, reference: DataFrame | None = None
) -> DataFrame:
    """Linear dye bias: scale each channel so its type-I in-band median hits
    the reference level (reference samples.py:1300-1338)."""
    if reference is None:
        reference = mean_ib_intensity(signal)
    t1 = signal.filter(F.col("type") == "I")
    med_g = (
        t1.filter(F.col("channel") == "G")
        .select("sample", F.explode(F.array("mg", "ug")).alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("sample")
        .agg(F.expr("percentile(v, 0.5)").alias("med_g"))
    )
    med_r = (
        t1.filter(F.col("channel") == "R")
        .select("sample", F.explode(F.array("mr", "ur")).alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("sample")
        .agg(F.expr("percentile(v, 0.5)").alias("med_r"))
    )
    factors = (
        reference.join(med_g, "sample")
        .join(med_r, "sample")
        .select(
            "sample",
            (F.col("mean_ib") / F.col("med_g")).alias("f_g"),
            (F.col("mean_ib") / F.col("med_r")).alias("f_r"),
        )
    )
    return _scale_channels(signal, factors)


# ---------------------------------------------------------------------------
# K5 — non-linear dye bias (reference samples.py:1340-1427)
# ---------------------------------------------------------------------------

def _quantile_normalize_to_target(source: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Rank-map ``source`` onto the interpolated distribution of ``target``
    (reference stats.py:145-167, W5/K4)."""
    target_sorted = np.sort(target)
    source_ranks = source.argsort().argsort()
    interp_target = np.interp(
        np.linspace(0, 1, len(source)),
        np.linspace(0, 1, len(target_sorted)),
        target_sorted,
    )
    return interp_target[source_ranks]


def dye_bias_correction_nl(signal: DataFrame) -> DataFrame:
    """Non-linear dye bias: per sample, map each channel's intensities to the
    midpoint between the channel and its quantile-normalized counterpart,
    with linear extensions outside the observed range
    (reference samples.py:1340-1427).

    Grouped-map pandas UDF per sample: the fit state (sorted intensity +
    midpoint vectors, ~128k floats/channel) is inherently per-sample. Group
    size is bounded by the probe universe — safe at any sample count.
    """
    schema = signal.schema

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        t1 = pdf[pdf["type"] == "I"]
        sorted_int = {}
        for ch, cols in (("G", ["mg", "ug"]), ("R", ["mr", "ur"])):
            vals = t1.loc[t1["channel"] == ch, cols].to_numpy().ravel()
            vals = vals[~np.isnan(vals)]
            sorted_int[ch] = np.sort(vals)
        if (
            len(sorted_int["G"]) == 0
            or len(sorted_int["R"]) == 0
            or sorted_int["G"].max() <= 0
            or sorted_int["R"].max() <= 0
        ):
            return pdf

        # distortion check (reference samples.py:1372-1385)
        tot = {}
        for ch, cols in (("G", ["mg", "ug"]), ("R", ["mr", "ur"])):
            sub = t1[t1["channel"] == ch]
            tot[ch] = (sub[cols[0]].fillna(0) + sub[cols[1]].fillna(0)).to_numpy()
        med_r, med_g = np.median(tot["R"]), np.median(tot["G"])
        top_r = np.median(np.sort(tot["R"])[-20:])
        top_g = np.median(np.sort(tot["G"])[-20:])
        if top_g == 0 or med_g == 0 or (top_r / top_g) / (med_r / med_g) > 10:
            return pdf  # caller masks green probes (reference adds a mask)

        for ch, other, cols in (("R", "G", ["mr", "ur"]), ("G", "R", ["mg", "ug"])):
            chan_int = sorted_int[ch]
            normalized = np.sort(
                _quantile_normalize_to_target(chan_int, sorted_int[other])
            )
            midpoint = (chan_int + normalized) / 2
            lo, hi = chan_int.min(), chan_int.max()
            mid_lo, mid_hi = midpoint.min(), midpoint.max()

            def _map(x: np.ndarray) -> np.ndarray:
                out = x.astype("float64").copy()
                ok = ~np.isnan(out)
                within = ok & (out >= lo) & (out <= hi)
                above = ok & (out > hi)
                below = ok & (out < lo)
                out[within] = np.interp(out[within], chan_int, midpoint)
                out[above] = out[above] - hi + mid_hi
                out[below] = (
                    np.nan if lo == 0 else out[below] * (mid_lo / lo)
                )
                return out

            for c in cols:
                pdf[c] = _map(pdf[c].to_numpy()).astype("float32")
        return pdf

    return signal.groupBy("sample").applyInPandas(_fit, schema)


# ---------------------------------------------------------------------------
# K1-K3 — NOOB background correction (reference samples.py:1429-1502,
# stats.py:29-142)
# ---------------------------------------------------------------------------

def _huber(values: np.ndarray, k: float = 1.5, tol: float = 1e-6):
    """Huber M-estimator of (mu, sigma) (reference stats.py:29-61):
    median/MAD init, iterated clipped mean to tolerance."""
    values = values[~np.isnan(values)]
    if len(values) == 0:
        return None, None
    mu = np.median(values)
    sigma = np.median(np.abs(values - mu)) / 0.6745  # statsmodels mad norm
    if sigma == 0:
        return None, None
    while True:
        clipped = np.clip(values, mu - k * sigma, mu + k * sigma)
        mu_new = clipped.mean()
        if abs(mu - mu_new) < tol * sigma:
            break
        mu = mu_new
    return mu, sigma


def noob_fit_params(
    signal: DataFrame,
    masks: DataFrame | None = None,
    use_negative_controls: bool = True,
) -> DataFrame:
    """Per-(sample, channel) NOOB parameters (mu, sigma, alpha)
    (reference samples.py:1429-1502 + stats.py:64-92).

    Background = OOB cells of type I probes (+ negative controls), non-unique
    probes masked; zeros -> 1; capped at median + 10*IQR. Foreground = in-band
    + type II cells. The Huber fit needs the full vector -> grouped-map UDF
    per sample emitting one tiny parameter row per channel.
    """
    work = signal
    if masks is not None:
        from pylluminator_spark.operators.masks import apply_mask_nullout

        work = apply_mask_nullout(signal, masks)
    work = work.withColumn(
        "_nonuniq", F.coalesce(F.col("mask_info"), F.lit("")).rlike(NON_UNIQUE_MASK_PATTERN)
    )

    is_t1 = F.col("type") == "I"
    is_neg = (F.col("probe_type") == "ctl") & F.col("probe_id").rlike("(?i)negative")
    clean = ~F.col("_nonuniq")

    def _vals(df: DataFrame, ch: str, kind: str, cols: list[str]) -> DataFrame:
        return df.select(
            "sample",
            F.lit(ch).alias("ch"),
            F.lit(kind).alias("kind"),
            F.explode(F.array(*cols)).alias("v"),
        ).filter(F.col("v").isNotNull())

    # Background: OOB cells (G-cells of R probes / R-cells of G probes)
    bg_parts = [
        _vals(work.filter(is_t1 & clean & (F.col("channel") == "R")), "G", "bg", ["mg", "ug"]),
        _vals(work.filter(is_t1 & clean & (F.col("channel") == "G")), "R", "bg", ["mr", "ur"]),
    ]
    if use_negative_controls:
        neg = work.filter(is_neg)
        bg_parts += [
            _vals(neg, "G", "bg", ["mg", "ug"]),
            _vals(neg, "R", "bg", ["mr", "ur"]),
        ]
    # Foreground: in-band type I + type II cells
    fg_parts = [
        _vals(work.filter(is_t1 & clean & (F.col("channel") == "G")), "G", "fg", ["mg", "ug"]),
        _vals(work.filter(is_t1 & clean & (F.col("channel") == "R")), "R", "fg", ["mr", "ur"]),
        _vals(work.filter((F.col("type") == "II") & clean), "G", "fg", ["mg"]),
        _vals(work.filter((F.col("type") == "II") & clean), "R", "fg", ["ur"]),
    ]
    long = bg_parts[0]
    for part in bg_parts[1:] + fg_parts:
        long = long.unionByName(part)

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        sample = pdf["sample"].iloc[0]
        for ch in ("G", "R"):
            bg = pdf.loc[(pdf["ch"] == ch) & (pdf["kind"] == "bg"), "v"].to_numpy()
            fg = pdf.loc[(pdf["ch"] == ch) & (pdf["kind"] == "fg"), "v"].to_numpy()
            if len(bg[bg > 0]) < 100:
                out.append((sample, ch, None, None, None))
                continue
            bg = bg.copy()
            fg = fg.copy()
            bg[bg == 0] = 1
            fg[fg == 0] = 1
            q1, q3 = np.percentile(bg, [25, 75])
            bg = bg[bg < np.median(bg) + 10 * (q3 - q1)]
            mu, sigma = _huber(bg)
            if mu is None:
                out.append((sample, ch, None, None, None))
                continue
            fg_mu, _sig = _huber(fg)
            if fg_mu is None:
                out.append((sample, ch, None, None, None))
                continue
            alpha = max(fg_mu - mu, 10)
            out.append((sample, ch, float(mu), float(sigma), float(alpha)))
        return pd.DataFrame(
            out, columns=["sample", "channel", "mu", "sigma", "alpha"]
        )

    return long.groupBy("sample").applyInPandas(
        _fit, "sample string, channel string, mu double, sigma double, alpha double"
    )


def _norm_exp_convolution_expr(x, mu, sigma, alpha, offset: float):
    """K3 — closed-form norm-exp convolution as a column expression
    (reference stats.py:95-142): ``shifted + sigma^2 * exp(logpdf - logsf)``
    evaluated at 0 for N(shifted, sigma), clipped >= 1e-6, plus offset."""
    variance = sigma * sigma
    shifted = x - mu - variance / alpha
    log_ratio = norm_logpdf_expr(F.lit(0.0), shifted, sigma) - norm_logsf_expr(
        F.lit(0.0), shifted, sigma
    )
    adjusted = shifted + variance * F.exp(log_ratio)
    corrected = F.greatest(adjusted, F.lit(1e-6)) + F.lit(offset)
    # parameter missing (failed fit) -> leave the value unchanged
    return F.when(
        mu.isNull() | sigma.isNull() | alpha.isNull() | x.isNull(), x
    ).otherwise(corrected.cast("float"))


def noob_background_correction(
    signal: DataFrame,
    masks: DataFrame | None = None,
    use_negative_controls: bool = True,
    offset: float = 15,
) -> DataFrame:
    """NOOB: fit per-(sample, channel) background params, then apply the
    norm-exp convolution to every cell of that channel — entirely JVM-side
    after the tiny parameter join (reference samples.py:1429-1502)."""
    params = noob_fit_params(signal, masks, use_negative_controls)
    pg = params.filter(F.col("channel") == "G").select(
        "sample",
        F.col("mu").alias("mu_g"),
        F.col("sigma").alias("sigma_g"),
        F.col("alpha").alias("alpha_g"),
    )
    pr = params.filter(F.col("channel") == "R").select(
        "sample",
        F.col("mu").alias("mu_r"),
        F.col("sigma").alias("sigma_r"),
        F.col("alpha").alias("alpha_r"),
    )
    out = signal.join(F.broadcast(pg), "sample", "left").join(
        F.broadcast(pr), "sample", "left"
    )
    for c, mu, sg, al in (
        ("mg", "mu_g", "sigma_g", "alpha_g"),
        ("ug", "mu_g", "sigma_g", "alpha_g"),
        ("mr", "mu_r", "sigma_r", "alpha_r"),
        ("ur", "mu_r", "sigma_r", "alpha_r"),
    ):
        out = out.withColumn(
            c,
            _norm_exp_convolution_expr(
                F.col(c), F.col(mu), F.col(sg), F.col(al), offset
            ),
        )
    return out.drop("mu_g", "sigma_g", "alpha_g", "mu_r", "sigma_r", "alpha_r")


# ---------------------------------------------------------------------------
# K7 — scrub background (reference samples.py:1504-1527)
# ---------------------------------------------------------------------------

def scrub_background_correction(
    signal: DataFrame, masks: DataFrame | None = None
) -> DataFrame:
    """Subtract the per-(sample, channel) OOB median from every cell, clipped
    at 1 (reference samples.py:1504-1527). Meant to run after NOOB."""
    work = signal
    if masks is not None:
        from pylluminator_spark.operators.masks import apply_mask_nullout

        work = apply_mask_nullout(signal, masks)
    t1 = work.filter(F.col("type") == "I")
    oob_g = (
        t1.filter(F.col("channel") == "R")
        .select("sample", F.explode(F.array("mg", "ug")).alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("sample")
        .agg(F.expr("percentile(v, 0.5)").alias("med_g"))
    )
    oob_r = (
        t1.filter(F.col("channel") == "G")
        .select("sample", F.explode(F.array("mr", "ur")).alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("sample")
        .agg(F.expr("percentile(v, 0.5)").alias("med_r"))
    )
    out = signal.join(F.broadcast(oob_g), "sample", "left").join(
        F.broadcast(oob_r), "sample", "left"
    )
    for c, med in (("mg", "med_g"), ("ug", "med_g"), ("mr", "med_r"), ("ur", "med_r")):
        out = out.withColumn(
            c,
            F.when(F.col(med).isNull(), F.col(c)).otherwise(
                F.greatest(F.col(c) - F.col(med), F.lit(1.0)).cast("float")
            ),
        )
    return out.drop("med_g", "med_r")


# ---------------------------------------------------------------------------
# K8/A10 — pOOBAH (reference samples.py:1529-1607)
# ---------------------------------------------------------------------------

def poobah(
    signal: DataFrame,
    masks: DataFrame | None = None,
    use_negative_controls: bool = True,
    threshold: float = 0.05,
) -> tuple[DataFrame, DataFrame]:
    """Detection p-values from the ECDF of out-of-band background:
    ``p = min_channel(1 - ECDF_bg_channel(max(M, U)))``.

    Distributed ECDF: union background values (flag 1) with foreground query
    values (flag 0) and take a running count of background rows over a window
    per (sample, channel) ordered by value — count(bg <= x) without any
    driver-side vector. Ties order background first (ECDF is inclusive).

    Low-signal fallback: when sum(bg) <= 100 the reference substitutes a
    uniform 0..999 prior (samples.py:1583-1589) — generated via sequence().

    Returns (pvalues, poobah_mask): pvalues is (sample, probe_id, p_value);
    the mask holds rows with p_value >= threshold, named ``poobah_<t>``.
    """
    work = signal
    if masks is not None:
        from pylluminator_spark.operators.masks import apply_mask_nullout

        work = apply_mask_nullout(signal, masks)
    work = work.withColumn(
        "_nonuniq",
        F.coalesce(F.col("mask_info"), F.lit("")).rlike(NON_UNIQUE_MASK_PATTERN),
    )

    is_t1 = F.col("type") == "I"
    is_neg = (F.col("probe_type") == "ctl") & F.col("probe_id").rlike("(?i)negative")
    bg_src = work.filter(~F.col("_nonuniq") & (is_t1 | is_neg))
    bg_g = bg_src.filter(is_neg | (F.col("channel") == "R")).select(
        "sample", F.lit("G").alias("ch"), F.explode(F.array("mg", "ug")).alias("value")
    )
    bg_r = bg_src.filter(is_neg | (F.col("channel") == "G")).select(
        "sample", F.lit("R").alias("ch"), F.explode(F.array("mr", "ur")).alias("value")
    )
    bg = bg_g.unionByName(bg_r).filter(F.col("value").isNotNull())

    # Low-signal fallback prior
    bg_stats = bg.groupBy("sample", "ch").agg(F.sum("value").alias("_sum"))
    low = bg_stats.filter(F.col("_sum") <= 100).select("sample", "ch")
    prior = low.select(
        "sample", "ch", F.explode(F.sequence(F.lit(0), F.lit(999))).alias("value")
    ).select("sample", "ch", F.col("value").cast("double").alias("value"))
    bg = (
        bg.join(low.withColumn("_low", F.lit(True)), ["sample", "ch"], "left")
        .filter(F.col("_low").isNull())
        .drop("_low")
        .select("sample", "ch", F.col("value").cast("double").alias("value"))
        .unionByName(prior)
    )

    fg = signal.select(
        "sample",
        "probe_id",
        F.explode(
            F.array(
                F.struct(F.lit("G").alias("ch"), F.greatest("mg", "ug").cast("double").alias("value")),
                F.struct(F.lit("R").alias("ch"), F.greatest("mr", "ur").cast("double").alias("value")),
            )
        ).alias("q"),
    ).select("sample", "probe_id", "q.ch", "q.value")

    union = bg.select(
        "sample", "ch", "value", F.lit(1).alias("_is_bg"), F.lit(None).cast("string").alias("probe_id")
    ).unionByName(
        fg.select("sample", "ch", "value", F.lit(0).alias("_is_bg"), "probe_id")
    )
    w = (
        Window.partitionBy("sample", "ch")
        .orderBy(F.col("value").asc_nulls_last(), F.col("_is_bg").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    counted = union.withColumn("_cum_bg", F.sum("_is_bg").over(w))
    n_bg = bg.groupBy("sample", "ch").agg(F.count(F.lit(1)).alias("_n_bg"))
    pvals_per_channel = (
        counted.filter(F.col("_is_bg") == 0)
        .join(F.broadcast(n_bg), ["sample", "ch"])
        .withColumn(
            "p_channel",
            F.when(F.col("value").isNull(), F.lit(None)).otherwise(
                F.lit(1.0) - F.col("_cum_bg") / F.col("_n_bg")
            ),
        )
    )
    pvalues = pvals_per_channel.groupBy("sample", "probe_id").agg(
        F.min("p_channel").alias("p_value")
    )
    poobah_mask = pvalues.filter(F.col("p_value") >= threshold).select(
        F.lit(f"poobah_{threshold}").alias("mask_name"), "sample", "probe_id"
    )
    return pvalues, poobah_mask
