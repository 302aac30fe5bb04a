"""QC aggregate layer (reference quality_control.py:55-254, SURVEY A11).

The reference prints per-sample QC reports by slicing the pandas signal
matrix many times. Here each report is ONE distributed aggregation returning
a DataFrame (one row per sample, or per sample x probe_type for rollups):
conditional aggregation replaces repeated slicing, so a full QC pass over N
samples is a single scan of the signal table however large it is.

Cell semantics on the semi-wide signal table (see plans.session.assemble):
- type II: M lives in mg, U lives in ur (mr/ug are structurally NULL)
- type I in-band:  channel R -> mr/ur, channel G -> mg/ug
- type I out-of-band: the opposite channel's cells (oob of a G probe = mr/ur)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

def _t1():
    return F.col("type") == "I"


def _t2():
    return F.col("type") == "II"


def _red():
    return F.col("channel") == "R"


def _green():
    return F.col("channel") == "G"


def _mean_of_cells(cond, cells: list[str]):
    """Mean over several intensity cells restricted to `cond` rows —
    null-skipping like the reference's skipna means."""
    total = sum(
        (F.sum(F.when(cond, F.col(c))) for c in cells), F.lit(0.0)
    )
    n = sum(
        (F.count(F.when(cond, F.col(c))) for c in cells), F.lit(0)
    )
    return total / F.nullif(n, F.lit(0))


def _na_count(cond, cells: list[str]):
    return sum(
        (
            F.sum(
                F.when(cond & F.col(c).isNull(), 1).otherwise(0)
            )
            for c in cells
        ),
        F.lit(0),
    )


def intensity_stats(signal: DataFrame) -> DataFrame:
    """Per-sample intensity QC (reference intensity_stats): in-band means by
    type/channel, out-of-band means, NA counts per signal class. One scan."""
    ib_m = F.when(_t2(), F.col("mg")).when(_green(), F.col("mg")).otherwise(F.col("mr"))
    ib_u = F.when(_t2(), F.col("ur")).when(_green(), F.col("ug")).otherwise(F.col("ur"))
    return signal.groupBy("sample").agg(
        ((F.sum(ib_m) + F.sum(ib_u)) / (F.count(ib_m) + F.count(ib_u))).alias(
            "mean_ib_intensity"
        ),
        F.avg(ib_m + ib_u).alias("mean_total_ib_intensity"),
        _mean_of_cells(_t2(), ["mg", "ur"]).alias("mean_type2"),
        _mean_of_cells(_t1() & _red(), ["mr", "ur"]).alias("mean_ib_red"),
        _mean_of_cells(_t1() & _green(), ["mg", "ug"]).alias("mean_ib_green"),
        _mean_of_cells(_t1() & _green(), ["mr", "ur"]).alias("mean_oob_red"),
        _mean_of_cells(_t1() & _red(), ["mg", "ug"]).alias("mean_oob_green"),
        (_na_count(_t1(), ["mg", "mr"]) + _na_count(_t2(), ["mg"])).alias("na_meth"),
        (_na_count(_t1(), ["ug", "ur"]) + _na_count(_t2(), ["ur"])).alias("na_unmeth"),
        _na_count(_t1() & _red(), ["mg", "mr", "ug", "ur"]).alias("na_type1_red"),
        _na_count(_t1() & _green(), ["mg", "mr", "ug", "ur"]).alias("na_type1_green"),
        _na_count(_t2(), ["mg", "ur"]).alias("na_type2"),
    )


def nb_probes_stats(signal: DataFrame) -> DataFrame:
    """Per-sample probe counts by Infinium type and probe type (reference
    nb_probes_stats) — conditional counts, one scan."""
    c = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    return signal.groupBy("sample").agg(
        F.count(F.lit(1)).alias("n_total"),
        c(_t2()).alias("n_type2"),
        c(_t1() & _green()).alias("n_type1_green"),
        c(_t1() & _red()).alias("n_type1_red"),
        c(F.col("probe_type") == "cg").alias("n_cg"),
        c(F.col("probe_type") == "ch").alias("n_ch"),
        c(F.col("probe_type") == "snp").alias("n_snp"),
    )


def detection_stats(
    pvalues: DataFrame, threshold: float = 0.05, n_manifest_probes: int | None = None
) -> DataFrame:
    """Per-sample detection QC from a pOOBAH p-value table
    (sample, probe_id, probe_type, p_value) — reference detection_stats.

    Includes per-probe_type breakdown via ROLLUP (probe_type NULL row =
    whole-sample totals). `n_manifest_probes` adds manifest probes absent
    from the sample to the missing count, as the reference does.
    """
    agg = pvalues.rollup("sample", "probe_type").agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.when(F.col("p_value").isNull(), 1).otherwise(0)).alias("_na"),
        F.sum(
            F.when(F.col("p_value") < threshold, 1).otherwise(0)
        ).alias("n_detected"),
    ).filter(F.col("sample").isNotNull())
    extra = 0 if n_manifest_probes is None else None
    if n_manifest_probes is not None:
        # missing-from-manifest only applies to the whole-sample rollup row
        extra_col = F.when(
            F.col("probe_type").isNull(),
            F.lit(n_manifest_probes) - F.col("n_probes"),
        ).otherwise(0)
    else:
        extra_col = F.lit(extra)
    return agg.select(
        "sample",
        "probe_type",
        "n_probes",
        (F.col("_na") + extra_col).alias("n_missing"),
        ((F.col("_na") + extra_col) / (F.col("n_probes") + extra_col)).alias(
            "pct_missing"
        ),
        "n_detected",
        (F.col("n_detected") / (F.col("n_probes") - F.col("_na"))).alias(
            "pct_detected"
        ),
    )


def dye_bias_stats(signal: DataFrame) -> DataFrame:
    """Per-sample dye-bias QC (reference dye_bias_stats): median type-I
    in-band total intensity per channel, median of the top 20, and the
    red/green distortion ratios.

    Top-20-per-(sample, channel) uses a partitioned row_number — a per-group
    top-k, never a global sort (the reference's `nlargest(20)` hot spot,
    samples.py:1375-1376).
    """
    t1 = signal.filter(_t1()).select(
        "sample",
        "channel",
        (
            F.when(_red(), F.col("mr") + F.col("ur")).otherwise(
                F.col("mg") + F.col("ug")
            )
        ).alias("total"),
    )
    med = t1.groupBy("sample").agg(
        F.expr("percentile(CASE WHEN channel = 'R' THEN total END, 0.5)").alias(
            "median_red"
        ),
        F.expr("percentile(CASE WHEN channel = 'G' THEN total END, 0.5)").alias(
            "median_green"
        ),
    )
    w = Window.partitionBy("sample", "channel").orderBy(F.desc("total"))
    top = (
        t1.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 20)
        .groupBy("sample")
        .agg(
            F.expr(
                "percentile(CASE WHEN channel = 'R' THEN total END, 0.5)"
            ).alias("top20_median_red"),
            F.expr(
                "percentile(CASE WHEN channel = 'G' THEN total END, 0.5)"
            ).alias("top20_median_green"),
        )
    )
    return med.join(top, "sample").select(
        "sample",
        "median_red",
        "median_green",
        "top20_median_red",
        "top20_median_green",
        (F.col("median_red") / F.col("median_green")).alias("red_green_ratio"),
        (
            (F.col("top20_median_red") / F.col("top20_median_green"))
            / (F.col("median_red") / F.col("median_green"))
        ).alias("red_green_distortion"),
    )


def betas_stats(betas: DataFrame, value_col: str = "beta") -> DataFrame:
    """Per sample (x probe_type rollup) beta QC (reference betas_stats):
    mean, exact median, hypo (<0.3) / hyper (>0.7) fractions, NA counts."""
    b = F.col(value_col)
    return (
        betas.rollup("sample", "probe_type")
        .agg(
            F.avg(b).alias("mean_beta"),
            F.expr(f"percentile({value_col}, 0.5)").alias("median_beta"),
            (
                F.sum(F.when(b < 0.3, 1).otherwise(0)) / F.count(b)
            ).alias("pct_unmeth"),
            (
                F.sum(F.when(b > 0.7, 1).otherwise(0)) / F.count(b)
            ).alias("pct_meth"),
            F.sum(F.when(b.isNull(), 1).otherwise(0)).alias("n_na"),
            (
                F.sum(F.when(b.isNull(), 1).otherwise(0)) / F.count(F.lit(1))
            ).alias("pct_na"),
        )
        .filter(F.col("sample").isNotNull())
    )
