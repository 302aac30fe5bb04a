"""Categorical association statistics: contingency tables, chi-square
independence, Cramer's V, entropy, and mutual information.

Beyond-reference operators (driver north star): corpus curation constantly
asks "is feature X independent of source Y?" (language vs crawl, quality
bucket vs domain, label vs split). These statistics all derive from ONE
contingency-count aggregate — cells are bounded by the attribute
cardinalities, never the row count, so at 100 TB the plan is one keyed
count plus arithmetic on a tiny cell table.

Float determinism: every statistic is a SUM of per-cell float terms, and
a distributed float sum is order-dependent. Cell tables are small by
construction, so all sums here fold in sorted cell order
(``aggregate(sort_array(collect_list(struct(key, term))))`` — the repo's
deterministic-fold recipe), making results bit-identical across
partitionings and engines. p-values (which need the incomplete gamma) are
left to the caller/scipy-free test layer; the gate covers the statistics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sorted_fold_sum(key: Column, term: Column) -> Column:
    """Deterministic float sum: fold term values in ascending key order.
    0.0 + x == x, so the empty-init left fold reproduces the plain sorted
    sum exactly."""
    arr = F.sort_array(
        F.collect_list(F.struct(key.alias("k"), term.alias("t")))
    )
    return F.aggregate(
        arr, F.lit(0.0), lambda acc, s: acc + s["t"]
    )


def crosstab_counts(df: DataFrame, x: str, y: str) -> DataFrame:
    """The (x, y, n) contingency table — one hash aggregate with map-side
    combine; NULL categories are excluded (test what you observe)."""
    return (
        df.where(F.col(x).isNotNull() & F.col(y).isNotNull())
        .groupBy(x, y)
        .agg(F.count(F.lit(1)).alias("n"))
    )


def chi_square(df: DataFrame, x: str, y: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns. Returns one row: (n, n_x, n_y, dof, chi2, cramers_v).

    Plan: one contingency aggregate -> row/column marginals by window
    sums over the CELL table (cardinality-bounded, not data-bounded) ->
    one sorted-fold reduction. chi2 folds the standard
    ``(n_ij - e_ij)^2 / e_ij`` terms in cell order; Cramer's V =
    ``sqrt(chi2 / (n * (min(n_x, n_y) - 1)))`` normalizes to [0, 1].
    """
    cells = crosstab_counts(df, x, y)
    # zero-observed cells still contribute e_ij to chi2: expand to the
    # FULL marginal grid (cross join of the two marginal tables — both
    # cardinality-bounded, never data-bounded) and left-join the counts
    rx = cells.groupBy(F.col(x).alias("_x")).agg(
        F.sum("n").alias("_rx")
    )
    cy = cells.groupBy(F.col(y).alias("_y")).agg(
        F.sum("n").alias("_cy")
    )
    tot = cells.agg(F.sum("n").alias("_tot"))
    with_marg = (
        rx.crossJoin(cy)
        .crossJoin(F.broadcast(tot))
        .join(
            cells.select(
                F.col(x).alias("_x"), F.col(y).alias("_y"), "n"
            ),
            ["_x", "_y"],
            "left",
        )
        .withColumn("n", F.coalesce("n", F.lit(0)))
    )
    # delta * delta, not pow(delta, 2): multiplication is IEEE-exact and
    # shape-identical across engines (libm pow is not guaranteed to be)
    e_ij = F.col("_rx") * F.col("_cy") / F.col("_tot")
    delta = F.col("n").cast("double") - e_ij
    term = delta * delta / e_ij
    agg = with_marg.agg(
        F.max("_tot").alias("n"),
        F.countDistinct("_x").alias("n_x"),
        F.countDistinct("_y").alias("n_y"),
        _sorted_fold_sum(F.struct("_x", "_y"), term).alias("chi2"),
    )
    return agg.select(
        "n",
        "n_x",
        "n_y",
        ((F.col("n_x") - 1) * (F.col("n_y") - 1)).alias("dof"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (
                    F.col("n")
                    * (F.least("n_x", "n_y") - F.lit(1)).cast("double")
                )
            ),
            6,
        ).alias("cramers_v"),
    )


def entropy(df: DataFrame, col: str, *, base2: bool = True) -> DataFrame:
    """Shannon entropy of a categorical column (one row: n, n_classes,
    entropy). Terms fold in category order for bit-stable output."""
    counts = (
        df.where(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window

    tot = F.sum("n").over(Window.partitionBy())
    p = F.col("n") / tot
    log = F.log2(p) if base2 else F.log(p)
    cells = counts.select(
        F.col(col).alias("_k"), F.col("n"), (-p * log).alias("_t"), tot.alias("_tot")
    )
    return cells.agg(
        F.max("_tot").alias("n"),
        F.count(F.lit(1)).alias("n_classes"),
        F.round(_sorted_fold_sum(F.col("_k"), F.col("_t")), 6).alias(
            "entropy"
        ),
    )


def mutual_information(
    df: DataFrame, x: str, y: str, *, base2: bool = True
) -> DataFrame:
    """Mutual information I(X; Y) between two categorical columns (one
    row: n, mi). MI >= 0, and 0 iff independent — the standard
    feature-vs-label association score. Same cell-table plan and sorted
    fold as chi_square."""
    from pyspark.sql import Window

    cells = crosstab_counts(df, x, y)
    wx = Window.partitionBy(x)
    wy = Window.partitionBy(y)
    wall = Window.partitionBy()
    with_marg = cells.select(
        F.col(x).alias("_x"),
        F.col(y).alias("_y"),
        F.col("n"),
        F.sum("n").over(wx).alias("_rx"),
        F.sum("n").over(wy).alias("_cy"),
        F.sum("n").over(wall).alias("_tot"),
    )
    p_xy = F.col("n") / F.col("_tot")
    ratio = (
        F.col("n").cast("double") * F.col("_tot")
        / (F.col("_rx") * F.col("_cy"))
    )
    log = F.log2(ratio) if base2 else F.log(ratio)
    term = p_xy * log
    return with_marg.agg(
        F.max("_tot").alias("n"),
        F.round(
            _sorted_fold_sum(F.struct("_x", "_y"), term), 6
        ).alias("mi"),
    )


def psi_categorical(
    expected: DataFrame,
    actual: DataFrame,
    col: str,
    *,
    alpha: float = 0.5,
) -> DataFrame:
    """Population Stability Index between two snapshots of a categorical
    column — the standard drift monitor for pipeline inputs/outputs
    (PSI < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 investigate).

    ``PSI = sum_c (p_c - q_c) * ln(p_c / q_c)`` over the UNION of
    categories, with add-``alpha`` smoothing so categories present on one
    side only stay finite (and the statistic stays deterministic — no
    epsilon clamps). One count aggregate per side, a full outer join on
    the category (cardinality-bounded), and a sorted fold.

    Returns one row: (n_expected, n_actual, n_categories, psi).
    """
    e = (
        expected.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("_c"))
        .agg(F.count(F.lit(1)).alias("_ne"))
    )
    a = (
        actual.where(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("_c"))
        .agg(F.count(F.lit(1)).alias("_na"))
    )
    from pyspark.sql import Window

    cells = (
        e.join(a, "_c", "full_outer")
        .select(
            "_c",
            F.coalesce("_ne", F.lit(0)).alias("_ne"),
            F.coalesce("_na", F.lit(0)).alias("_na"),
        )
    )
    w = Window.partitionBy()
    with_tot = cells.select(
        "_c",
        "_ne",
        "_na",
        F.sum("_ne").over(w).alias("_te"),
        F.sum("_na").over(w).alias("_ta"),
        F.count(F.lit(1)).over(w).alias("_k"),
    )
    p = (F.col("_ne") + F.lit(alpha)) / (
        F.col("_te") + F.lit(alpha) * F.col("_k")
    )
    q = (F.col("_na") + F.lit(alpha)) / (
        F.col("_ta") + F.lit(alpha) * F.col("_k")
    )
    term = (p - q) * F.log(p / q)
    return with_tot.agg(
        F.max("_te").alias("n_expected"),
        F.max("_ta").alias("n_actual"),
        F.max("_k").alias("n_categories"),
        F.round(_sorted_fold_sum(F.col("_c"), term), 6).alias("psi"),
    )


def ab_test(
    df: DataFrame,
    group_col: str,
    metric_col: str,
    group_a,
    group_b,
    *,
    scale: int = 100,
) -> DataFrame:
    """Two-sample Welch z-test between groups ``group_a`` and ``group_b``
    of ``metric_col`` — the A/B analysis primitive. ONE aggregation pass
    computes both groups' sufficient statistics as EXACT integer sums of
    the ``scale``-scaled metric (conditional sums, map-side combined), so
    means/variances/z are bit-deterministic; the two-sided p-value uses
    the repo's erfc polynomial (functions.stats.norm_sf_expr), which has
    an exact SQL mirror for the oracle.

    Returns one row: (n_a, n_b, mean_a, mean_b, diff, se, z, p_value).
    Variances are sample (ddof=1); groups need n >= 2 or the result is
    NULL.
    """
    from pylluminator_spark.functions.stats import norm_sf_expr

    g = F.col(group_col)
    v = F.round(F.col(metric_col) * scale).cast("long")
    in_a = g == F.lit(group_a)
    in_b = g == F.lit(group_b)

    def _grp(cond, name):
        return [
            F.sum(F.when(cond & v.isNotNull(), 1).otherwise(0)).alias(
                f"n_{name}"
            ),
            F.sum(F.when(cond, v)).alias(f"s_{name}"),
            F.sum(F.when(cond, v * v)).alias(f"q_{name}"),
        ]

    agg = df.agg(*_grp(in_a, "a"), *_grp(in_b, "b"))

    def mean(name):
        return F.col(f"s_{name}") / F.col(f"n_{name}") / scale

    def var(name):
        n, s, q = (
            F.col(f"n_{name}"),
            F.col(f"s_{name}"),
            F.col(f"q_{name}"),
        )
        # square in DOUBLE: s is a BIGINT sum of the scaled metric, and
        # s*s as BIGINT overflows under ANSI mode once sum(v) > ~3e9 —
        # i.e. at exactly the corpus sizes this one-pass design targets
        sd = s.cast("double")
        qd = q.cast("double")
        return (
            F.when(n >= 2, (qd - sd * sd / n) / (n - 1)) / (scale * scale)
        )

    se = F.sqrt(
        var("a") / F.col("n_a") + var("b") / F.col("n_b")
    )
    z = (mean("a") - mean("b")) / se
    return agg.select(
        "n_a",
        "n_b",
        F.round(mean("a"), 6).alias("mean_a"),
        F.round(mean("b"), 6).alias("mean_b"),
        F.round(mean("a") - mean("b"), 6).alias("diff"),
        F.round(se, 6).alias("se"),
        F.round(z, 6).alias("z"),
        F.round(
            F.lit(2.0) * norm_sf_expr(F.abs(z)), 6
        ).alias("p_value"),
    )
