"""Time-series toolkit: resample + gap-fill, forward fill, EWMA, rolling
z-score anomaly detection.

Beyond-reference operators (driver north star): event/metric tables at
pipeline scale need regular-grid resampling (dashboards, feature windows),
exponential smoothing (trend features), and online-style anomaly flags
(data-quality monitors). All four are expressed as declarative DataFrame
plans that Catalyst can optimize end-to-end:

- ``resample`` buckets on integer epoch arithmetic, aggregates once, then
  generates the per-group dense grid with a distributed ``sequence`` +
  ``explode`` (no driver-side calendar loop) and left-joins the aggregates
  back. Both sides of that join are keyed on (group, bucket) — one shuffle
  each, co-partitioned by AQE.
- ``forward_fill`` is one ordered window of ``last(ignorenulls)`` per
  group — no self-join.
- ``ewma`` is a deterministic left fold (``F.aggregate``) over the
  per-group time-sorted value array, seeded with the first element
  (pandas ``ewm(adjust=False)`` semantics). The fold order is fixed by
  ``sort_array`` over (ts, tiebreak), so results are bit-exact and
  reproducible across partitionings — and identical to a DuckDB
  ``list_reduce(list(v ORDER BY ts, tiebreak), ...)`` twin, which is how
  the driver gate verifies it. Per-group state is the collected series:
  suitable for bounded per-key series (sensor/user histories); for
  unbounded keys, pre-aggregate to coarser buckets first.
- ``rolling_zscore`` keeps the windowed moments EXACT by summing
  integer-scaled values (and their squares) over a ROWS frame — integer
  sums are order-independent, so the derived mean/std/z float expressions
  are cross-engine deterministic without tolerance.

Scale: every operator shuffles once on its group key and keeps windows
partitioned (no global ordering). The grid join inflates by the gap count
only; sequences are generated executor-side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_us(ts_col: str) -> Column:
    """Epoch microseconds, valid for TIMESTAMP and TIMESTAMP_NTZ inputs
    (``unix_micros`` rejects NTZ; ``timestampdiff`` from an NTZ epoch
    literal is timezone-independent)."""
    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" CAST({ts_col} AS TIMESTAMP_NTZ))"
    )


def _scaled(col: Column, scale: int) -> Column:
    """Exact integer-scaled representation for deterministic sums."""
    return F.round(col * scale).cast("long")


def resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    every_us: int,
    group_cols: Sequence[str] = (),
    scale: int = 100,
    fill: bool = True,
) -> DataFrame:
    """Fixed-interval resampling: bucket ``ts_col`` into ``every_us``-wide
    intervals, count rows and sum ``value_col`` per (group, bucket), and —
    when ``fill`` — densify each group's grid from its min to max bucket so
    downstream windows see every interval (gap buckets get ``n_rows = 0``,
    ``sum_value`` NULL).

    Returns (group..., bucket, bucket_ts, n_rows, sum_value). ``sum_value``
    is summed at ``scale`` integer precision then descaled, so per-bucket
    sums are exact and reproducible. NULL values are excluded from both.
    """
    gcols = list(group_cols)
    # integral epoch div width keeps the arithmetic exact (no double
    # promotion); epoch micros here are positive, so truncating div == floor
    bucket = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" CAST({ts_col} AS TIMESTAMP_NTZ)) div {every_us}"
    )
    agg = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*gcols, bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_scaled(F.col(value_col), scale)).alias("_s"),
        )
    )
    if not fill:
        out = agg
    else:
        grid = (
            agg.groupBy(*gcols)
            .agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
            .select(
                *gcols,
                F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias(
                    "bucket"
                ),
            )
        )
        out = grid.join(agg, on=gcols + ["bucket"], how="left").withColumn(
            "n_rows", F.coalesce(F.col("n_rows"), F.lit(0))
        )
    return out.select(
        *gcols,
        "bucket",
        F.expr(
            f"timestampadd(MICROSECOND, bucket * {every_us},"
            " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ).alias("bucket_ts"),
        "n_rows",
        F.round(F.col("_s") / scale, 2).alias("sum_value"),
    )


def forward_fill(
    df: DataFrame,
    cols: Sequence[str],
    *,
    order_col: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Carry the last non-NULL value of each column forward within each
    group, ordered by ``order_col`` — one ``last(ignorenulls)`` window per
    column over a single partitioned sort, no self-join."""
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def ewma(
    df: DataFrame,
    value_col: str,
    *,
    alpha: float,
    order_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    per_row: bool = False,
) -> DataFrame:
    """Exponentially weighted moving average per group, pandas
    ``ewm(alpha, adjust=False)`` semantics: seeded with the first value,
    then ``acc <- alpha * x + (1 - alpha) * acc`` in time order.

    Default returns one row per group with the FINAL smoothed value
    (``ewma`` column) — a deterministic ``F.aggregate`` left fold over the
    time-sorted array, bit-exact for any partitioning. With
    ``per_row=True``, returns every (order_cols..., value, ewma) row by
    folding with an array accumulator and ``posexplode`` — same float
    sequence, one output row per input row.

    The collected per-group series bounds executor memory; for unbounded
    keys pre-aggregate (e.g. ``resample``) first.
    """
    gcols = [F.col(c) for c in group_cols]
    okey = F.struct(
        *[F.col(c) for c in order_cols], F.col(value_col).alias("_v")
    )
    arr = F.sort_array(F.collect_list(okey))
    vals = F.transform(arr, lambda s: s["_v"].cast("double"))
    a, b = F.lit(float(alpha)), F.lit(1.0 - alpha)
    if not per_row:
        fold = F.aggregate(
            F.slice(vals, 2, F.greatest(F.lit(0), F.size(vals) - 1)),
            F.element_at(vals, 1),
            lambda acc, x: a * x + b * acc,
        )
        return df.groupBy(*gcols).agg(fold.alias("ewma"))
    # per-row: fold carrying (acc, history array)
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.lit(0), F.size(vals) - 1)),
        F.struct(
            F.element_at(vals, 1).alias("acc"),
            F.array(F.element_at(vals, 1)).alias("hist"),
        ),
        lambda st, x: F.struct(
            (a * x + b * st["acc"]).alias("acc"),
            F.concat(st["hist"], F.array(a * x + b * st["acc"])).alias(
                "hist"
            ),
        ),
        lambda st: st["hist"],
    )
    grouped = df.groupBy(*gcols).agg(
        F.transform(arr, lambda s: s.dropFields("_v")).alias("_keys"),
        vals.alias("_vals"),
        fold.alias("_ewma"),
    )
    exploded = grouped.select(
        *[F.col(c) for c in group_cols],
        F.posexplode(F.arrays_zip("_keys", "_vals", "_ewma")).alias(
            "_i", "_z"
        ),
    )
    return exploded.select(
        *group_cols,
        F.col("_z._keys.*"),
        F.col("_z._vals").alias(value_col),
        F.col("_z._ewma").alias("ewma"),
    )


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    *,
    order_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    window_rows: int = 10,
    min_rows: int = 3,
    scale: int = 100,
) -> DataFrame:
    """Rolling z-score of each value against the trailing ``window_rows``
    rows (inclusive) within its group — the standard streaming-style
    data-quality anomaly signal.

    The windowed moments are computed from EXACT integer sums of the
    ``scale``-scaled value and its square (order-independent), so the
    derived mean/std/z floats are identical under any shuffle and across
    engines. Rows with fewer than ``min_rows`` trailing observations or
    zero variance get ``zscore`` NULL.

    Adds: ``roll_n``, ``roll_mean``, ``zscore`` (6 dp).
    """
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(window_rows - 1), 0)
    )
    v = _scaled(F.col(value_col), scale)
    # count the SAME rows the sums see: F.count(v) skips NULL values, so a
    # NULL value_col row can't deflate roll_mean/var for its neighbors
    # (matches rolling_corr's both-non-null treatment)
    n = F.count(v).over(w)
    s = F.sum(v).over(w)
    q = F.sum(v * v).over(w)
    mean = s / n
    var = q / n - mean * mean
    z = (v - mean) / F.sqrt(F.when(var > 0, var))
    return (
        df.withColumn("roll_n", n)
        .withColumn("roll_mean", F.round(mean / scale, 6))
        .withColumn(
            "zscore",
            F.when(n >= min_rows, F.round(z, 6)),
        )
    )


def rolling_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    order_cols: Sequence[str],
    group_cols: Sequence[str] = (),
    window_rows: int = 20,
    min_rows: int = 3,
    scale: int = 100,
) -> DataFrame:
    """Rolling Pearson correlation between two series over the trailing
    ``window_rows`` rows within each group — co-movement monitoring
    (hedges, sensor pairs, metric coupling).

    Same exactness contract as ``rolling_zscore``: all six windowed
    moments (n, Sx, Sy, Sxx, Syy, Sxy) are EXACT integer sums of the
    ``scale``-scaled inputs, so the derived correlation floats are
    identical under any shuffle order and across engines. Rows where
    either input is NULL are excluded from the moments (the frame is
    filtered first); degenerate windows (either variance 0 or fewer than
    ``min_rows`` pairs) yield NULL.

    Adds ``corr_n`` and ``rolling_corr`` (6 dp).
    """
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(-(window_rows - 1), 0)
    )
    both = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    x = F.when(both, _scaled(F.col(x_col), scale))
    y = F.when(both, _scaled(F.col(y_col), scale))
    n = F.sum(both.cast("long")).over(w)
    sx = F.sum(x).over(w)
    sy = F.sum(y).over(w)
    sxx = F.sum(x * x).over(w)
    syy = F.sum(y * y).over(w)
    sxy = F.sum(x * y).over(w)
    cov_n = n * sxy - sx * sy
    vx_n = n * sxx - sx * sx
    vy_n = n * syy - sy * sy
    r = cov_n / F.sqrt(
        F.when((vx_n > 0) & (vy_n > 0), vx_n.cast("double") * vy_n)
    )
    return df.withColumn("corr_n", n).withColumn(
        "rolling_corr",
        F.when(n >= min_rows, F.round(r, 6)),
    )
