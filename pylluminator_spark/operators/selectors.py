"""Probe/sample selector algebra over the long signal table.

Re-expresses the reference's selector methods (P1-P17 in SURVEY §2.2,
reference samples.py:52-414, 837-919) as pure DataFrame filters. In the
reference these slice a 2-D MultiIndex matrix; on the long/semi-wide table
every selector is a predicate that Catalyst pushes down to the parquet scan.

Signal table schema (semi-wide, FIXTURES §4):
    sample, probe_id, type ('I'|'II'), channel ('G'|'R'),
    probe_type ('cg'|'ch'|'snp'|'ctl'|...), mask_info,
    mg, mr, ug, ur  (float, nullable)

Long form adds: signal_channel ('G'|'R'), meth_state ('M'|'U'), intensity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INTENSITY_COLS = ("mg", "mr", "ug", "ur")

_STACK_EXPR = (
    "stack(4, 'G','M', mg, 'R','M', mr, 'G','U', ug, 'R','U', ur) "
    "as (signal_channel, meth_state, intensity)"
)


def to_long(signal: DataFrame, drop_null: bool = True) -> DataFrame:
    """Unpivot the 4 intensity columns to rows (signal_channel, meth_state,
    intensity). The reference's wide matrix (samples.py:554) exists only at
    this display/compat edge — the engine computes on the semi-wide form."""
    keys = [c for c in signal.columns if c not in INTENSITY_COLS]
    out = signal.select(*keys, F.expr(_STACK_EXPR))
    if drop_null:
        out = out.filter(F.col("intensity").isNotNull())
    return out


def select_samples(signal: DataFrame, samples: str | Sequence[str]) -> DataFrame:
    """P1 — `samples[x]` projection by sample label (samples.py:52-70)."""
    if isinstance(samples, str):
        samples = [samples]
    return signal.filter(F.col("sample").isin(list(samples)))


def type1(signal: DataFrame) -> DataFrame:
    """P2 — type I probes (samples.py:123-141)."""
    return signal.filter(F.col("type") == "I")


def type2(signal: DataFrame) -> DataFrame:
    """P2 — type II probes (samples.py:143-156). Type II rows carry only
    (mg, ur); the reference drops the all-NA cross-channel columns."""
    return signal.filter(F.col("type") == "II")


def type1_green(signal: DataFrame) -> DataFrame:
    """P5 (samples.py:258-272)."""
    return signal.filter((F.col("type") == "I") & (F.col("channel") == "G"))


def type1_red(signal: DataFrame) -> DataFrame:
    """P5 (samples.py:274-288)."""
    return signal.filter((F.col("type") == "I") & (F.col("channel") == "R"))


def oob(signal_long: DataFrame) -> DataFrame:
    """P3 — out-of-band: type I measurements on the channel the probe does
    NOT target (samples.py:158-206). Input must be long form."""
    return signal_long.filter(
        (F.col("type") == "I") & (F.col("signal_channel") != F.col("channel"))
    )


def oob_green(signal_long: DataFrame) -> DataFrame:
    """Green OOB measurements = red-channel probes read in green."""
    return signal_long.filter(
        (F.col("type") == "I")
        & (F.col("channel") == "R")
        & (F.col("signal_channel") == "G")
    )


def oob_red(signal_long: DataFrame) -> DataFrame:
    return signal_long.filter(
        (F.col("type") == "I")
        & (F.col("channel") == "G")
        & (F.col("signal_channel") == "R")
    )


def ib(signal_long: DataFrame) -> DataFrame:
    """P4 — in-band: measurement channel == probe design channel for type I,
    plus all type II cells (samples.py:208-256)."""
    return signal_long.filter(
        (F.col("type") == "II") | (F.col("signal_channel") == F.col("channel"))
    )


def meth(signal_long: DataFrame) -> DataFrame:
    """P6 (samples.py:290-304)."""
    return signal_long.filter(F.col("meth_state") == "M")


def unmeth(signal_long: DataFrame) -> DataFrame:
    """P6 (samples.py:306-320)."""
    return signal_long.filter(F.col("meth_state") == "U")


def probe_type_in(signal: DataFrame, probe_types: str | Sequence[str]) -> DataFrame:
    """P7 — cg/ch/snp selectors (samples.py:322-388)."""
    if isinstance(probe_types, str):
        probe_types = [probe_types]
    return signal.filter(F.col("probe_type").isin(list(probe_types)))


def cg(signal: DataFrame) -> DataFrame:
    return probe_type_in(signal, "cg")


def ch(signal: DataFrame) -> DataFrame:
    return probe_type_in(signal, "ch")


def snp(signal: DataFrame) -> DataFrame:
    return probe_type_in(signal, "snp")


def get_probes(signal: DataFrame, probe_ids: Sequence[str] | DataFrame) -> DataFrame:
    """P8 — probe_id IN (...) (samples.py:390-414). A DataFrame argument uses
    a (broadcastable) semi-join — the scalable path for large probe lists."""
    if isinstance(probe_ids, DataFrame):
        return signal.join(
            F.broadcast(probe_ids.select("probe_id").distinct()), "probe_id", "left_semi"
        )
    return signal.filter(F.col("probe_id").isin(list(probe_ids)))


def controls(signal: DataFrame, pattern: str | None = None) -> DataFrame:
    """P9 — control probes, optional case-insensitive substring/regex match
    on probe_id (samples.py:837-869)."""
    out = signal.filter(F.col("probe_type") == "ctl")
    if pattern:
        out = out.filter(F.col("probe_id").rlike(f"(?i){pattern}"))
    return out


def normalization_controls(signal: DataFrame, array_uses_az: bool = False) -> DataFrame:
    """P10 — normalization control selection with array-type-dependent
    patterns and channel relabel (samples.py:871-919).

    Green controls match ``norm_c|norm_g$`` (or ``norm.green`` for +AZ
    arrays); red match ``norm_a|norm_t$`` / ``norm.red``.
    """
    if array_uses_az:
        green_pat, red_pat = "(?i)norm.green$", "(?i)norm.red$"
    else:
        green_pat, red_pat = "(?i)(norm_c|norm_g)", "(?i)(norm_a|norm_t)"
    ctl = signal.filter(F.col("probe_type") == "ctl")
    green = ctl.filter(F.col("probe_id").rlike(green_pat)).withColumn(
        "control_channel", F.lit("G")
    )
    red = ctl.filter(F.col("probe_id").rlike(red_pat)).withColumn(
        "control_channel", F.lit("R")
    )
    return green.unionByName(red)


def drop_samples(signal: DataFrame, samples: Sequence[str]) -> DataFrame:
    """P14 (samples.py:699-733)."""
    return signal.filter(~F.col("sample").isin(list(samples)))


def min_beads_nullify(idata: DataFrame, min_beads: int) -> DataFrame:
    """P13 — intensities measured with fewer than ``min_beads`` beads become
    NULL at load time (samples.py:486-499)."""
    cond = F.col("n_beads") < F.lit(min_beads)
    return idata.withColumn(
        "mean_value", F.when(cond, F.lit(None)).otherwise(F.col("mean_value"))
    ).withColumn(
        "std_dev", F.when(cond, F.lit(None)).otherwise(F.col("std_dev"))
    )
