"""Methylation core math as pure column expressions.

Re-expresses reference semantics (citations into /root/reference):

- beta computation: samples.py:1074-1108 — per probe/sample
  ``clip(M,1) / clip(M+U,2)`` where M/U are channel sums with type-dependent
  zero-fill rules.
- M-value transform: dm.py / samples.py:1200-1227 —
  ``log2((beta+eps)/(1-beta-eps))`` and inverse ``1/(1+2^-m)``.

Data model: long *semi-wide* signal table with one row per (sample, probe)
and four intensity columns ``mg, mr, ug, ur`` (methylated-green,
methylated-red, unmethylated-green, unmethylated-red), plus ``type``
('I'|'II') and ``channel`` ('G'|'R' — the in-band channel for type I probes).
Type II probes populate only ``mg`` (meth measured in green) and ``ur``
(unmeth in red), matching reference samples.py:1088-1095 where (R,M) and
(G,U) are zero-filled for type II.

Null semantics mirror pandas NaN propagation: a masked/low-bead intensity is
NULL, and any beta built from it is NULL (Spark ``+`` propagates nulls the
same way pandas NaN does in the reference's column sums).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def meth_unmeth_exprs(include_out_of_band: bool = False) -> tuple[Column, Column]:
    """Methylated / unmethylated signal for a semi-wide signal row.

    Mirrors the zero-fill rules of reference samples.py:1088-1100:
    - type II: M = mg, U = ur (cross-channel cells zeroed)
    - type I, in-band only: M/U from the probe's channel
    - type I, include_out_of_band: both channels summed (sesame sumTypeI)
    """
    t = F.col("type")
    ch = F.col("channel")
    mg, mr, ug, ur = F.col("mg"), F.col("mr"), F.col("ug"), F.col("ur")
    if include_out_of_band:
        meth = F.when(t == "II", mg).otherwise(mr + mg)
        unmeth = F.when(t == "II", ur).otherwise(ur + ug)
    else:
        meth = (
            F.when(t == "II", mg)
            .when(ch == "G", mg)
            .otherwise(mr)
        )
        unmeth = (
            F.when(t == "II", ur)
            .when(ch == "G", ug)
            .otherwise(ur)
        )
    return meth, unmeth


def beta_expr(meth: Column, unmeth: Column) -> Column:
    """``clip(M,1) / clip(M+U,2)`` — reference samples.py:1104.

    NULL-propagating: pandas ``clip`` keeps NaN, but Spark ``greatest``
    *ignores* nulls, so guard explicitly — a masked intensity must give a
    NULL beta, not 0.5.
    """
    raw = F.greatest(meth, F.lit(1.0)) / F.greatest(meth + unmeth, F.lit(2.0))
    return F.when(meth.isNull() | unmeth.isNull(), F.lit(None)).otherwise(raw)


def beta_to_m_expr(beta: Column, epsilon: float = 1e-8) -> Column:
    """M-value = log2((beta+eps)/(1-(beta+eps))) — reference samples.py:1211."""
    x = beta + F.lit(epsilon)
    return F.log2(x / (F.lit(1.0) - x))


def m_to_beta_expr(m: Column) -> Column:
    """Inverse M-value transform: 1/(1+2^-m) — reference samples.py:1224."""
    return F.lit(1.0) / (F.lit(1.0) + F.pow(F.lit(2.0), -m))
