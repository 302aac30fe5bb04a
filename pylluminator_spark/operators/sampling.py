"""Deterministic key-hash sampling & split assignment (training-data ops).

A 100 TB corpus pipeline needs samples and train/val/test splits that are
(a) reproducible across runs and engines, (b) consistent per key — every
row of a document/user lands in the same split — and (c) computed without
a shuffle or a stored assignment table. ``rand()``-based sampling violates
all three; keyed hashing gives all three for free: the decision is a pure
column expression on the key, evaluated map-side.

``xxhash64`` variants are the engine-grade path. The ``*_arith`` variants
use a multiplicative hash (Knuth 2654435761 mod a prime) expressible in
ANSI SQL — the DuckDB oracle checks those bit-for-bit; the xxhash64 path is
property-tested (fraction tolerance, per-key consistency, disjointness).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ARITH_MULT = 2654435761
_ARITH_MOD = 1000003  # prime


def hash_bucket_expr(key: Column, buckets: int = 10_000, salt: int = 0) -> Column:
    """Uniform bucket in [0, buckets) from xxhash64(key, salt)."""
    return F.pmod(F.xxhash64(key, F.lit(salt)), F.lit(buckets))


def arith_bucket_expr(key: Column, buckets: int = 10_000) -> Column:
    """SQL-portable bucket in [0, buckets): pmod(key * 2654435761, 1000003)
    % buckets. Key must be integral. ``pmod`` (not ``%``) keeps negative
    keys in range — a sign-preserving remainder would give negative buckets
    that pass every ``bucket < threshold`` test, silently keeping 100% of
    negative keys at any rate. For non-negative keys this equals
    ``((k * 2654435761) % 1000003) % b``, which is what the ANSI-SQL
    oracles use; a negative-key-safe SQL twin is
    ``(((k * m) % p) + p) % p % b``."""
    return F.pmod(key.cast("long") * _ARITH_MULT, F.lit(_ARITH_MOD)) % buckets


def hash_sample(
    df: DataFrame,
    key: str,
    fraction: float,
    salt: int = 0,
    buckets: int = 10_000,
) -> DataFrame:
    """Keep ~``fraction`` of keys, deterministically: a key is in or out
    regardless of run, partition layout, or cluster size."""
    thresh = int(round(fraction * buckets))
    return df.filter(hash_bucket_expr(F.col(key), buckets, salt) < thresh)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key: str,
    *,
    default_rate: float = 0.0,
    buckets: int = 10_000,
    portable: bool = False,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep ~``rates[stratum]`` of keys
    inside each stratum (e.g. re-balance languages in a training corpus).

    Same guarantees as :func:`hash_sample` — reproducible across runs and
    engines, per-key consistent, shuffle-free (the decision is a map-side
    column predicate; no per-stratum pass over the data). Strata missing
    from ``rates`` get ``default_rate``. ``portable=True`` uses the
    multiplicative arith hash (integral key) so an ANSI-SQL oracle can
    replicate the decision bit-for-bit.
    """
    bucket = (
        arith_bucket_expr(F.col(key), buckets)
        if portable
        else hash_bucket_expr(F.col(key), buckets)
    )
    thresh = None
    for stratum, rate in rates.items():
        bound = int(round(rate * buckets))
        cond = F.col(strata_col) == stratum
        thresh = (
            F.when(cond, bound) if thresh is None else thresh.when(cond, bound)
        )
    default_bound = int(round(default_rate * buckets))
    thresh = (
        F.lit(default_bound) if thresh is None else thresh.otherwise(default_bound)
    )
    return df.filter(bucket < thresh)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key: str,
    strata_col: str | None = None,
    *,
    buckets: int = 10_000,
    salt: int = 0,
    portable: bool = False,
    priority_digits: int | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: take ``k`` rows
    (per stratum, if ``strata_col`` is given) with inclusion probability
    proportional to ``weight_col``.

    Efraimidis-Spirakis A-ES: each row gets priority ``ln(u) / w`` with
    ``u ~ U(0,1)``; the top-k priorities are exactly a weighted sample
    without replacement. ``u`` here is the keyed hash bucket mapped to
    ``(bucket + 0.5) / buckets`` — so the sample is reproducible across
    runs, engines, and partitionings (same key + salt -> same draw),
    unlike ``rand()``.

    Scale shape: global top-k is ``orderBy().limit(k)`` (Spark's
    distributed TakeOrdered — per-partition heaps, only k rows to the
    driver stage); per-stratum top-k is one hash-partitioned streaming
    ``row_number`` window. Rows with non-positive weight are excluded
    (they have zero sampling mass).

    ``portable=True`` uses the SQL-expressible arith hash (integral key)
    so an ANSI-SQL oracle replicates the draw; ``priority_digits`` rounds
    the priority before ordering (ties broken by key), absorbing the
    sub-ulp libm differences between engines' ``ln`` — set it (e.g. 9)
    for any cross-engine-checked sample.
    """
    bucket = (
        arith_bucket_expr(F.col(key), buckets)
        if portable
        else hash_bucket_expr(F.col(key), buckets, salt)
    )
    u = (bucket.cast("double") + F.lit(0.5)) / F.lit(float(buckets))
    pri = F.log(u) / F.col(weight_col).cast("double")
    if priority_digits is not None:
        pri = F.round(pri, priority_digits)
    filtered = df.filter(F.col(weight_col) > 0)
    if strata_col is None:
        return filtered.orderBy(pri.desc(), F.col(key)).limit(k)
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(pri.desc(), F.col(key))
    return (
        filtered.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def split_assign(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    out_col: str = "split",
    salt: int = 0,
    buckets: int = 10_000,
) -> DataFrame:
    """Append a deterministic split label ('train'/'val'/'test', any names)
    with the given weights (must sum to ~1). Same key → same split, always;
    splits are exactly disjoint and exhaustive."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = hash_bucket_expr(F.col(key), buckets, salt)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        bound = int(round(acc * buckets))
        expr = (
            F.when(bucket < bound, name)
            if expr is None
            else expr.when(bucket < bound, name)
        )
    last = items[-1][0]
    return df.withColumn(
        out_col, F.lit(last) if expr is None else expr.otherwise(last)
    )
