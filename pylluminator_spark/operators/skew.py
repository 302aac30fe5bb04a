"""Skew-handling join / aggregation operators (100 TB scale path).

The reference is single-node pandas, so key skew never appears there; at
cluster scale a shuffle join or groupBy on a hot key (one chromosome holding
10% of probes, one document-language holding 80% of a corpus) serializes the
whole stage onto one reducer. AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in ``session.get_spark``)
handles sort-merge joins automatically; the helpers here cover the cases AQE
does not:

- ``salted_join``: shuffle join where the *left* (fact) side has skewed keys
  and the right side is too large to broadcast outright. The left side gets a
  uniform random salt in ``[0, salt)``; the right side is replicated ``salt``
  times; the join key becomes ``(key, salt)`` so each hot key spreads over
  ``salt`` reducers. Row multiplicity is unchanged (each left row joins
  exactly the one replica matching its salt).
- ``salted_agg``: two-phase aggregation — partial agg on ``(key, salt)``,
  final agg on ``key`` — for re-aggregable functions (sum/count/min/max).
  Spark's hash aggregate already does map-side partial aggregation, which
  makes this unnecessary for plain ``groupBy().agg()``; the salted form is
  for the ``collect_list``/exact-percentile style aggregates that have no
  partial-combine and otherwise funnel every row of a hot key to one task.

Salting uses ``F.rand(seed)`` — deterministic per seed for replayable plans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    salt: int = DEFAULT_SALT,
    seed: int = 42,
) -> DataFrame:
    """Equi-join with the left side's hot keys spread across ``salt`` reducers.

    Supports row-preserving join types ('inner', 'left', 'left_outer'):
    the right side is replicated, so 'right'/'full' outer and semi/anti
    would change multiplicity semantics and are rejected.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    lsalted = left.withColumn("_salt", (F.rand(seed) * salt).cast("int"))
    rsalted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = lsalted.join(rsalted, [*keys, "_salt"], how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: str | Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    salt: int = DEFAULT_SALT,
    seed: int = 42,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs`` run per ``(keys, salt)``; ``final_aggs`` combine the
    partials per ``keys``. The caller aliases partial outputs and references
    those names in the final phase, e.g.::

        salted_agg(df, "k",
                   [F.sum("v").alias("s"), F.count("*").alias("c")],
                   [F.sum("s").alias("total"), F.sum("c").alias("rows")])
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    salted = df.withColumn("_salt", (F.rand(seed) * salt).cast("int"))
    partial = salted.groupBy(*key_list, "_salt").agg(*partial_aggs)
    return partial.groupBy(*key_list).agg(*final_aggs)


def salted_collect_list(
    df: DataFrame,
    keys: str | Sequence[str],
    value: str,
    salt: int = DEFAULT_SALT,
    seed: int = 42,
    sort: bool = True,
) -> DataFrame:
    """Skew-safe ``collect_list``: gather per (key, salt) then flatten.

    ``collect_list`` has no map-side combine, so a hot key pulls all its rows
    into one task; salting bounds per-task list size to ~1/salt of the key.
    Output column ``values`` is sorted for determinism when ``sort``.
    """
    key_list = [keys] if isinstance(keys, str) else list(keys)
    agg = F.flatten(F.collect_list("_part")).alias("values")
    if sort:
        agg = F.array_sort(F.flatten(F.collect_list("_part"))).alias("values")
    return (
        df.withColumn("_salt", (F.rand(seed) * salt).cast("int"))
        .groupBy(*key_list, "_salt")
        .agg(F.collect_list(value).alias("_part"))
        .groupBy(*key_list)
        .agg(agg)
    )
