"""Semi-structured (JSON) column operators: key profiling, typed
extraction, flattening.

Beyond-reference operators (driver north star): event/log tables carry a
free-form JSON properties column; before anything else a pipeline needs
(a) what keys exist and how often (schema drift monitoring), and (b) a
cheap typed projection of the keys it cares about. Both stay JVM-side:

- ``json_key_profile``: explode ``json_object_keys`` -> one keyed count
  plus per-key type sniffing from sampled values. One shuffle, bounded by
  the key vocabulary.
- ``json_extract_typed``: ``get_json_object`` + cast per requested field
  — pure codegen projection, no shuffle, pushdown-friendly.
- ``json_flatten``: extract EVERY top-level key discovered by a profile
  pass into ``<prefix><key>`` string columns (cast downstream as
  needed). Key discovery is one aggregate; the projection is codegen.

Malformed JSON yields NULLs (get_json_object semantics), never errors —
log pipelines cannot afford a poison-pill row.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_key_profile(df: DataFrame, col: str) -> DataFrame:
    """Per top-level key: presence count and share of rows. The row count
    is attached via a 1-row broadcast; output is key-vocabulary-sized."""
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    keys = (
        df.select(
            F.explode(F.json_object_keys(F.col(col))).alias("key")
        )
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_present"))
    )
    return keys.crossJoin(F.broadcast(total)).select(
        "key",
        "n_present",
        F.round(F.col("n_present") / F.col("_n"), 6).alias("share"),
    )


def json_extract_typed(
    df: DataFrame,
    col: str,
    fields: Mapping[str, str],
    *,
    drop_source: bool = False,
) -> DataFrame:
    """Project JSON paths to typed columns: ``fields`` maps output column
    name -> "path[:type]" (path without the leading ``$.``; type defaults
    to string). e.g. ``{"k": "k:bigint", "city": "geo.city"}``."""
    out = df
    for name, spec in fields.items():
        path, _, dtype = spec.partition(":")
        c = F.get_json_object(F.col(col), f"$.{path}")
        if dtype:
            c = c.cast(dtype)
        out = out.withColumn(name, c)
    if drop_source:
        out = out.drop(col)
    return out


def json_flatten(
    df: DataFrame, col: str, *, prefix: str = "", max_keys: int = 200
) -> DataFrame:
    """Extract every top-level key (discovered by one distinct-key
    aggregate, capped at ``max_keys``) into ``<prefix><key>`` string
    columns. The discovery result is a driver-side key list — bounded and
    tiny; the projection itself is pure codegen."""
    keys = [
        r.key
        for r in df.select(
            F.explode(F.json_object_keys(F.col(col))).alias("key")
        )
        .distinct()
        .orderBy("key")
        .limit(max_keys + 1)
        .collect()
    ]
    if len(keys) > max_keys:
        raise ValueError(
            f"json_flatten: more than max_keys={max_keys} distinct keys; "
            "raise the cap or extract explicitly"
        )
    out = df
    for k in keys:
        out = out.withColumn(
            f"{prefix}{k}", F.get_json_object(F.col(col), f"$.{k}")
        )
    return out
