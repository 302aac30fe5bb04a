"""Geospatial primitives: haversine distance and radius self-joins with
grid-cell blocking.

Beyond-reference operator (driver north star): "points within R km of
each other" — store dedup, sensor clustering, geo joins — is a cartesian
product if written literally. The scale-safe plan is the same
block-then-verify shape as the repo's fuzzy/LSH joins:

1. bucket every point into a (lat_cell, lon_cell) grid whose cell edge
   is >= the search radius in degrees AT THE WORST LATITUDE in the data
   (longitude degrees shrink by cos(lat), so the cell size is derived
   from the data's |lat| bound — one tiny min/max scan);
2. one side explodes its 3x3 cell neighborhood; candidates equi-join on
   the cell key (never cartesian — the grid guarantees every true pair
   shares a neighborhood);
3. one codegen haversine evaluation verifies each candidate.

Cost: 9 keys per point, one shuffle on the cell key; candidate count is
bounded by local point density, not n^2.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km — pure codegen trig (radians/sin/cos/
    asin), the standard haversine form."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dphi = F.radians(lat2 - lat1) / 2
    dlmb = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(p1) * F.cos(p2) * F.sin(dlmb) * F.sin(dlmb)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def radius_pairs(
    df: DataFrame,
    id_col: str,
    lat_col: str,
    lon_col: str,
    radius_km: float,
    *,
    max_abs_lat: float | None = None,
) -> DataFrame:
    """All unordered point pairs within ``radius_km`` (great-circle),
    as (id_a, id_b, dist_km) with id_a < id_b. Grid-cell blocking is
    lossless: the cell edge is sized to the radius at the data's worst
    latitude (scanned unless ``max_abs_lat`` is given), so any true pair
    falls in adjacent cells. Poles (|lat| >= 89) are rejected — the grid
    degenerates there; handle polar caps separately."""
    pts = df.select(
        F.col(id_col).alias("_id"),
        F.col(lat_col).cast("double").alias("_lat"),
        F.col(lon_col).cast("double").alias("_lon"),
    ).where(F.col("_lat").isNotNull() & F.col("_lon").isNotNull())
    if max_abs_lat is None:
        row = pts.agg(
            F.max(F.abs(F.col("_lat"))).alias("m")
        ).collect()[0]
        max_abs_lat = float(row["m"] or 0.0)
    if max_abs_lat >= 89.0:
        raise ValueError(
            "radius_pairs: |lat| >= 89 degenerates the lon grid; filter "
            "polar caps first"
        )
    km_per_deg_lat = math.pi * EARTH_RADIUS_KM / 180.0  # ~111.19
    km_per_deg_lon = km_per_deg_lat * math.cos(
        math.radians(max_abs_lat)
    )
    cell_lat = radius_km / km_per_deg_lat
    cell_lon = radius_km / km_per_deg_lon
    # longitude wraps at +-180: use a WHOLE number of lon cells (each at
    # least cell_lon wide, so adjacency still covers the radius) and take
    # cell neighbors modulo the ring — otherwise antimeridian pairs are
    # lost
    n_lon = max(1, int(360.0 // cell_lon))
    lon_width = 360.0 / n_lon
    raw_cx = F.floor((F.col("_lon") + 180.0) / lon_width).cast("long")
    keyed = pts.select(
        "_id",
        "_lat",
        "_lon",
        F.floor(F.col("_lat") / cell_lat).cast("long").alias("_cy"),
        F.least(raw_cx, F.lit(n_lon - 1)).alias("_cx"),  # lon=180 edge
    )
    # side A explodes its 3x3 neighborhood (lon wrapped); side B keys on
    # its own cell
    neigh = F.array_distinct(
        F.array(
            *[
                F.struct(
                    (F.col("_cy") + dy).alias("y"),
                    ((F.col("_cx") + dx + n_lon) % n_lon).alias("x"),
                )
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ]
        )
    )
    a = keyed.select(
        F.col("_id").alias("id_a"),
        F.col("_lat").alias("la"),
        F.col("_lon").alias("lo_a"),
        F.explode(neigh).alias("_c"),
    ).select("id_a", "la", "lo_a", F.col("_c.y").alias("_cy"), F.col("_c.x").alias("_cx"))
    b = keyed.select(
        F.col("_id").alias("id_b"),
        F.col("_lat").alias("lb"),
        F.col("_lon").alias("lo_b"),
        "_cy",
        "_cx",
    )
    cands = a.join(b, ["_cy", "_cx"]).where(F.col("id_a") < F.col("id_b"))
    dist = haversine_km(
        F.col("la"), F.col("lo_a"), F.col("lb"), F.col("lo_b")
    )
    return (
        cands.withColumn("dist_km", dist)
        .where(F.col("dist_km") <= radius_km)
        .select("id_a", "id_b", F.round("dist_km", 6).alias("dist_km"))
        # a pair can share several neighborhood cells: dedup candidates
        .distinct()
    )
