"""SeSAMe SigDF CSV import (reference ``from_sesame`` samples.py:1878-1978,
SURVEY S6).

SigDF csvs are one file per sample with columns
``Probe_ID, MG, MR, UG, UR, mask``. Spark-first shape: ONE distributed csv
scan over all files (file-per-sample parallelism), the sample label derived
from the file name, one broadcast manifest join — versus the reference's
sequential per-file pandas loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANDATORY = ("probe_id", "MG", "MR", "UG", "UR", "mask")


def read_sesame_csvs(
    spark: SparkSession,
    path: str,
    manifest: DataFrame,
    *,
    no_suffix: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Load SigDF csvs into (signal, masks).

    Returns the semi-wide signal table (sample, probe_id, type, channel,
    probe_type, mask_info, mg, mr, ug, ur) and the `sesame` masks table.

    Semantics mirrored from the reference:
    - inner join with the manifest on probe_id (suffix-stripped when
      ``no_suffix``, samples.py:1917-1920)
    - type II green values move UG -> MG, UG nulled (samples.py:1950-1951)
    - type II channel: 'R' when MG is null, 'G' when UR is null
      (samples.py:1954-1955)
    - the boolean ``mask`` column becomes a 'sesame' per-sample mask
      (samples.py:1962)
    """
    raw = (
        spark.read.option("header", True)
        .csv(path)
        .withColumnRenamed("Probe_ID", "probe_id")
    )
    missing = [c for c in MANDATORY if c not in raw.columns]
    if missing:
        raise ValueError(f"sesame csv missing mandatory columns: {missing}")

    sig = raw.select(
        F.regexp_extract(F.input_file_name(), r"([^/]+?)\.csv", 1).alias("sample"),
        "probe_id",
        F.col("MG").cast("double").alias("mg"),
        F.col("MR").cast("double").alias("mr"),
        F.col("UG").cast("double").alias("ug"),
        F.col("UR").cast("double").alias("ur"),
        (F.lower(F.col("mask")) == "true").alias("_mask"),
    )

    m = manifest.select(
        (
            F.regexp_replace("probe_id", "_[TB]C[0-9]+$", "")
            if no_suffix
            else F.col("probe_id")
        ).alias("probe_id"),
        "type",
        "channel",
        "probe_type",
        F.coalesce(F.col("mask_info"), F.lit("")).alias("mask_info"),
    )
    joined = sig.join(F.broadcast(m), "probe_id", "inner")

    is2 = F.col("type") == "II"
    shifted = (
        joined.withColumn("mg", F.when(is2, F.col("ug")).otherwise(F.col("mg")))
        .withColumn("ug", F.when(is2, F.lit(None)).otherwise(F.col("ug")))
        .withColumn(
            "channel",
            F.when(is2 & F.col("mg").isNull(), "R")
            .when(is2 & F.col("ur").isNull(), "G")
            .otherwise(F.col("channel")),
        )
    )

    signal = shifted.select(
        "sample", "probe_id", "type", "channel", "probe_type", "mask_info",
        "mg", "mr", "ug", "ur",
    )
    masks = shifted.filter(F.col("_mask")).select(
        F.lit("sesame").alias("mask_name"), F.col("sample"), "probe_id"
    )
    return signal, masks
