"""Array-type autodetection (reference annotations.py:360-397)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pylluminator_spark import annotations as ann


BAND_CASES = [
    (1_100_000, "EPICv2"),
    (1_060_000, "EPIC+"),
    (1_051_000, "EPIC"),
    (622_500, "HM450"),
    (385_000, "MSA"),
    (340_000, "MM285"),
    (55_000, "HM27"),
    (40_000, "Mammal40"),
    (10_000, "EPICv2"),  # unknown -> latest human (reference fallback)
    (5_000_000, "EPICv2"),
]


@pytest.mark.parametrize("count,want", BAND_CASES)
def test_detect_array_bands(count, want):
    assert ann.detect_array(count) == want


def test_array_type_expr_matches_scalar(spark):
    df = spark.createDataFrame(
        [(c,) for c, _ in BAND_CASES], "probe_count long"
    ).withColumn("array_type", ann.array_type_expr())
    got = {r["probe_count"]: r["array_type"] for r in df.collect()}
    for count, want in BAND_CASES:
        assert got[count] == want, count


def test_detect_array_types_per_sample(spark):
    """Distributed per-sample inference: distinct illumina_id counts map to
    the right band (counts scaled down via band edges for test speed:
    use small synthetic bands by monkeypatching is avoided — instead build
    exact-size id ranges for the two smallest bands)."""
    a = spark.range(40_000).select(
        F.lit("sA").alias("sample"), F.col("id").alias("illumina_id")
    )
    b = spark.range(55_000).select(
        F.lit("sB").alias("sample"), F.col("id").alias("illumina_id")
    )
    out = {
        r["sample"]: (r["probe_count"], r["array_type"])
        for r in ann.detect_array_types(a.unionAll(b)).collect()
    }
    assert out["sA"] == (40_000, "Mammal40")
    assert out["sB"] == (55_000, "HM27")


def test_consensus_array_type(spark):
    one = spark.range(40_000).select(
        F.lit("s1").alias("sample"), F.col("id").alias("illumina_id")
    )
    two = spark.range(55_000).select(
        F.lit("s2").alias("sample"), F.col("id").alias("illumina_id")
    )
    three = spark.range(55_500).select(
        F.lit("s3").alias("sample"), F.col("id").alias("illumina_id")
    )
    assert ann.consensus_array_type(one.unionAll(two).unionAll(three)) == "HM27"
    # tie -> most recent type wins deterministically
    assert ann.consensus_array_type(one.unionAll(two)) == "HM27"
