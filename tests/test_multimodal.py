"""Multimodal column operators: synthetic codec round-trips + plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    df = mm.synthesize_media(spark, n=60, partitions=4).cache()
    df.count()
    return df


def test_media_table_shape(media):
    assert media.count() == 60
    kinds = {r["kind"]: r["n"] for r in media.groupBy("kind").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert kinds == {"image": 20, "audio": 20, "video": 20}
    # metadata is typed and populated per kind
    img = media.filter(F.col("kind") == "image").select("meta.width", "meta.height").first()
    assert img["width"] > 0 and img["height"] > 0
    aud = media.filter(F.col("kind") == "audio").select("meta.sample_rate").first()
    assert aud["sample_rate"] == 8000


def test_metadata_only_scan_prunes_content(media, spark, tmp_path):
    """Writing to parquet then querying only metadata must not read content
    (ReadSchema excludes the binary column)."""
    path = str(tmp_path / "media.parquet")
    media.write.mode("overwrite").parquet(path)
    q = spark.read.parquet(path).select("media_id", "meta.width").filter(F.col("kind") == "image")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan.split("ReadSchema")[-1]


def test_decode_images_deterministic(media):
    decoded = mm.decode_images(media)
    rows = decoded.orderBy("media_id").collect()
    assert len(rows) == 20
    r0 = rows[0]  # media_id 0
    assert r0.media_id == 0
    w, h, c = 16, 12, 3
    assert (r0.width, r0.height, r0.channels) == (w, h, c)
    expect = np.random.RandomState(0).randint(0, 256, size=w * h * c, dtype=np.uint8)
    assert list(expect) == r0.pixels


def test_resize_then_decode_composes(media, spark):
    resized = mm.resize_images(media, 8, 6)
    redecoded = mm.decode_images(
        resized.withColumn("kind", F.lit("image")).select("media_id", "kind", "content")
    )
    rows = {r.media_id: r for r in redecoded.collect()}
    assert len(rows) == 20
    for r in rows.values():
        assert (r.width, r.height) == (8, 6)
        assert len(r.pixels) == 8 * 6 * 3
    # nearest-neighbour: resized pixels are a subset grid of the original
    orig = {r.media_id: r for r in mm.decode_images(media).collect()}
    r = rows[0]
    o = orig[0]
    o_arr = np.array(o.pixels, dtype=np.int64).reshape(o.height, o.width, 3)
    r_arr = np.array(r.pixels, dtype=np.int64).reshape(6, 8, 3)
    yi = (np.arange(6) * o.height // 6).astype(int)
    xi = (np.arange(8) * o.width // 8).astype(int)
    assert np.array_equal(o_arr[yi][:, xi], r_arr)


def test_sample_frames(media):
    frames = mm.sample_frames(media, every_n=2)
    rows = frames.filter(F.col("media_id") == 2).orderBy("frame_idx").collect()
    # media_id 2 -> video with nf = 4 + 2%5 = 6 frames -> sampled 0,2,4
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    assert all(len(r.pixels) == r.width * r.height for r in rows)


def test_extract_features_all_kinds(media):
    feats = mm.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 60
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.kind, []).append(r)
    # uint8 images: mean in (0,255); audio has zero crossings; video mean sane
    assert all(0 < r.mean < 255 for r in by_kind["image"])
    assert all(r.zero_crossings > 0 for r in by_kind["audio"])
    assert all(r.std > 0 for r in by_kind["video"])


def test_foreign_codec_raises_not_implemented(spark):
    import pandas as pd

    fake = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [1], "kind": ["image"], "content": [b"\x89PNG fake bytes"]}
        )
    )
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        mm.decode_images(fake).collect()


def test_binary_dir_scan(media, spark, tmp_path):
    """binaryFile source: write payloads as files, scan them back."""
    d = tmp_path / "files"
    d.mkdir()
    payloads = media.filter(F.col("kind") == "image").select("media_id", "content").collect()
    for r in payloads[:5]:
        (d / f"img_{r.media_id}.pylm").write_bytes(bytes(r.content))
    scanned = mm.read_binary_dir(spark, str(d), glob="*.pylm")
    rows = scanned.collect()
    assert len(rows) == 5
    assert all(r.extension == "pylm" for r in rows)
    assert all(r.size_bytes == len(r.content) for r in rows)
