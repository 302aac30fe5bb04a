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
    """MP4 is the remaining honest codec gap (JPEG decodes for real since
    operators/jpeg.py landed)."""
    import pandas as pd

    fake = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1],
                "kind": ["image"],
                "content": [b"\x00\x00\x00\x18ftypmp42 fake mp4 box"],
            }
        )
    )
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        mm.decode_images(fake).collect()


def test_truncated_jpeg_raises_parse_error(spark):
    import pandas as pd

    fake = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1],
                "kind": ["image"],
                "content": [b"\xff\xd8\xff\xe0JFIF truncated"],
            }
        )
    )
    with pytest.raises(Exception):
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


# ---------------------------------------------------------------------------
# Real public codecs (BMP / WAVE / PNG) — pure-Python decoders
# ---------------------------------------------------------------------------

def test_bmp_round_trip():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, (13, 17, 3), dtype=np.uint8)  # odd width -> padding
    data = mm.encode_bmp(arr)
    assert data[:2] == b"BM"
    np.testing.assert_array_equal(mm.decode_bmp(data), arr)


def test_bmp_top_down_and_32bit():
    # hand-build a 2x2 top-down 32-bit BMP: BGRA pixels
    import struct as st

    px = bytes([255, 0, 0, 10, 0, 255, 0, 20, 0, 0, 255, 30, 9, 9, 9, 40])
    header = b"BM" + st.pack("<IHHI", 14 + 40 + len(px), 0, 0, 54)
    info = st.pack("<IiiHHIIiiII", 40, 2, -2, 1, 32, 0, len(px), 0, 0, 0, 0)
    out = mm.decode_bmp(header + info + px)
    assert out.shape == (2, 2, 4)
    # first row first pixel: BGRA 255,0,0,10 -> RGB(A) 0,0,255,10
    np.testing.assert_array_equal(out[0, 0], [0, 0, 255, 10])
    np.testing.assert_array_equal(out[1, 1], [9, 9, 9, 40])


def test_wav_round_trip():
    rng = np.random.RandomState(1)
    samples = (rng.randn(1000) * 5000).astype(np.int16)
    data = mm.encode_wav(samples, 16000)
    got, sr, ch = mm.decode_wav(data)
    assert (sr, ch) == (16000, 1)
    np.testing.assert_array_equal(got, samples)
    # stereo interleaved
    st2 = (rng.randn(600) * 100).astype(np.int16)
    got2, sr2, ch2 = mm.decode_wav(mm.encode_wav(st2, 8000, channels=2))
    assert (sr2, ch2) == (8000, 2)
    np.testing.assert_array_equal(got2, st2)


def test_png_round_trip_all_color_types():
    rng = np.random.RandomState(2)
    for c in (1, 2, 3, 4):
        arr = rng.randint(0, 256, (9, 11, c), dtype=np.uint8)
        got = mm.decode_png(mm.encode_png(arr))
        np.testing.assert_array_equal(got, arr, err_msg=f"channels={c}")


def test_png_all_filters():
    """Decode a PNG whose rows use every filter type (hand-filtered)."""
    import struct as st
    import zlib
    import binascii

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (5, 7, 3), dtype=np.uint8).astype(np.int32)
    stride = 7 * 3
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = arr[y].ravel()
        row = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            cc = prev[i - 3] if i >= 3 else 0
            if ftype == 0:
                row[i] = cur[i]
            elif ftype == 1:
                row[i] = cur[i] - a
            elif ftype == 2:
                row[i] = cur[i] - b
            elif ftype == 3:
                row[i] = cur[i] - (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc2 = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc2) else (b if pb <= pc2 else cc)
                row[i] = cur[i] - pred
        raw += bytes([ftype]) + bytes((row % 256).astype(np.uint8))
        prev = cur

    def chunk(tag, body):
        crc = binascii.crc32(tag + body) & 0xFFFFFFFF
        return st.pack(">I", len(body)) + tag + body + st.pack(">I", crc)

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", st.pack(">IIBBBBB", 7, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(mm.decode_png(data), arr.astype(np.uint8))


def test_real_codecs_flow_through_operators(spark):
    """BMP and PNG payloads decode through the same mapInPandas operators as
    the synthetic container; WAV flows through extract_features."""
    import pandas as pd

    rng = np.random.RandomState(4)
    img_a = rng.randint(0, 256, (6, 8, 3), dtype=np.uint8)
    img_b = rng.randint(0, 256, (4, 5, 3), dtype=np.uint8)
    wav = (rng.randn(400) * 2000).astype(np.int16)
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2, 3],
                "kind": ["image", "image", "audio"],
                "content": [
                    mm.encode_bmp(img_a),
                    mm.encode_png(img_b),
                    mm.encode_wav(wav, 8000),
                ],
            }
        )
    )
    decoded = {r.media_id: r for r in mm.decode_images(media).collect()}
    assert (decoded[1].width, decoded[1].height, decoded[1].channels) == (8, 6, 3)
    assert (decoded[2].width, decoded[2].height, decoded[2].channels) == (5, 4, 3)
    np.testing.assert_array_equal(
        np.array(decoded[1].pixels, dtype=np.uint8).reshape(6, 8, 3), img_a
    )
    feats = {r.media_id: r for r in mm.extract_features(media).collect()}
    assert feats[3].kind == "audio"


# ---------------------------------------------------------------------------
# JPEG codec (operators/jpeg.py — baseline sequential, T.81 + Annex K)
# ---------------------------------------------------------------------------

def test_jpeg_roundtrip_grayscale():
    from pylluminator_spark.operators.jpeg import decode_jpeg, encode_jpeg

    h, w = 40, 56
    x = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    gray = np.clip(x + 10 * np.sin(np.arange(h))[:, None], 0, 255).astype(
        np.uint8
    )
    dec = decode_jpeg(encode_jpeg(gray, quality=92))
    assert dec.shape == (h, w)
    assert np.abs(dec.astype(int) - gray.astype(int)).max() <= 8


def test_jpeg_roundtrip_rgb():
    from pylluminator_spark.operators.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack(
        [(xx * 5) % 256, (yy * 7) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    assert dec.shape == (32, 48, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12


def test_jpeg_constant_tiles_lossless_at_q50():
    """Even-valued constant 8x8 tiles survive quality-50 exactly (DC
    quantizer 16; even level-shift halves round exactly) — the invariant
    the media_decode_jpeg driver oracle relies on."""
    from pylluminator_spark.operators.jpeg import decode_jpeg, encode_jpeg

    tiles = np.array([[100, 2, 254], [128, 64, 200]], dtype=np.uint8)
    img = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
    dec = decode_jpeg(encode_jpeg(img, quality=50))
    np.testing.assert_array_equal(dec, img)


def test_jpeg_non_multiple_of_8_dims():
    from pylluminator_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = np.full((13, 21), 130, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=80))
    assert dec.shape == (13, 21)
    assert np.abs(dec.astype(int) - 130).max() <= 4


def test_jpeg_arithmetic_rejected():
    from pylluminator_spark.operators.jpeg import decode_jpeg

    # SOI + minimal SOF9 (arithmetic-coded sequential) header
    sof9 = b"\xff\xd8" + b"\xff\xc9" + b"\x00\x0b" + b"\x08" + b"\x00\x08\x00\x08\x01" + b"\x01\x11\x00"
    with pytest.raises(NotImplementedError, match="arithmetic|SOF"):
        decode_jpeg(sof9 + b"\xff\xd9")


def test_jpeg_dispatch_through_parse_payload():
    from pylluminator_spark.operators.jpeg import encode_jpeg
    from pylluminator_spark.operators.multimodal import _parse_payload

    img = np.kron(
        np.array([[100, 102]], dtype=np.uint8), np.ones((8, 8), np.uint8)
    )
    kind, arr, meta = _parse_payload(encode_jpeg(img, quality=50))
    assert kind == "image"
    assert arr.shape == (8, 16, 1)  # grayscale normalized to (h, w, 1)
    np.testing.assert_array_equal(arr[:, :, 0], img)


def test_jpeg_420_roundtrip_exercises_upsampling():
    """4:2:0 encoding (2x2 chroma averaging, interleaved 16x16 MCUs) decodes
    through the sampling-factor upsampling path; luma survives closely and
    a chroma-flat image round-trips near-exactly."""
    from pylluminator_spark.operators.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:33, 0:50]
    img = np.stack(
        [(xx * 5) % 256, (yy * 7) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=95, subsampling="4:2:0"))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).mean() <= 4.0

    flat = np.stack([(xx * 3) % 256] * 3, axis=-1).astype(np.uint8)
    dec2 = decode_jpeg(encode_jpeg(flat, quality=90, subsampling="4:2:0"))
    assert np.abs(dec2.astype(int) - flat.astype(int)).max() <= 2


def test_jpeg_progressive_equals_sequential_pipeline():
    """SOF2 progressive decode (DC successive approximation, spectral AC
    bands with EOBn runs, AC refinement with correction bits) must be
    BIT-IDENTICAL to the sequential pipeline: both carry the same quantized
    coefficients, so any scan-machinery bug shows as a pixel diff."""
    from pylluminator_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    yy, xx = np.mgrid[0:33, 0:50]
    rng = np.random.RandomState(0)
    cases = [
        (((xx * 7 + yy * 3) % 256).astype(np.uint8), 85),       # gradient gray
        (np.stack([(xx * 5) % 256, (yy * 7) % 256,
                   ((xx + yy) * 3) % 256], axis=-1).astype(np.uint8), 92),
        (rng.randint(0, 256, (24, 40, 3), dtype=np.uint8), 75),  # dense ACs
        (np.full((64, 64), 128, np.uint8), 50),                  # long EOB runs
    ]
    for img, q in cases:
        seq = decode_jpeg(encode_jpeg(img, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
        np.testing.assert_array_equal(prog, seq)


def test_jpeg_restart_markers_roundtrip():
    """DRI + RSTn every N MCUs (predictor reset, byte-aligned resync)
    decodes identically to the unsegmented stream."""
    from pylluminator_spark.operators.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:40, 0:56]
    img = ((xx * 7 + yy * 3) % 256).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=90))
    rst = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=3))
    np.testing.assert_array_equal(plain, rst)
    rgb = np.stack([img, img[::-1], (img + 50) % 256], axis=-1).astype(np.uint8)
    a = decode_jpeg(
        encode_jpeg(rgb, quality=85, subsampling="4:2:0", restart_interval=2)
    )
    b = decode_jpeg(encode_jpeg(rgb, quality=85, subsampling="4:2:0"))
    np.testing.assert_array_equal(a, b)


def test_jpeg_multi_scan_sequential():
    """Spec-legal multi-scan baseline (one non-interleaved scan per
    component) must decode identically to the single interleaved scan —
    exercises the decoder's cross-scan coefficient accumulation and the
    single-component block-grid traversal."""
    from pylluminator_spark.operators.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:33, 0:50]
    rgb = np.stack(
        [(xx * 5) % 256, (yy * 7) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)
    single = decode_jpeg(encode_jpeg(rgb, quality=92))
    multi = decode_jpeg(encode_jpeg(rgb, quality=92, multi_scan=True))
    np.testing.assert_array_equal(multi, single)


class TestAudioDsp:
    """Physics-grounded checks for the spectral extractor and resampler."""

    @staticmethod
    def _sine_wav_df(spark, sr=8000, f0=1000.0, seconds=0.5, media_id=1):
        import numpy as np

        from pylluminator_spark.operators.multimodal import encode_wav

        t = np.arange(int(sr * seconds)) / sr
        x = (0.5 * 32767 * np.sin(2 * np.pi * f0 * t)).astype("<i2")
        return spark.createDataFrame(
            [(media_id, bytearray(encode_wav(x, sr)))],
            "media_id long, content binary",
        )

    def test_sine_centroid_near_f0(self, spark):
        from pylluminator_spark.operators.multimodal import (
            audio_spectral_features,
        )

        df = self._sine_wav_df(spark, f0=1000.0)
        row = audio_spectral_features(df).collect()[0]
        assert abs(row.spectral_centroid_hz - 1000.0) < 30
        assert row.spectral_bandwidth_hz < 200  # pure tone: narrow
        assert row.spectral_flatness < 0.05  # tonal, not noisy
        assert abs(row.zcr_rate - 2 * 1000.0 / 8000) < 0.01
        assert row.rms == pytest.approx(0.5 / 2**0.5, rel=0.01)

    def test_noise_flatness_high(self, spark):
        import numpy as np

        from pylluminator_spark.operators.multimodal import (
            audio_spectral_features,
            encode_wav,
        )

        rng = np.random.default_rng(4)
        x = (rng.uniform(-0.9, 0.9, 8000) * 32767).astype("<i2")
        df = spark.createDataFrame(
            [(7, bytearray(encode_wav(x, 8000)))],
            "media_id long, content binary",
        )
        row = audio_spectral_features(df).collect()[0]
        assert row.spectral_flatness > 0.3  # near-white
        assert 1500 < row.spectral_centroid_hz < 2500  # ~sr/4

    def test_resample_preserves_tone(self, spark):
        from pylluminator_spark.operators.multimodal import (
            audio_resample,
            audio_spectral_features,
        )

        df = self._sine_wav_df(spark, sr=8000, f0=500.0)
        down = audio_resample(df, 4000)
        row = down.collect()[0]
        assert row.sample_rate == 4000
        assert abs(row.n_samples - 2000) <= 1
        feats = audio_spectral_features(down).collect()[0]
        assert abs(feats.spectral_centroid_hz - 500.0) < 40

    def test_non_wav_rows_skipped(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"notriff-garbage"))],
            "media_id long, content binary",
        )
        from pylluminator_spark.operators.multimodal import (
            audio_spectral_features,
        )

        assert audio_spectral_features(df).count() == 0
