"""Perceptual image hashing (DCT pHash) + banded hamming pairs: python
reference parity, robustness invariants (exact copy -> 0, mild noise ->
small, distinct content -> larger), and the pigeonhole pair-generation
guarantee against brute force."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pylluminator_spark.operators.multimodal import (
    encode_bmp,
    image_phash,
    phash_bits,
    phash_candidate_pairs,
)

rng = np.random.RandomState(5)


def _img(seed: int, h: int = 24, w: int = 31) -> np.ndarray:
    r = np.random.RandomState(seed)
    # smooth content + structure so hashes differ across seeds
    y, x = np.mgrid[0:h, 0:w]
    base = (
        128
        + 90 * np.sin(x / (3.0 + seed % 5) + seed)
        + 60 * np.cos(y / (2.0 + seed % 3))
    )
    img = np.clip(base + r.normal(0, 4, (h, w)), 0, 255).astype(np.uint8)
    return np.repeat(img[:, :, None], 3, axis=2)


def _phash_ref(arr: np.ndarray, s: int = 8, f: int = 4) -> int:
    """Independent loop-wise reference: same published definition,
    different construction (explicit cosine double loop, no matrices)."""
    a = arr.astype(np.float64).mean(axis=2)
    n = s * f
    h, w = a.shape
    if h < n:
        a = a[[(i * h) // n for i in range(n)], :]
        h = n
    if w < n:
        a = a[:, [(j * w) // n for j in range(n)]]
        w = n
    small = np.zeros((n, n))
    cnt = np.zeros((n, n))
    for i in range(h):
        for j in range(w):
            small[(i * n) // h, (j * n) // w] += a[i, j]
            cnt[(i * n) // h, (j * n) // w] += 1
    small /= cnt
    coefs = np.zeros((s, s))
    for k in range(s):
        for l in range(s):
            tot = 0.0
            for i in range(n):
                for j in range(n):
                    tot += (
                        small[i, j]
                        * math.cos(math.pi * (2 * i + 1) * k / (2 * n))
                        * math.cos(math.pi * (2 * j + 1) * l / (2 * n))
                    )
            sk = math.sqrt(1.0 / n) if k == 0 else math.sqrt(2.0 / n)
            sl = math.sqrt(1.0 / n) if l == 0 else math.sqrt(2.0 / n)
            coefs[k, l] = sk * sl * tot
    med = np.median(coefs)
    bits = 0
    flat = coefs.ravel()
    for i in range(s * s):
        if flat[i] > med:
            bits |= 1 << i
    return int(np.int64(np.uint64(bits)))


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_matches_loopwise_reference():
    for seed in (1, 2, 9):
        arr = _img(seed)
        assert phash_bits(arr) == pytest.approx(_phash_ref(arr), abs=0), seed


def test_phash_robustness_ordering():
    base = _img(3)
    # exact copy
    assert _ham(phash_bits(base), phash_bits(base.copy())) == 0
    # mild pixel noise: small hamming
    noisy = np.clip(
        base.astype(int) + rng.randint(-3, 4, base.shape), 0, 255
    ).astype(np.uint8)
    d_noise = _ham(phash_bits(base), phash_bits(noisy))
    # resize (different pixel grid, same content): closer than different
    # content — a 2x nearest subsample of noisy sinusoids aliases, so
    # only the ORDERING is asserted, not an absolute bound
    small = base[::2, ::2]
    d_resize = _ham(phash_bits(base), phash_bits(small))
    # different content: larger
    other = _img(77)
    d_other = _ham(phash_bits(base), phash_bits(other))
    assert d_noise <= 6, d_noise
    assert d_resize < d_other, (d_resize, d_other)
    assert d_other > 10, d_other


def test_candidate_pairs_match_bruteforce(spark):
    imgs = {i: _img(i) for i in range(40)}
    imgs.update({100 + i: imgs[i] for i in range(6)})  # exact dups
    for i in range(6, 12):  # near dups
        imgs[100 + i] = np.clip(
            imgs[i].astype(int) + rng.randint(-2, 3, imgs[i].shape), 0, 255
        ).astype(np.uint8)
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": list(imgs),
                "kind": "image",
                "content": [encode_bmp(a) for a in imgs.values()],
            }
        )
    )
    hashes = image_phash(media)
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_candidate_pairs(hashes, max_hamming=7, bands=8).collect()
    }
    # brute force over the python hashes
    hs = {i: phash_bits(a) for i, a in imgs.items()}
    want = {
        (a, b): _ham(hs[a], hs[b])
        for a in hs
        for b in hs
        if a < b and _ham(hs[a], hs[b]) <= 7
    }
    assert got == want
    # the planted exact duplicates are all found at hamming 0
    for i in range(6):
        assert got.get((i, 100 + i)) == 0, i


def test_pigeonhole_bound_enforced(spark):
    df = spark.createDataFrame([(1, 5), (2, 7)], ["media_id", "phash"])
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_candidate_pairs(df, max_hamming=8, bands=8)
    with pytest.raises(ValueError, match="divide"):
        phash_candidate_pairs(df, max_hamming=3, bands=7)


def test_phash_plan_is_blocked_join(spark):
    imgs = {i: _img(i) for i in range(10)}
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": list(imgs),
                "kind": "image",
                "content": [encode_bmp(a) for a in imgs.values()],
            }
        )
    )
    pairs = phash_candidate_pairs(image_phash(media))
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_video_frame_phashes(spark):
    """Frame-level hashes: identical frames hash identically across
    videos; a video sharing half its frames with another overlaps on
    exactly those frame hashes."""
    import struct

    from pylluminator_spark.operators.multimodal import (
        KIND_VIDEO,
        MAGIC,
        video_frame_phashes,
    )

    h, w, nf = 20, 24, 4

    def vid(frames):
        header = MAGIC + struct.pack("<BHHH", KIND_VIDEO, w, h, nf)
        return header + np.concatenate([f.ravel() for f in frames]).tobytes()

    f = [
        _img(i, h, w)[:, :, 0] for i in range(6)
    ]  # single-channel frames
    v0 = vid(f[0:4])
    v1 = vid(f[0:2] + f[4:6])  # shares frames 0,1 with v0
    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [0, 1], "kind": "video", "content": [v0, v1]}
        )
    )
    rows = video_frame_phashes(media, every_n=1).collect()
    hs = {(r["media_id"], r["frame_idx"]): r["phash"] for r in rows}
    assert len(hs) == 8
    assert hs[(0, 0)] == hs[(1, 0)] and hs[(0, 1)] == hs[(1, 1)]
    assert hs[(0, 2)] != hs[(1, 2)]
    shared = len(
        {v for k, v in hs.items() if k[0] == 0}
        & {v for k, v in hs.items() if k[0] == 1}
    )
    assert shared == 2


def test_phash_bit63_is_pure_python_twos_complement():
    """ADVICE r8: int(np.int64(uint64-with-bit-63)) is an out-of-range
    scalar-constructor cast (error under NumPy 2.x). The pure-Python
    two's complement must return a negative long whenever bit 63 is set.
    Bit 63 is coefficient (7,7) of the 8x8 DCT block; synthesizing the
    32x32 image from the inverse DCT of a chosen coefficient grid makes
    the bit deterministic."""
    import numpy as np

    from pylluminator_spark.operators.multimodal import (
        _dct_matrix,
        phash_bits,
    )

    d = _dct_matrix(32)
    coefs = np.zeros((32, 32))
    coefs[7, 7] = 10.0  # -> bit 63
    coefs[0, 0] = 10.0  # -> bit 0
    gray = d.T @ coefs @ d  # orthonormal: forward DCT recovers coefs
    h = phash_bits(gray)
    assert isinstance(h, int)
    assert h < 0  # bit 63 set -> negative signed 64-bit
    u = h + (1 << 64)
    assert (u >> 63) & 1 == 1
    assert u & 1 == 1


def _brute_video_pairs(rows, t, k):
    """Reference: rows = [(vid, frame_idx, phash)]; a frame of A is
    matched when some frame of B is within hamming t; pair kept when
    both matched counts >= k."""
    import itertools

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    byv = {}
    for vid, _idx, h in rows:
        byv.setdefault(vid, []).append(h)
    out = {}
    for a, b in itertools.combinations(sorted(byv), 2):
        ma = sum(
            1 for ha in byv[a] if any(ham(ha, hb) <= t for hb in byv[b])
        )
        mb = sum(
            1 for hb in byv[b] if any(ham(ha, hb) <= t for ha in byv[a])
        )
        if min(ma, mb) >= k:
            out[(a, b)] = (ma, mb, len(byv[a]), len(byv[b]))
    return out


def test_video_near_dup_pairs_brute_force_parity(spark):
    """Operator vs all-pairs reference on adversarial frame-hash tables:
    planted near-dups at several hamming distances, repeated frames
    (still segments), negative hashes (bit 63), and disjoint videos."""
    import random

    from pylluminator_spark.operators.multimodal import (
        video_near_dup_pairs,
    )

    rng = random.Random(42)
    rows = []
    bases = [rng.getrandbits(63) for _ in range(6)]
    bases[3] |= 1 << 62
    for vid in range(12):
        base = bases[vid % 6]
        for idx in range(5 + vid % 3):
            h = base
            # flip vid%4 low bits on odd frames -> hamming 0..3 planted
            if idx % 2:
                for b in range(vid % 4):
                    h ^= 1 << (b * 7)
            if vid >= 9:  # pure noise videos
                h = rng.getrandbits(64)
            h = h - (1 << 64) if h >= (1 << 63) else h
            rows.append((vid, idx, h))
            if idx == 0:  # a still segment: frame 0 repeated twice
                rows.append((vid, 100 + idx, h))
    df = spark.createDataFrame(rows, "media_id long, frame_idx int, phash long")
    for t, k in [(3, 1), (0, 2), (7, 3)]:
        got = {
            (r["id_a"], r["id_b"]): (
                r["matched_a"], r["matched_b"],
                r["n_frames_a"], r["n_frames_b"],
            )
            for r in video_near_dup_pairs(
                df, max_hamming=t, bands=8, min_shared_frames=k
            ).collect()
        }
        want = _brute_video_pairs(rows, t, k)
        assert got == want, (t, k)


def test_video_near_dup_pairs_end_to_end(spark):
    """Full pipeline on packed synthetic videos: re-encode twins match
    on every frame (frac 1.0 both sides), a clip-in-compilation matches
    asymmetrically, disjoint videos produce no pair."""
    import struct

    from pylluminator_spark.operators.multimodal import (
        KIND_VIDEO,
        MAGIC,
        video_frame_phashes,
        video_near_dup_pairs,
    )

    h, w = 20, 24
    f = [_img(i, h, w)[:, :, 0] for i in range(8)]

    def vid(frames):
        header = MAGIC + struct.pack("<BHHH", KIND_VIDEO, w, h, len(frames))
        return header + np.concatenate(
            [fr.ravel() for fr in frames]
        ).tobytes()

    v0 = vid(f[0:4])          # base
    v1 = vid(f[0:4])          # exact twin of v0
    v2 = vid(f[0:2] + f[4:6])  # shares half with v0
    v3 = vid(f[6:8])          # disjoint
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [0, 1, 2, 3],
                "kind": "video",
                "content": [v0, v1, v2, v3],
            }
        )
    )
    fh = video_frame_phashes(media, every_n=1)
    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in video_near_dup_pairs(
            fh, max_hamming=0, bands=8, min_shared_frames=2
        ).collect()
    }
    assert set(pairs) == {(0, 1), (0, 2), (1, 2)}
    assert pairs[(0, 1)]["frac_a"] == 1.0 and pairs[(0, 1)]["frac_b"] == 1.0
    assert pairs[(0, 2)]["matched_a"] == 2 and pairs[(0, 2)]["frac_b"] == 0.5
    # plan shape: banded equi-join, never a product
    plan = (
        video_near_dup_pairs(fh)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_video_near_dup_pairs_validates_params(spark):
    from pylluminator_spark.operators.multimodal import (
        video_near_dup_pairs,
    )

    df = spark.createDataFrame(
        [(0, 0, 1)], "media_id long, frame_idx int, phash long"
    )
    with pytest.raises(ValueError, match="pigeonhole"):
        video_near_dup_pairs(df, max_hamming=8, bands=8)
    with pytest.raises(ValueError, match="divide"):
        video_near_dup_pairs(df, max_hamming=3, bands=7)
