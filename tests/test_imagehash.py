"""Unit tests for the perceptual image-hash operator: planted
near-duplicate frames recovered through the real decode path, and the
pigeonhole banding proven exact against a brute-force all-pairs
reference on random hashes.
"""

from __future__ import annotations

import random

import numpy as np

from video_streamer_spark.operators import imagehash


def _ppm(raster: bytes, w: int = 8, h: int = 4) -> bytes:
    return b"P6\n%d %d\n255\n" % (w, h) + raster


def _dhash_ref(raster: bytes, w: int = 8, h: int = 4) -> int:
    a = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    luma = a.sum(axis=2, dtype=np.int64)
    bits = (luma[:, :-1] > luma[:, 1:]).ravel()
    return int(np.sum(bits * (1 << np.arange(bits.size, dtype=np.int64))))


def test_dhash_planted_near_dup(spark):
    """A frame, a 1-pixel-nudged copy (hamming <= 3) and an unrelated
    frame: exactly the planted pair comes back, with the hamming the
    numpy reference computes."""
    rng = random.Random(7)
    base = bytes(rng.randrange(256) for _ in range(96))
    near = bytearray(base)
    near[30] = (near[30] + 120) % 256  # nudge one channel of one pixel
    near = bytes(near)
    far = bytes((b + 97) % 256 for b in base[::-1])
    frames = spark.createDataFrame(
        [(1, _ppm(base)), (2, _ppm(near)), (3, _ppm(far))],
        "doc_id long, payload binary",
    )
    hashes = imagehash.dhash_frames(frames, width=8, height=4)
    got = {r["doc_id"]: r["dhash"] for r in hashes.collect()}
    assert got == {
        i: _dhash_ref(r) for i, r in ((1, base), (2, near), (3, far))
    }
    expect_h = bin(got[1] ^ got[2]).count("1")
    assert expect_h <= 3, "planted nudge drifted out of radius"
    pairs = imagehash.dhash_near_pairs(hashes, bits=28, max_hamming=3)
    rows = [(r["doc_a"], r["doc_b"], r["hamming"]) for r in pairs.collect()]
    assert rows == [(1, 2, expect_h)]


def test_banding_exact_vs_brute_force(spark):
    """dhash_near_pairs on 80 random 28-bit hashes == brute-force
    all-pairs: the pigeonhole equi-join generates EVERY pair within the
    radius (n_bands > max_hamming), and none outside it survives."""
    rng = random.Random(11)
    hashes = [rng.getrandbits(28) for _ in range(60)]
    # salt in guaranteed-close pairs so the radius is actually exercised
    for i in range(0, 20, 2):
        flipped = hashes[i]
        for bit in rng.sample(range(28), rng.randrange(4)):
            flipped ^= 1 << bit
        hashes.append(flipped)
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hashes)], "doc_id long, dhash long"
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in imagehash.dhash_near_pairs(
            df, bits=28, max_hamming=3
        ).collect()
    )
    want = sorted(
        (i, j, bin(hashes[i] ^ hashes[j]).count("1"))
        for i in range(len(hashes))
        for j in range(i + 1, len(hashes))
        if bin(hashes[i] ^ hashes[j]).count("1") <= 3
    )
    assert got == want


def test_undeclared_geometry_raises(spark):
    """A frame that decodes to a size other than the declared one must
    fail loudly — even when it sits alone in its partition (declared
    geometry, not per-task inference, is what makes this safe)."""
    import pytest

    frames = spark.createDataFrame(
        [(1, _ppm(bytes(96))), (2, b"P6\n4 2\n255\n" + bytes(24))],
        "doc_id long, payload binary",
    ).repartition(2, "doc_id")
    with pytest.raises(Exception, match="does not match declared"):
        imagehash.dhash_frames(frames, width=8, height=4).collect()
