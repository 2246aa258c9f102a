"""pHash DCT perceptual hash (operators/phash.py, E162)."""

from __future__ import annotations

import numpy as np
import pytest

from mediaduplicatefinder_spark.operators.multimodal import (
    HEADER_LEN,
    pack_media,
)
from mediaduplicatefinder_spark.operators.phash import (
    DCT_K,
    cos_table,
    phash64,
    phash_media,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_cos_table_pinned():
    ct = cos_table()
    assert ct.shape == (32, 32)
    assert ct[0, 0] == 16384  # cos(0) * 2^14
    assert (ct[:, 0] == 16384).all()  # u=0 column is flat
    # orthogonality sanity on the unscaled basis: distinct columns are
    # near-orthogonal (inner product << norm^2)
    f = ct.astype(np.float64)
    g = f.T @ f
    assert abs(g[1, 2]) < 0.01 * g[1, 1]


def test_sign_bit_never_set():
    rng = np.random.RandomState(3)
    for _ in range(20):
        img = rng.randint(0, 256, (rng.randint(8, 99), rng.randint(9, 99)))
        assert phash64(img.astype(np.uint8)) >= 0  # DC bit pinned 0


def test_brightness_invariance_and_discrimination():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 200, (80, 100)).astype(np.uint8)
    bright = (img + 40).astype(np.uint8)  # uniform shift, no clipping
    other = rng.randint(0, 200, (80, 100)).astype(np.uint8)
    h = phash64(img)
    assert _ham(h, phash64(bright)) == 0  # DC absorbs uniform shifts
    assert _ham(h, phash64(other)) > 16


def test_blur_robust_vs_dhash():
    # mild box blur on a STRUCTURED (low-frequency) image: pHash reads
    # the low spectrum, so it must move far less than a random pair
    # (pure noise would be the adversarial case — blur erases it)
    rng = np.random.RandomState(11)
    yy, xx = np.mgrid[0:96, 0:96]
    img = (
        128
        + 60 * np.sin(xx / 9.0)
        + 50 * np.cos(yy / 13.0)
        + rng.randint(-10, 10, (96, 96))
    ).clip(0, 255).astype(np.uint8)
    k = np.ones((3, 3)) / 9.0
    pad = np.pad(img.astype(float), 1, mode="edge")
    blur = np.zeros_like(img, dtype=float)
    for dy in range(3):
        for dx in range(3):
            blur += pad[dy : dy + 96, dx : dx + 96] * k[dy, dx]
    blur = blur.astype(np.uint8)
    d_blur = _ham(phash64(img), phash64(blur))
    other = rng.randint(0, 256, (96, 96)).astype(np.uint8)
    d_rand = _ham(phash64(img), phash64(other))
    assert d_blur < d_rand / 2


def test_media_udf_and_gates(spark):
    rng = np.random.RandomState(5)
    body = rng.randint(0, 256, 64 * 64).astype(np.uint8).tobytes()
    rows = [
        (1, pack_media(0, 64, 64, 1, body)),          # image -> hashed
        (2, pack_media(1, 44100, 1, 100, body)),      # audio -> dropped
        (3, b"NOTMEDIA" + body),                      # bad magic -> dropped
        (4, pack_media(0, 4, 4, 1, body[:16])),       # too small -> dropped
        (5, pack_media(0, 64, 64, 1, body)),          # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r.phash for r in phash_media(df).collect()}
    assert set(got) == {1, 5}
    assert got[1] == got[5]
    from mediaduplicatefinder_spark.operators.multimodal import gray_from_body

    assert got[1] == phash64(gray_from_body(body))


def test_partition_invariance(spark):
    rng = np.random.RandomState(9)
    rows = [
        (i, pack_media(0, 0, 0, 1, rng.randint(0, 256, 900).astype(np.uint8).tobytes()))
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    outs = [
        {r.media_id: r.phash for r in phash_media(df.repartition(p)).collect()}
        for p in (1, 5)
    ]
    assert outs[0] == outs[1] and len(outs[0]) == 12


def test_dup_pairs_channel(spark):
    from mediaduplicatefinder_spark.operators.phash import phash_dup_pairs

    rng = np.random.RandomState(17)
    base = rng.randint(0, 256, 40 * 40).astype(np.uint8)
    near = base.copy()
    near[::97] = np.clip(near[::97].astype(int) + 4, 0, 255).astype(np.uint8)
    far = rng.randint(0, 256, 40 * 40).astype(np.uint8)
    rows = [
        (1, pack_media(0, 40, 40, 1, base.tobytes())),
        (2, pack_media(0, 40, 40, 1, near.tobytes())),   # near-dup of 1
        (3, pack_media(0, 40, 40, 1, far.tobytes())),    # unrelated
        (4, pack_media(0, 40, 40, 1, base.tobytes())),   # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r.id_a, r.id_b): r.phash_hamming
        for r in phash_dup_pairs(df, hamming_threshold=10).collect()
    }
    assert (1, 4) in got and got[(1, 4)] == 0
    assert (1, 2) in got and got[(1, 2)] <= 10
    assert not any(3 in p for p in got)
    # banding completeness at distance <= 3: any such pair MUST share a
    # 16-bit chunk — verify against brute force on the digests
    from mediaduplicatefinder_spark.operators.phash import phash_media

    digs = {r.media_id: r.phash for r in phash_media(df).collect()}
    for a in digs:
        for b in digs:
            if a < b and bin((digs[a] ^ digs[b]) & (2**64 - 1)).count("1") <= 3:
                assert (a, b) in got


def test_banding_complete_at_shipped_threshold(spark):
    """Review r5: the default band width must satisfy the pigeonhole
    bound at the default verify threshold — a planted pair at Hamming
    distance 10 (> the old 16-bit-band guarantee of 3) must be found.
    Exercises the band join directly on synthetic digests."""
    from pyspark.sql import functions as F

    from mediaduplicatefinder_spark.operators import phash as ph

    t = 10
    bb = max(1, 64 // (t + 1))
    assert bb == 5  # 12 bands of 5 bits -> >= 2 clean bands at d=10
    h1 = 0x0123456789ABCDE  # 60-bit positive
    # flip 10 bits spread across 10 DIFFERENT 5-bit bands
    h2 = h1
    for i in range(10):
        h2 ^= 1 << (i * 5)
    assert bin(h1 ^ h2).count("1") == t
    digests = spark.createDataFrame(
        [(1, h1), (2, h2)], "media_id long, phash long"
    )
    # run the band join portion by monkey-patching phash_media
    orig = ph.phash_media
    ph.phash_media = lambda media, id_col="media_id": digests
    try:
        out = ph.phash_dup_pairs(digests, hamming_threshold=t).collect()
    finally:
        ph.phash_media = orig
    assert [(r.id_a, r.id_b, r.phash_hamming) for r in out] == [(1, 2, t)]
