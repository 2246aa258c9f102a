"""E73 video frame-sequence content near-dup: invariance, tolerance,
bucket behavior, and envelope tolerance on hand-built videos."""

from __future__ import annotations

import numpy as np
import pytest

from mediaduplicatefinder_spark.operators.multimodal import (
    dhash64,
    pack_media,
    video_dup_pairs,
    video_signatures,
)

W, H, NF = 14, 10, 8  # sampled frames at stride 2: f = 0, 2, 4, 6


def _frames(seed=7):
    rng = np.random.RandomState(seed)
    # range 10..209 so +-10 brightness shifts cannot clamp
    return (rng.randint(0, 200, size=(NF, H, W)) + 10).astype(np.uint8)


def _pack(frames):
    return pack_media(2, W, H, NF, frames.astype(np.uint8).tobytes())


def _run_sigs(spark, rows):
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    return {r["media_id"]: r for r in video_signatures(df).collect()}


def test_signature_is_per_sampled_frame_dhash(spark):
    fr = _frames()
    got = _run_sigs(spark, [(1, _pack(fr))])[1]
    assert got["valid"] and (got["width"], got["height"], got["n_frames"]) == (W, H, NF)
    want = []
    for f in range(0, NF, 2):
        d = dhash64(fr[f])
        want.append(d - (1 << 64) if d >= (1 << 63) else d)
    assert list(got["sig"]) == want


def test_brightness_shift_invariant_and_pairs(spark):
    fr = _frames()
    shifted = fr.astype(np.int16) + 10  # stays <= 219: no clamping
    tail_corrupt = fr.copy()
    tail_corrupt[NF - 1] = 128  # unsampled? NF-1=7 is odd -> unsampled
    two_corrupt = fr.copy()
    two_corrupt[2] = 128
    two_corrupt[4] = 128  # two of four sampled frames -> 2/4 < 4/5
    rows = [
        (1, _pack(fr)),
        (2, _pack(shifted.astype(np.uint8))),
        (3, _pack(tail_corrupt)),
        (4, _pack(two_corrupt)),
        (9, b"junk"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    pairs = {
        (r["doc_a"], r["doc_b"]): (r["n_sampled"], r["n_match"], r["matched"])
        for r in video_dup_pairs(df).collect()
    }
    # brightness shift: identical signature, full match
    assert pairs[(1, 2)] == (4, 4, True)
    # odd-index tail corruption is invisible to the stride-2 sample
    assert pairs[(1, 3)] == (4, 4, True)
    # two sampled frames corrupted: in-bucket (frame 0 intact) but
    # under the 4/5 ratio -> rejected
    assert pairs[(1, 4)] == (4, 2, False)
    # junk payload is invalid and appears in no pair
    assert not any(9 in p for p in pairs)


def test_first_frame_corruption_changes_bucket(spark):
    fr = _frames(seed=11)
    head_corrupt = fr.copy()
    head_corrupt[0] = 128
    rows = [(1, _pack(fr)), (2, _pack(head_corrupt))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    assert video_dup_pairs(df).count() == 0


def test_envelope_tolerance(spark):
    fr = _frames()
    rows = [
        (1, pack_media(0, W, H, NF, fr.tobytes())),  # kind=image, not video
        (2, pack_media(2, W, H, NF, fr.tobytes()[: W * H])),  # short body
        (3, pack_media(2, 5, 5, 1, bytes(25))),  # below the 8x9 grid
    ]
    got = _run_sigs(spark, rows)
    assert all(not got[i]["valid"] for i in (1, 2, 3))


def test_hot_bucket_caps_to_chain(spark):
    """A bucket over bucket_cap degrades to consecutive-id chain pairs
    (linear, connectivity preserved); small buckets keep all pairs."""
    fr = _frames(seed=21)
    rows = [(i, _pack(fr)) for i in range(1, 7)]  # 6 identical videos
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    capped = video_dup_pairs(df, bucket_cap=3)
    got = sorted((r["doc_a"], r["doc_b"]) for r in capped.collect())
    assert got == [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    full = video_dup_pairs(df, bucket_cap=64)
    assert full.count() == 15  # C(6,2), all matched
    assert all(r["matched"] for r in full.collect())
