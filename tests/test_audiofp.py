"""E72 audio content fingerprint: invariance and sensitivity on
hand-built PCM through the real WAV codec."""

from __future__ import annotations

import numpy as np
import pytest

from mediaduplicatefinder_spark.functions.audiocodec import encode_wav
from mediaduplicatefinder_spark.functions.audiofp import (
    FRAME,
    NBITS,
    audio_fingerprints,
    fingerprint_samples,
)


def _signal(n=FRAME * 40, seed=3):
    rng = np.random.RandomState(seed)
    # varied per-frame envelope so orderings are strict
    env = rng.randint(1, 6, size=n // FRAME).repeat(FRAME)
    return (rng.randint(-2000, 2000, size=n) * env).astype(np.int64)


def test_amplitude_scaling_invariant():
    s = _signal()
    sig1, nf1 = fingerprint_samples(s)
    for m in (2, 3, 5):
        sig2, nf2 = fingerprint_samples(s * m)
        assert (sig2, nf2) == (sig1, nf1)
    assert nf1 == 40 and sig1 != 0


def test_localized_corruption_flips_bits():
    # strictly decreasing frame energies -> every bit is 1; a dominant
    # spike in frame 7 must flip EXACTLY bit 6 (E6 > E7 becomes false)
    # while bit 7 (E7 > E8) stays true
    n_frames = 40
    env = np.arange(n_frames, 0, -1).repeat(FRAME)
    s = (100 * env).astype(np.int64)  # E_f = 256*100*env_f, strict
    sig1, _ = fingerprint_samples(s)
    assert sig1 == (1 << NBITS) - 1  # all ones
    corrupted = s.copy()
    corrupted[7 * FRAME : 8 * FRAME] = 32000  # frame energy >> any other
    sig2, _ = fingerprint_samples(corrupted)
    flipped = sig1 ^ sig2
    assert flipped == 1 << (NBITS - 1 - 6)


def test_short_and_empty_signals():
    assert fingerprint_samples(np.empty(0, dtype=np.int64)) == (0, 0)
    assert fingerprint_samples(np.ones(FRAME, dtype=np.int64)) == (0, 1)
    # exactly 2 frames -> 1 bit, left-aligned to the MSB position
    two = np.concatenate(
        [np.full(FRAME, 100, dtype=np.int64), np.full(FRAME, 50, dtype=np.int64)]
    )
    sig, nf = fingerprint_samples(two)
    assert nf == 2 and sig == 1 << (NBITS - 1)


def test_through_real_wav_bytes(spark):
    s = _signal(seed=9)
    rows = [
        (1, encode_wav(s.astype(np.int16))),
        (2, encode_wav((s * 2).astype(np.int16))),  # scaled twin
        (3, b"junk, not RIFF"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in audio_fingerprints(df).collect()}
    want_sig, want_nf = fingerprint_samples(s)
    assert got[1]["sig"] == want_sig and got[1]["n_frames"] == want_nf
    assert got[2]["sig"] == want_sig  # volume change, same content
    assert got[1]["valid"] and got[2]["valid"]
    assert not got[3]["valid"] and got[3]["sig"] == 0
