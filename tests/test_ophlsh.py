"""E172 OPH signatures: the vectorized batch must equal the scalar
reference bit-for-bit, be batch/partition-invariant, fill every bin by
the ICML'14 rotation rule, estimate Jaccard unbiasedly enough to drive
banding, and the end-to-end channel must reach full verified recall on
the planted near-dup corpus at ~1/num_perm the remix work."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.functions import hashing
from mediaduplicatefinder_spark.functions.oph import (
    DENSIFY_C,
    U64MAX,
    oph_band_hashes,
    oph_reference,
    oph_signature_batch,
)
from mediaduplicatefinder_spark.functions.sigcore import (
    SignatureComputer,
    shingle_set,
    token_seq,
)
from mediaduplicatefinder_spark.operators.ophlsh import (
    oph_lsh_pairs,
    oph_signatures,
)

P = DEFAULT_CONFIG.num_perm
SEED = DEFAULT_CONFIG.minhash_seed


def _hash_lists(seed: int, n_docs: int = 40):
    rng = random.Random(seed)
    out = []
    for _ in range(n_docs):
        k = rng.choice([0, 1, 3, 20, 200, 1000])
        out.append(
            np.array(
                [rng.getrandbits(64) for _ in range(k)], dtype=np.uint64
            )
        )
    return out


def test_batch_equals_scalar_reference():
    hl = _hash_lists(1)
    sig = oph_signature_batch(hl, P, SEED)
    for i, h in enumerate(hl):
        assert [int(x) for x in sig[i]] == oph_reference(h, P, SEED), i


def test_batch_invariance():
    hl = _hash_lists(2)
    whole = oph_signature_batch(hl, P, SEED)
    parts = np.vstack(
        [oph_signature_batch(hl[i : i + 7], P, SEED) for i in range(0, len(hl), 7)]
    )
    assert (whole == parts).all()


def test_densification_fills_every_bin():
    # single token: one non-empty bin; all others must be rotation fills
    h = np.array([12345], dtype=np.uint64)
    sig = oph_signature_batch([h], P, SEED)[0]
    m = int(hashing.splitmix64(np.uint64(12345) ^ np.uint64(SEED)))
    b = m % P
    assert int(sig[b]) == m
    for j in range(P):
        t = (b - j) % P
        assert int(sig[j]) == (m + t * int(DENSIFY_C)) % (1 << 64)


def test_empty_doc_stays_u64max():
    sig = oph_signature_batch([np.array([], dtype=np.uint64)], P, SEED)[0]
    assert (sig == U64MAX).all()


def test_jaccard_estimator_tracks_truth():
    # two sets with known overlap: slot-agreement rate ~ Jaccard
    rng = random.Random(7)
    common = [rng.getrandbits(64) for _ in range(600)]
    a = np.array(common + [rng.getrandbits(64) for _ in range(200)], dtype=np.uint64)
    b = np.array(common + [rng.getrandbits(64) for _ in range(200)], dtype=np.uint64)
    true_j = 600 / 1000
    sig = oph_signature_batch([a, b], P, SEED)
    est = float((sig[0] == sig[1]).mean())
    assert abs(est - true_j) < 0.15  # 128 slots -> se ~ 0.043


def test_band_fold_matches_standard_chain():
    # the fold must be the sigcore accumulator chain exactly
    sig = oph_signature_batch(_hash_lists(3, 5), P, SEED)
    b, r = DEFAULT_CONFIG.minhash_bands, DEFAULT_CONFIG.minhash_rows
    got = oph_band_hashes(sig, b, r)
    acc = hashing.splitmix64(np.arange(b, dtype=np.uint64))
    for d in range(sig.shape[0]):
        for j in range(b):
            a = acc[j]
            for i in range(r):
                a = hashing.splitmix64(a ^ sig[d, j * r + i])
            assert got[d, j] == a


def test_spark_signatures_match_numpy(spark, tiny_pages_df):
    docs = tiny_pages_df.select("url", "lang", "text")
    rows = {r["url"]: r for r in oph_signatures(docs).collect()}
    for t in tiny_pages_df.select("url", "text").collect():
        hl = hashing.fnv1a64(
            shingle_set(token_seq(t["text"] or "", 3), DEFAULT_CONFIG.shingle_k)
        )
        sig = oph_signature_batch([hl], P, SEED)
        exp = hashing.to_int64(
            oph_band_hashes(
                sig, DEFAULT_CONFIG.minhash_bands, DEFAULT_CONFIG.minhash_rows
            )
        )[0]
        assert list(rows[t["url"]]["band_hashes"]) == [int(x) for x in exp]


def test_partition_invariance(spark, tiny_pages_df):
    docs = tiny_pages_df.select("url", "lang", "text")
    one = {
        tuple(r) for r in oph_lsh_pairs(docs.coalesce(1)).collect()
    }
    many = {
        tuple(r) for r in oph_lsh_pairs(docs.repartition(13)).collect()
    }
    assert one == many and one


def test_channel_recall_on_tiny_corpus(spark, tiny_pages_df):
    """Verified OPH pairs vs the python oracle's full pair relation:
    precision is exact by construction (same Jaccard decision); recall
    on the tiny high-similarity corpus must be 1.0 — banding agreement
    at J > 0.6 with 32 bands of 4 rows is overwhelming, and a miss
    would indicate a broken signature, not estimator variance."""
    from mediaduplicatefinder_spark.oracle.dedup import Page, all_similar_pairs

    plist = [
        Page(r.url, r.text, r.lang, bytes(r.html))
        for r in tiny_pages_df.orderBy("url").collect()
    ]
    truth = {
        tuple(sorted(k)) for k in all_similar_pairs(plist, set())
    }
    docs = tiny_pages_df.select("url", "lang", "text")
    got = {
        tuple(sorted((r["url_a"], r["url_b"])))
        for r in oph_lsh_pairs(docs).collect()
    }
    assert got <= truth or not truth  # soundness: same exact decision
    assert got == truth  # full recall on the planted corpus


def test_remix_work_is_single_pass():
    """The scale claim, measured: OPH's HASH CORE (one remix +
    scatter-min + fill + fold) must beat the standard signature core
    (128 remix passes + 2 SimHashes) by >= 3x on identical input —
    the algorithmic gap is 128 passes vs 1, so the real margin is
    orders of magnitude and 3x is a deeply conservative floor. The
    FULL text->bands path only gets a 1.5x floor: tokenization is
    shared by both paths and bounds the end-to-end ratio (Amdahl),
    and its relative cost varies with text shape and interpreter —
    bench.py publishes the honest full-path number per round."""
    import time

    rng = random.Random(11)
    texts = [
        " ".join(
            rng.choice(["alpha", "beta", "gamma", "delta", "epsilon"])
            + str(rng.randrange(5000))
            for _ in range(400)
        )
        for _ in range(300)
    ]
    comp = SignatureComputer(DEFAULT_CONFIG)

    def oph_full(ts):
        hl = [
            hashing.fnv1a64(shingle_set(token_seq(t, 3), 1)) for t in ts
        ]
        sig = oph_signature_batch(hl, P, SEED)
        return oph_band_hashes(
            sig, DEFAULT_CONFIG.minhash_bands, DEFAULT_CONFIG.minhash_rows
        )

    comp.compute(texts[:20])  # warm both paths (allocator, caches)
    oph_full(texts[:20])

    # min-of-3: wall-clock noise from a loaded test host inflates
    # single shots; the MIN of several reps is the contention-robust
    # estimator (same protocol as bench.py / BENCH/BASELINE.md)
    std = min(_timed(lambda: comp.compute(texts)) for _ in range(3))
    oph = min(_timed(lambda: oph_full(texts)) for _ in range(3))
    tok = min(
        _timed(
            lambda: [
                hashing.fnv1a64(shingle_set(token_seq(t, 3), 1))
                for t in texts
            ]
        )
        for _ in range(3)
    )

    std_core = max(std - tok, 1e-9)
    oph_core = max(oph - tok, 1e-9)
    assert oph_core * 3 < std_core, (std, oph, tok)
    assert oph * 1.5 < std, (std, oph, tok)


def _timed(fn):
    import time

    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0
