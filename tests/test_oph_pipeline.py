"""E172 pipeline integration: cfg.use_oph swaps the 128-permutation
MinHash slot fill for the single-pass OPH signature inside the fused
signature stage — downstream banding/verify/CC unchanged."""

from __future__ import annotations

from dataclasses import replace

import numpy as np

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.functions import hashing
from mediaduplicatefinder_spark.functions.oph import (
    oph_band_hashes,
    oph_signature_batch,
)
from mediaduplicatefinder_spark.functions.sigcore import (
    SignatureComputer,
    shingle_set,
    token_seq,
)
from mediaduplicatefinder_spark.pipeline import run_dedup

OPH_CFG = replace(DEFAULT_CONFIG, use_oph=True)


def test_sigcore_oph_slots_match_reference_and_simhash_unchanged():
    texts = [
        "the quick brown fox jumps over the lazy dog " * 10,
        "",
        "alpha beta gamma delta epsilon zeta eta theta " * 5,
        "the quick brown fox jumps over the lazy dig " * 10,
    ]
    std = SignatureComputer(DEFAULT_CONFIG).compute(texts)
    oph = SignatureComputer(OPH_CFG).compute(texts)

    # simhash and token sets are computed by the unchanged code paths
    assert oph["simhash1"] == std["simhash1"]
    assert oph["simhash2"] == std["simhash2"]
    for a, b in zip(oph["token_hashes"], std["token_hashes"]):
        assert list(a) == list(b)

    # minhash slots == the standalone OPH reference, bands == the fold
    hl = [
        hashing.fnv1a64(
            shingle_set(token_seq(t, 3), DEFAULT_CONFIG.shingle_k)
        )
        for t in texts
    ]
    exp = oph_signature_batch(hl, DEFAULT_CONFIG.num_perm, DEFAULT_CONFIG.minhash_seed)
    got = np.array(oph["minhash"], dtype=np.int64).view(np.uint64)
    assert (got == exp).all()
    expb = hashing.to_int64(
        oph_band_hashes(
            exp, DEFAULT_CONFIG.minhash_bands, DEFAULT_CONFIG.minhash_rows
        )
    )
    assert [list(x) for x in oph["band_hashes"]] == [
        [int(v) for v in row] for row in expb
    ]

    # empty doc keeps the all-u64max (-1 signed) convention
    assert all(v == -1 for v in oph["minhash"][1])


def test_sigcore_oph_batch_invariance():
    texts = [f"tok{i} " * (i % 40 + 1) + "shared common words here" for i in range(30)]
    comp = SignatureComputer(OPH_CFG)
    whole = comp.compute(texts)
    split = [comp.compute(texts[i : i + 7]) for i in range(0, 30, 7)]
    flat = [list(m) for part in split for m in part["minhash"]]
    assert [list(m) for m in whole["minhash"]] == flat


def _pair_set(res):
    return {
        (min(r.url_a, r.url_b), max(r.url_a, r.url_b))
        for r in res.pairs.collect()
    }


def _clusters(res):
    groups: dict = {}
    for r in res.clusters.collect():
        groups.setdefault(r.cluster_id, set()).add(r.url)
    return sorted(frozenset(g) for g in groups.values())


def test_oph_pipeline_matches_standard(spark, tiny_pages_df):
    """Same verify gate -> precision is identical by construction; on
    the tiny high-similarity corpus the OPH band channel (plus the
    unchanged simhash channel) must also reach the full pair relation,
    so pairs AND clusters coincide with the standard profile."""
    base = run_dedup(spark, tiny_pages_df, DEFAULT_CONFIG)
    oph = run_dedup(spark, tiny_pages_df, OPH_CFG)
    assert _pair_set(oph) == _pair_set(base)
    assert _clusters(oph) == _clusters(base)
    base.pairs.unpersist()
    oph.pairs.unpersist()
