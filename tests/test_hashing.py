"""Hashing kernels: vectorized == canonical scalar; MinHash estimates
Jaccard within Chernoff bounds; SimHash Hamming tracks similarity
(SURVEY.md §5.2 layer 4)."""

from __future__ import annotations

import numpy as np

from mediaduplicatefinder_spark.config import EngineConfig
from mediaduplicatefinder_spark.functions import hashing
from mediaduplicatefinder_spark.functions.sigcore import SignatureComputer


def fnv1a64_scalar(s: str) -> int:
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def test_fnv1a64_matches_canonical():
    tokens = ["a", "abc", "hello", "x" * 71, "42", "", "zqj"]
    vec = hashing.fnv1a64(tokens)
    for t, h in zip(tokens, vec):
        assert int(h) == fnv1a64_scalar(t), t


def test_fnv1a64_empty_input():
    assert hashing.fnv1a64([]).shape == (0,)


def test_splitmix64_deterministic():
    a = hashing.splitmix64(np.array([1, 2, 3], dtype=np.uint64))
    b = hashing.splitmix64(np.array([1, 2, 3], dtype=np.uint64))
    assert (a == b).all()
    assert len(set(a.tolist())) == 3


def test_minhash_estimates_jaccard():
    rng = np.random.RandomState(0)
    cfg = EngineConfig()
    seeds = hashing.perm_seeds(cfg.num_perm, cfg.minhash_seed)
    vocab = [f"tok{i}" for i in range(4000)]
    for target in (0.3, 0.6, 0.85):
        base = rng.choice(4000, size=400, replace=False)
        x = int(round(400 * (1 - target) / (1 + target)))
        a = [vocab[i] for i in base]
        b = [vocab[i] for i in base[: 400 - x]] + [f"new{i}" for i in range(x)]
        true_j = len(set(a) & set(b)) / len(set(a) | set(b))
        sig_a = hashing.minhash_signature(hashing.fnv1a64(a), seeds)
        sig_b = hashing.minhash_signature(hashing.fnv1a64(b), seeds)
        est = (sig_a == sig_b).mean()
        # 128 perms -> stderr ~ sqrt(J(1-J)/128) ~ 0.043; allow 4 sigma
        assert abs(est - true_j) < 0.18, (target, true_j, est)


def test_minhash_empty_doc():
    cfg = EngineConfig()
    seeds = hashing.perm_seeds(cfg.num_perm, cfg.minhash_seed)
    sig = hashing.minhash_signature(np.empty(0, dtype=np.uint64), seeds)
    assert (sig == np.iinfo(np.uint64).max).all()


def test_simhash_similar_docs_have_small_hamming():
    cfg = EngineConfig()
    tokens = [f"w{i}" for i in range(300)]
    near = tokens[:295] + [f"n{i}" for i in range(5)]
    far = [f"f{i}" for i in range(300)]
    h = lambda toks: hashing.simhash64(hashing.fnv1a64(toks), cfg.simhash_seeds[0])
    d_near = hashing.hamming64(h(tokens), h(near))
    d_far = hashing.hamming64(h(tokens), h(far))
    assert d_near <= 15
    assert d_far > 15
    assert hashing.hamming64(h(tokens), h(tokens)) == 0


def test_batch_compute_matches_scalar_kernels():
    """The batched compute() (reduceat/unpackbits path) must agree
    bit-for-bit with the scalar reference kernels."""
    from mediaduplicatefinder_spark.functions.sigcore import shingle_set, token_seq

    cfg = EngineConfig()
    comp = SignatureComputer(cfg)
    texts = ["aaa bbb ccc ddd", "", "xyz abc qqq", "dup dup alpha beta", "ab x y"]
    out = comp.compute(texts)
    for i, t in enumerate(texts):
        th = hashing.fnv1a64(shingle_set(token_seq(t, cfg.min_token_len), cfg.shingle_k))
        expect_sig = hashing.minhash_signature(th, comp.seeds)
        assert (np.asarray(out["minhash"][i]).astype(np.int64).view(np.uint64) == expect_sig).all()
        for k, seed in enumerate(cfg.simhash_seeds):
            got = np.uint64(np.int64(out[f"simhash{k+1}"][i]))
            assert got == np.uint64(hashing.simhash64(th, seed))
        assert sorted(np.asarray(out["token_hashes"][i]).astype(np.int64).view(np.uint64)) == sorted(th)


def test_signature_computer_deterministic_across_batching():
    cfg = EngineConfig()
    texts = [f"alpha beta gamma doc{i} delta epsilon zeta" for i in range(10)]
    one = SignatureComputer(cfg).compute(texts)
    split = SignatureComputer(cfg)
    parts = [split.compute(texts[:3]), split.compute(texts[3:])]
    merged_min = parts[0]["minhash"] + parts[1]["minhash"]
    for a, b in zip(one["minhash"], merged_min):
        assert (np.asarray(a) == np.asarray(b)).all()
    assert one["simhash1"] == parts[0]["simhash1"] + parts[1]["simhash1"]
