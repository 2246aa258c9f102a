"""Vectorized 64-bit hashing kernels (numpy, no per-row Python loops).

Shared by the Spark signature UDFs (operators/signatures.py) and the
pure-Python oracle (oracle/signatures.py) so engine and oracle agree on
every bit by construction — the determinism requirement behind the
cluster-size-invariance check (SURVEY.md §4.3 item 3).

Design notes
------------
- Base hash: FNV-1a 64 computed column-wise over a zero-padded byte
  matrix (``np.array(tokens, dtype='S')`` pads with NULs for free); a
  per-position mask keeps padding out of the state update, so the hash
  equals the canonical byte-loop FNV-1a for every token.
- Seeded remix: splitmix64 finalizer over ``base ^ seed`` — cheap,
  well-mixed, fully vectorized. One remix per MinHash permutation /
  SimHash seed.
- MinHash: ``num_perm`` universal-hash permutations h_i(x) =
  splitmix64(x ^ seed_i); signature = column-wise min.
- SimHash: sign-sum of the 64 bits of each token hash (weight 1 per
  distinct token, mirroring the reference's *set* semantics for text,
  main_cli.cpp:272-283); two seeds give the independent fingerprint
  pair that plays the aHash/dHash roles (main_cli.cpp:161-209).
"""

from __future__ import annotations

import sys

import numpy as np

# the batched SimHash path views uint64 as little-endian bytes; big-endian
# hosts would silently permute bits
assert sys.byteorder == "little", "hashing kernels assume little-endian"

FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)

_SPLITMIX_1 = np.uint64(0x9E3779B97F4A7C15)
_SPLITMIX_2 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_3 = np.uint64(0x94D049BB133111EB)


def fnv1a64(tokens: list[str] | np.ndarray) -> np.ndarray:
    """FNV-1a 64-bit of each (ASCII) token, vectorized.

    Tokens are ASCII by construction (normalization strips every
    non-[a-zA-Z0-9] char before hashing); non-ASCII input raises.
    """
    if len(tokens) == 0:
        return np.empty(0, dtype=np.uint64)
    arr = np.asarray(tokens, dtype="S")  # zero-padded fixed-width bytes
    width = arr.dtype.itemsize
    mat = arr.view(np.uint8).reshape(len(arr), width)
    lengths = (mat != 0).cumprod(axis=1).sum(axis=1)  # position of first NUL
    h = np.full(len(arr), FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(width):
            active = lengths > j
            if not active.any():
                break
            hj = (h ^ mat[:, j].astype(np.uint64)) * FNV_PRIME
            h = np.where(active, hj, h)
    return h


def splitmix64(x: np.ndarray | np.uint64) -> np.ndarray:
    """splitmix64 finalizer (public-domain construction, Steele et al.)."""
    z = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        z = (z + _SPLITMIX_1) if z.ndim == 0 else z + _SPLITMIX_1
        z = (z ^ (z >> np.uint64(30))) * _SPLITMIX_2
        z = (z ^ (z >> np.uint64(27))) * _SPLITMIX_3
        z = z ^ (z >> np.uint64(31))
    return z


def perm_seeds(num_perm: int, seed: int) -> np.ndarray:
    """Deterministic per-permutation seeds: splitmix64 stream from `seed`."""
    idx = np.arange(1, num_perm + 1, dtype=np.uint64)
    return splitmix64(np.uint64(seed) ^ (idx * _SPLITMIX_1))


def minhash_signature(token_hashes: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """MinHash signature (len(seeds),) uint64; empty doc -> all UINT64_MAX."""
    if token_hashes.size == 0:
        return np.full(len(seeds), np.iinfo(np.uint64).max, dtype=np.uint64)
    # (num_perm, n_tokens) remix then min over tokens
    mixed = splitmix64(token_hashes[None, :] ^ seeds[:, None])
    return mixed.min(axis=1)


def simhash64(token_hashes: np.ndarray, seed: int) -> int:
    """64-bit SimHash with +/-1 weights over distinct-token hashes."""
    if token_hashes.size == 0:
        return 0
    mixed = splitmix64(token_hashes ^ np.uint64(seed))
    bits = ((mixed[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    sums = bits.sum(axis=0) * 2 - token_hashes.size  # (+1/-1 vote per token)
    out = np.uint64(0)
    fp = (sums > 0).astype(np.uint64)
    return int((fp << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))


def simhash64_batch(list_of_token_hashes: list[np.ndarray], seed: int) -> np.ndarray:
    """SimHash for many docs; simple loop over docs, vectorized per doc."""
    return np.array(
        [simhash64(th, seed) for th in list_of_token_hashes], dtype=np.uint64
    )


def to_int64(u: np.ndarray) -> np.ndarray:
    """Reinterpret uint64 as int64 for Spark LongType columns."""
    return u.view(np.int64) if isinstance(u, np.ndarray) else np.int64(np.uint64(u))


def hamming64(a: int, b: int) -> int:
    """Popcount of XOR on 64-bit values given as (possibly negative) ints."""
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def fold32(h64: np.ndarray | list) -> list[int]:
    """Sorted xor-fold of 64-bit token hashes to signed int32 — the
    verify-stage Jaccard representation (half the shuffle bytes of the
    int64 set; see operators/signatures.py for the collision budget).
    Input may be int64-signed or uint64; output is SORTED in int32
    space (the verify merge binary-searches the stored order)."""
    a = np.asarray(h64)
    u = a.view(np.uint64) if a.dtype == np.int64 else a.astype(np.uint64)
    folded = (u ^ (u >> np.uint64(32))).astype(np.uint32).view(np.int32)
    return np.unique(folded).tolist()
