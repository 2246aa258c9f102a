"""Signature computation core — shared verbatim by the Spark mapInPandas
UDF (operators/signatures.py) and the oracle (oracle/signatures.py), so
engine and oracle signatures agree bit-for-bit and results are invariant
to partitioning / cluster size (north_rule determinism requirement).

Token semantics == oracle.textsim.extract_words == functions.text.tokens_expr
(main_cli.cpp:272-283). Corpus is normalized ASCII; all three tokenizers
provably coincide on ASCII input (see tests/test_tokens_parity.py).
"""

from __future__ import annotations

import re

import numpy as np

from mediaduplicatefinder_spark.config import EngineConfig
from mediaduplicatefinder_spark.functions import hashing

_NON_ALNUM_WS = re.compile(r"[^a-zA-Z0-9 \t\n\r\f\v]")
_WS = re.compile(r"\s+")


def token_seq(text: str, min_len: int = 3) -> list[str]:
    """Kept tokens in document order, duplicates preserved (shingling
    input). Normalization identical to tokens_expr/extract_words."""
    cleaned = _NON_ALNUM_WS.sub("", text.lower())
    return [t for t in _WS.split(cleaned) if len(t) >= min_len]


def shingle_set(tokens: list[str], k: int) -> list[str]:
    """Distinct k-token shingles ('_'-joined); k=1 -> distinct tokens,
    which makes MinHash estimate exactly the reference's token-set
    Jaccard (main_cli.cpp:285-294) — the parity profile default."""
    if k <= 1:
        return list(dict.fromkeys(tokens))
    if len(tokens) < k:
        return ["_".join(tokens)] if tokens else []
    seen = dict.fromkeys("_".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1))
    return list(seen)


class SignatureComputer:
    """Precomputes permutation seeds once; call per Arrow batch."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.seeds = hashing.perm_seeds(cfg.num_perm, cfg.minhash_seed)

    def compute(self, texts: list[str]) -> dict[str, list]:
        """Per-doc: sorted shingle-hash set (int64, the verify-stage
        Jaccard input), minhash signature, per-band hashes, simhash pair,
        shingle count.

        Batch-vectorized: all shingles of the Arrow batch are hashed as
        ONE numpy array; MinHash runs one vectorized pass per permutation
        with ``np.minimum.reduceat`` over doc boundaries; SimHash bit
        sums use ``np.unpackbits`` + ``np.add.reduceat``. The only
        per-doc Python is regex tokenization. Results are bit-identical
        regardless of batching (tested), so signatures stay
        partition-count-invariant.
        """
        cfg = self.cfg
        n_docs = len(texts)
        shingle_lists = [
            shingle_set(token_seq(t or "", cfg.min_token_len), cfg.shingle_k)
            for t in texts
        ]
        lens = np.array([len(s) for s in shingle_lists], dtype=np.int64)
        flat_tokens: list[str] = [s for lst in shingle_lists for s in lst]
        flat = hashing.fnv1a64(flat_tokens)
        offsets = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        nonempty = lens > 0
        # reduceat mishandles zero-length segments: compute over the
        # nonempty docs only, scatter back after
        ne_offsets = offsets[nonempty]
        ne_count = int(nonempty.sum())

        # ---- MinHash: one vectorized remix + segmented min per perm ----
        sig = np.full((n_docs, cfg.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        if ne_count:
            for i, seed in enumerate(self.seeds):
                mixed = hashing.splitmix64(flat ^ seed)
                sig[nonempty, i] = np.minimum.reduceat(mixed, ne_offsets)

        # ---- band hashes: splitmix-combine the r rows of each band ----
        b, r = cfg.minhash_bands, cfg.minhash_rows
        rows = sig.reshape(n_docs, b, r)
        acc = np.broadcast_to(
            hashing.splitmix64(np.arange(b, dtype=np.uint64)), (n_docs, b)
        ).copy()
        for i in range(r):
            acc = hashing.splitmix64(acc ^ rows[:, :, i])

        # ---- SimHash x2: unpack bits, segmented sums, majority vote ----
        sims = []
        for seed in cfg.simhash_seeds:
            out = np.zeros(n_docs, dtype=np.uint64)
            if ne_count:
                mixed = hashing.splitmix64(flat ^ np.uint64(seed))
                bits = np.unpackbits(
                    mixed.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
                ).astype(np.int32)
                sums = np.add.reduceat(bits, ne_offsets, axis=0)  # (ne, 64)
                votes = sums * 2 - lens[nonempty][:, None]
                fp = (votes > 0).astype(np.uint64)
                weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
                out[nonempty] = (fp * weights).sum(axis=1, dtype=np.uint64)
            sims.append(hashing.to_int64(out))

        # sort in SIGNED space: the verify-stage merge binary-searches the
        # int64 column, so the stored order must be int64 order
        flat_i64 = hashing.to_int64(flat)
        token_hashes = [
            np.sort(flat_i64[o : o + l]) for o, l in zip(offsets, lens)
        ]
        return {
            "token_hashes": token_hashes,
            "minhash": [hashing.to_int64(s) for s in sig],
            "band_hashes": [hashing.to_int64(a) for a in acc],
            "simhash1": [int(x) for x in sims[0]],
            "simhash2": [int(x) for x in sims[1]],
            "n_shingles": [int(x) for x in lens],
        }
