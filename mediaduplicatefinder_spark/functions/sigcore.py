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
        """Per-doc: minhash signature (int64 list), band hashes (int64
        list, one per band), simhash pair (int64), n_tokens."""
        cfg = self.cfg
        minhashes: list[np.ndarray] = []
        band_hashes: list[np.ndarray] = []
        sim1: list[int] = []
        sim2: list[int] = []
        n_tokens: list[int] = []
        r, b = cfg.minhash_rows, cfg.minhash_bands
        for text in texts:
            toks = token_seq(text or "", cfg.min_token_len)
            shingles = shingle_set(toks, cfg.shingle_k)
            th = hashing.fnv1a64(shingles)
            sig = hashing.minhash_signature(th, self.seeds)
            minhashes.append(hashing.to_int64(sig))
            # band hash: splitmix-combine the r rows of each band + band idx
            rows = sig.reshape(b, r)
            acc = hashing.splitmix64(np.arange(b, dtype=np.uint64))
            for i in range(r):
                acc = hashing.splitmix64(acc ^ rows[:, i])
            band_hashes.append(hashing.to_int64(acc))
            sim1.append(int(hashing.to_int64(np.uint64(hashing.simhash64(th, cfg.simhash_seeds[0])))))
            sim2.append(int(hashing.to_int64(np.uint64(hashing.simhash64(th, cfg.simhash_seeds[1])))))
            n_tokens.append(len(shingles))
        return {
            "minhash": minhashes,
            "band_hashes": band_hashes,
            "simhash1": sim1,
            "simhash2": sim2,
            "n_shingles": n_tokens,
        }
