"""Winnowing document fingerprints (rolling hash + window minima).

Local fingerprinting per Schleimer/Wilkerson/Aiken, "Winnowing: Local
Algorithms for Document Fingerprinting" (SIGMOD 2003, public): hash
every k-gram of the normalized text with a polynomial rolling hash,
slide a window of w consecutive k-gram hashes, record the minimum of
each window (rightmost occurrence on ties). The selected hash set is a
position-robust fingerprint: any shared substring of length >= w+k-1
contributes at least one common fingerprint — the cheap stand-in for
the optional suffix-array long-match stage (SURVEY.md §7 step 9).

Everything is numpy over Arrow batches (sliding_window_view — no
per-character Python), exposed as a mapInPandas-ready function plus a
pure-python oracle for tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

K_GRAM = 8
WINDOW = 16
_BASE = np.uint64(1_000_003)
_MASK = np.uint64((1 << 61) - 1)  # keep hashes positive in int64


def _kgram_hashes(s: str, k: int = K_GRAM) -> np.ndarray:
    """Polynomial hashes of every k-gram: h(i) = sum c[i+j] * B^(k-1-j)
    (wrapping uint64 arithmetic, masked to 61 bits)."""
    codes = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(codes) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    powers = np.empty(k, dtype=np.uint64)
    powers[-1] = 1
    with np.errstate(over="ignore"):  # mod-2^64 wrap is the hash design
        for j in range(k - 2, -1, -1):
            powers[j] = powers[j + 1] * _BASE
        windows = np.lib.stride_tricks.sliding_window_view(codes, k)
        return ((windows * powers).sum(axis=1)) & _MASK


def winnow_fingerprints(s: str, k: int = K_GRAM, w: int = WINDOW) -> np.ndarray:
    """Sorted distinct window-min hashes (rightmost-min rule)."""
    h = _kgram_hashes(s, k)
    if len(h) == 0:
        return np.empty(0, dtype=np.int64)
    if len(h) <= w:
        i = len(h) - 1 - int(np.argmin(h[::-1]))  # rightmost min, one window
        return h[i : i + 1].astype(np.int64)
    wins = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost minimum: argmin over the reversed window
    rev_arg = np.argmin(wins[:, ::-1], axis=1)
    idx = np.arange(len(wins)) + (w - 1 - rev_arg)
    return np.unique(h[idx]).astype(np.int64)


def winnow_fingerprint_positions(
    s: str, k: int = K_GRAM, w: int = WINDOW
) -> list[tuple[int, int]]:
    """Distinct SELECTED (hash, pos) pairs, pos = 1-based k-gram start
    in the normalized text (the SQL twin's substr coordinate). Same
    rightmost-min selection as ``winnow_fingerprints``, but keeping
    WHERE each selected hash sits — the evidence-localization variant
    (E154): a hash value repeating at several selected positions keeps
    them all."""
    h = _kgram_hashes(s, k)
    if len(h) == 0:
        return []
    if len(h) <= w:
        i = len(h) - 1 - int(np.argmin(h[::-1]))
        return [(int(np.int64(h[i])), i + 1)]
    wins = np.lib.stride_tricks.sliding_window_view(h, w)
    rev_arg = np.argmin(wins[:, ::-1], axis=1)
    idx = np.unique(np.arange(len(wins)) + (w - 1 - rev_arg))
    return [(int(np.int64(h[i])), int(i) + 1) for i in idx]


def with_winnow_positions(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    k: int = K_GRAM,
    w: int = WINDOW,
) -> DataFrame:
    """docs -> exploded (id, fingerprint long, pos long) rows of the
    selected (hash, position) pairs over the NORMALIZED text."""
    schema = f"{id_col} string, fingerprint long, pos long"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            fps: list[int] = []
            ps: list[int] = []
            for u, t in zip(pdf[id_col], pdf[text_col]):
                for fp, p in winnow_fingerprint_positions(
                    normalize_for_winnow(t or ""), k, w
                ):
                    ids.append(u)
                    fps.append(fp)
                    ps.append(p)
            yield pd.DataFrame(
                {id_col: ids, "fingerprint": fps, "pos": ps}
            )

    return docs.select(id_col, text_col).mapInPandas(fn, schema=schema)


def normalize_for_winnow(s: str) -> str:
    """Lowercase, strip non-alnum (P5-style normalization,
    main_cli.cpp:277-279) so formatting changes don't shift k-grams."""
    return "".join(c for c in s.lower() if c.isalnum())


def with_winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
    k: int = K_GRAM,
    w: int = WINDOW,
) -> DataFrame:
    """docs -> (id, fingerprints array<long>, n_fingerprints int)."""
    schema = f"{id_col} string, fingerprints array<long>, n_fingerprints int"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = [
                winnow_fingerprints(normalize_for_winnow(t or ""), k, w)
                for t in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "fingerprints": [f.tolist() for f in fps],
                    "n_fingerprints": [len(f) for f in fps],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(fn, schema=schema)
