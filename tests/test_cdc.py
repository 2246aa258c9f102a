"""E74 content-defined chunking: layout invariants, the shift-
robustness property that distinguishes CDC from fixed windows, and the
Spark stats path vs a python replay."""

from __future__ import annotations

import numpy as np
import pytest

from mediaduplicatefinder_spark.functions.winnow import normalize_for_winnow
from mediaduplicatefinder_spark.operators.cdc import (
    MAX_SIZE,
    MIN_SIZE,
    cdc_dedup_stats,
    chunk_offsets,
)


def _rand_text(n, seed):
    rng = np.random.RandomState(seed)
    return "".join(rng.choice(list("abcdefghij"), size=n))


def test_layout_tiles_and_respects_bounds():
    s = _rand_text(5000, 1)
    offs = chunk_offsets(s)
    assert offs[0][0] == 1
    assert sum(l for _, l in offs) == len(s)
    pos = 1
    for cs, cl in offs:
        assert cs == pos
        pos += cl
    # every chunk except possibly the last respects [MIN, MAX]
    for cs, cl in offs[:-1]:
        assert MIN_SIZE <= cl <= MAX_SIZE
    assert offs[-1][1] <= MAX_SIZE


def test_short_and_empty():
    assert chunk_offsets("") == []
    assert chunk_offsets("abc") == [(1, 3)]  # below the hash window
    s = _rand_text(40, 2)
    offs = chunk_offsets(s)
    assert sum(l for _, l in offs) == 40


def test_shift_robustness():
    """The CDC property: prepending a prefix re-aligns after a bounded
    distance — the tail chunk CONTENTS reappear identically (a fixed-
    window chunker would shift every boundary)."""
    s = _rand_text(4000, 3)
    shifted = _rand_text(137, 4) + s
    chunks = {s[cs - 1 : cs - 1 + cl] for cs, cl in chunk_offsets(s)}
    chunks_shifted = {
        shifted[cs - 1 : cs - 1 + cl] for cs, cl in chunk_offsets(shifted)
    }
    common = chunks & chunks_shifted
    # the vast majority of original chunks survive the prefix insertion
    assert len(common) >= 0.8 * len(chunks)


def test_spark_stats_match_python_replay(spark):
    texts = {
        1: "The quick brown fox! " * 20,
        2: "the QUICK brown fox? " * 20,  # same normalized content as 1
        3: _rand_text(900, 5),
        4: "",
        5: "xy",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_chunks"],
            r["n_dup_chunks"],
            r["bytes_total"],
            r["bytes_dup"],
            r["dedup_ratio"],
        )
        for r in cdc_dedup_stats(df).collect()
    }
    # python replay with string-identity chunks
    from collections import Counter, defaultdict

    doc_chunks = {}
    for d, t in texts.items():
        s = normalize_for_winnow(t)
        doc_chunks[d] = [(s[cs - 1 : cs - 1 + cl], cl) for cs, cl in chunk_offsets(s)]
    freq = defaultdict(set)
    for d, cks in doc_chunks.items():
        for ck, _ in cks:
            freq[ck].add(d)
    for d, cks in doc_chunks.items():
        n = len(cks)
        nd = sum(1 for ck, _ in cks if len(freq[ck]) >= 2)
        bt = sum(cl for _, cl in cks)
        bd = sum(cl for ck, cl in cks if len(freq[ck]) >= 2)
        ratio = round(bd / bt, 6) if bt else 0.0
        assert got[d] == (n, nd, bt, bd, ratio), (d, got[d], (n, nd, bt, bd))
    # docs 1 and 2 are byte-identical after normalization: fully dup
    assert got[1][4] == 1.0 and got[2][4] == 1.0
    # empty/short docs: zero or self-only chunks, never dup
    assert got[4] == (0, 0, 0, 0, 0.0)
    assert got[5][1] == 0
