"""E154 dup evidence: position variant vs a brute-force python
reference, value-set agreement with the established winnow set, the
SIGMOD'03 guarantee (a shared substring >= w+k-1 yields shared
fingerprints whose spans cover it), the no-overlap sentinel, and
partition invariance."""

from __future__ import annotations

import pytest

from mediaduplicatefinder_spark.functions.winnow import (
    K_GRAM,
    WINDOW,
    normalize_for_winnow,
    winnow_fingerprint_positions,
    winnow_fingerprints,
    with_winnow_positions,
)
from mediaduplicatefinder_spark.operators.evidence import dup_evidence


def _brute_positions(s: str, k: int, w: int) -> set[tuple[int, int]]:
    """Independent reference: hash every k-gram, pick each window's
    rightmost minimum, return distinct (hash, 1-based pos)."""
    import numpy as np

    from mediaduplicatefinder_spark.functions.winnow import _kgram_hashes

    h = [int(np.int64(x)) for x in _kgram_hashes(s, k)]
    if not h:
        return set()
    if len(h) <= w:
        best = min(range(len(h)), key=lambda i: (h[i], -i))
        return {(h[best], best + 1)}
    out = set()
    for i in range(len(h) - w + 1):
        win = h[i : i + w]
        j = max(
            (jj for jj in range(w) if win[jj] == min(win)),
        )
        out.add((win[j], i + j + 1))
    return out


@pytest.mark.parametrize(
    "text",
    [
        "the quick brown fox jumps over the lazy dog repeatedly today",
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",  # all-tie hashes
        "short",
        "",
        "abcdefgh",  # exactly one k-gram
    ],
)
def test_positions_match_reference(text):
    s = normalize_for_winnow(text)
    got = set(winnow_fingerprint_positions(s, K_GRAM, WINDOW))
    assert got == _brute_positions(s, K_GRAM, WINDOW)
    # value projection must equal the established winnow value set
    assert {v for v, _ in got} == set(
        int(x) for x in winnow_fingerprints(s, K_GRAM, WINDOW)
    )


def test_shared_substring_guarantee(spark):
    """Two docs sharing a >= w+k-1 run of normalized text must share a
    fingerprint, and the reported spans must cover the shared run."""
    shared = "x".join("commonblock" for _ in range(8))  # ~95 chars
    a_text = "prefix alpha " + shared + " tail one"
    b_text = "totally different opening words here " + shared + " zz"
    docs = spark.createDataFrame(
        [("a", a_text), ("b", b_text)], "url string, text string"
    )
    pairs = spark.createDataFrame([("a", "b")], "url_a string, url_b string")
    fp = with_winnow_positions(docs)
    row = dup_evidence(pairs, fp).collect()[0]
    assert row["n_shared_fps"] >= 1
    na, nb = normalize_for_winnow(a_text), normalize_for_winnow(b_text)
    sh = normalize_for_winnow(shared)
    a_lo, b_lo = na.index(sh) + 1, nb.index(sh) + 1
    assert a_lo <= row["a_start"] <= row["a_end"] <= a_lo + len(sh)
    assert b_lo <= row["b_start"] <= row["b_end"] <= b_lo + len(sh)


def test_no_overlap_sentinel(spark):
    docs = spark.createDataFrame(
        [("a", "entirely unrelated first document body text"),
         ("b", "zzz qqq completely disjoint content 12345 here")],
        "url string, text string",
    )
    pairs = spark.createDataFrame([("a", "b")], "url_a string, url_b string")
    row = dup_evidence(pairs, with_winnow_positions(docs)).collect()[0]
    assert row["n_shared_fps"] == 0
    assert (row["a_start"], row["a_end"], row["b_start"], row["b_end"]) == (
        -1, -1, -1, -1,
    )


def test_partition_invariance(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", f"body {'shared segment of text ' * 4} v{i % 3}")
         for i in range(12)],
        "url string, text string",
    )
    pairs = spark.createDataFrame(
        [(f"d{i}", f"d{j}") for i in range(12) for j in range(i + 1, 12)],
        "url_a string, url_b string",
    )
    fp = with_winnow_positions(docs)
    a = dup_evidence(pairs, fp).collect()
    b = dup_evidence(
        pairs.repartition(7), with_winnow_positions(docs.repartition(5))
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
