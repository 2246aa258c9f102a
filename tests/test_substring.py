"""Tests for the exact long-match substring stage
(operators/substring.py): suffix-automaton LCS correctness, the
winnowing recall guarantee, and the end-to-end operator."""

from __future__ import annotations

import numpy as np
import pytest

from mediaduplicatefinder_spark.functions import winnow
from mediaduplicatefinder_spark.operators.substring import (
    _lcs_length,
    long_match_pairs,
)


# ------------------------------------------------------------- LCS unit


def _lcs_brute(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(i + best + 1, len(a) + 1):
            if a[i:j] in b:
                best = j - i
            else:
                break
    return best


@pytest.mark.parametrize(
    "a,b,expect",
    [
        ("", "", 0),
        ("abc", "", 0),
        ("abc", "abc", 3),
        ("xabcy", "zabcw", 3),
        ("aaaa", "aa", 2),
        ("abcdef", "defabc", 3),
        ("banana", "ananas", 5),
    ],
)
def test_lcs_known_cases(a, b, expect):
    assert _lcs_length(a, b) == expect


def test_lcs_matches_bruteforce_random():
    rng = np.random.RandomState(0)
    alphabet = "abcd"
    for _ in range(50):
        a = "".join(rng.choice(list(alphabet), size=rng.randint(0, 40)))
        b = "".join(rng.choice(list(alphabet), size=rng.randint(0, 40)))
        assert _lcs_length(a, b) == _lcs_brute(a, b), (a, b)


def test_lcs_symmetry():
    rng = np.random.RandomState(1)
    for _ in range(20):
        a = "".join(rng.choice(list("xyz"), size=30))
        b = "".join(rng.choice(list("xyz"), size=45))
        assert _lcs_length(a, b) == _lcs_length(b, a)


# ------------------------------------------------- winnowing guarantee


def test_winnow_guarantee_threshold():
    """Any shared substring of length >= w + k - 1 must produce a shared
    fingerprint (the winnowing theorem) — exercised over random planted
    substrings."""
    rng = np.random.RandomState(2)
    k, w = winnow.K_GRAM, winnow.WINDOW
    need = w + k - 1
    for trial in range(20):
        shared = "".join(rng.choice(list("abcdefgh"), size=need))
        pre_a = "".join(rng.choice(list("mnopqrst"), size=rng.randint(0, 30)))
        pre_b = "".join(rng.choice(list("uvwxyz01"), size=rng.randint(0, 30)))
        fa = set(winnow.winnow_fingerprints(pre_a + shared, k, w).tolist())
        fb = set(winnow.winnow_fingerprints(pre_b + shared, k, w).tolist())
        assert fa & fb, f"trial {trial}: no shared fingerprint"


# ------------------------------------------------------------ operator


def test_long_match_pairs_end_to_end(spark):
    rng = np.random.RandomState(3)
    shared = "".join(rng.choice(list("abcdefghij"), size=60))
    rows = [
        ("u://a1", "XX " + shared + " tail one"),
        ("u://a2", "totally different prefix " + shared),
        ("u://b1", "".join(rng.choice(list("klmnopqrst"), size=120))),
        ("u://b2", "".join(rng.choice(list("klmnopqrst"), size=120))),
    ]
    docs = spark.createDataFrame(rows, "url string, text string")
    got = {(r.url_a, r.url_b): r.lcs_len for r in long_match_pairs(docs).collect()}
    assert ("u://a1", "u://a2") in got
    # normalization strips spaces, so the match spans at least the
    # planted block
    assert got[("u://a1", "u://a2")] >= 60
    for pair in got:
        assert not ("u://b1" in pair and "u://b2" in pair)


def test_long_match_partition_invariance(spark, tiny_pages_df):
    docs = tiny_pages_df.select("url", "text").limit(60)
    a = sorted(
        (r.url_a, r.url_b, r.lcs_len)
        for r in long_match_pairs(docs.repartition(1)).collect()
    )
    b = sorted(
        (r.url_a, r.url_b, r.lcs_len)
        for r in long_match_pairs(docs.repartition(5)).collect()
    )
    assert a == b
    assert len(a) > 0  # the synthetic corpus plants exact/near dup classes
