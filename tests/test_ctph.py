"""E187 CTPH: digest mechanics (locality — an early edit changes few
chars; block-size ladder; truncation), the common-substring gate,
scoring behavior on planted near-dups, and partition invariance."""

from __future__ import annotations

import random

import pytest

from mediaduplicatefinder_spark.operators.ctph import (
    DIGEST_LEN,
    block_size,
    ctph_digest,
    ctph_pairs,
)


def _docs(spark, rows, parts=3):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).repartition(parts)


def _long_text(seed, n_words=600):
    rng = random.Random(seed)
    return " ".join(
        f"w{rng.randrange(4000):04d}" for _ in range(n_words)
    )


def test_block_size_ladder():
    assert block_size(1) == 3
    assert block_size(192) == 3
    assert block_size(193) == 6
    assert block_size(64 * 48) == 48
    assert block_size(64 * 48 + 1) == 96


def test_digest_deterministic_and_bounded():
    t = _long_text(1)
    b, d1, d2 = ctph_digest(t)
    assert (b, d1, d2) == ctph_digest(t)
    assert 1 <= len(d1) <= DIGEST_LEN and 1 <= len(d2) <= DIGEST_LEN
    assert ctph_digest("") is None
    assert ctph_digest("!!! ???") is None  # nothing survives normalize


def test_locality_of_edits():
    # appending text changes only the TAIL of the digest: the shared
    # prefix blocks keep their boundaries and characters (the CTPH
    # point, vs a monolithic hash)
    base = _long_text(2)
    b1, d1, _ = ctph_digest(base)
    b2, d1b, _ = ctph_digest(base + " zzz appended tail content here")
    if b1 == b2:  # same block scale -> comparable digests
        shared = 0
        for x, y in zip(d1, d1b):
            if x != y:
                break
            shared += 1
        assert shared >= max(1, len(d1) - 2)


def test_near_dup_pair_scores_high(spark):
    base = _long_text(3)
    rows = [
        (1, "en", base),
        (2, "en", base + " tiny appended suffix"),
        (3, "en", _long_text(99)),  # unrelated
        (4, "de", base),  # cross-lang never pairs
    ]
    out = ctph_pairs(_docs(spark, rows)).collect()
    got = {(r["doc_a"], r["doc_b"]): r for r in out}
    assert (1, 2) in got
    assert got[(1, 2)]["sim"] >= 80
    assert all(4 not in p for p in got)
    assert all(
        not ((a, b) == (1, 3) or (a, b) == (2, 3)) or got[(a, b)]["sim"] < 50
        for (a, b) in got
    )


def test_exact_dup_perfect_score(spark):
    base = _long_text(5)
    rows = [(1, "en", base), (2, "en", base)]
    out = ctph_pairs(_docs(spark, rows)).collect()
    per = {r["beff"]: r for r in out}
    assert per, "identical docs must pair"
    for r in per.values():
        assert r["dist"] == 0 and r["sim"] == 100


def test_short_digests_never_pair(spark):
    # < 7 digest chars -> no 7-gram -> no candidate (ssdeep's own gate)
    rows = [(1, "en", "alpha beta"), (2, "en", "alpha beta")]
    out = ctph_pairs(_docs(spark, rows)).collect()
    assert out == []


def test_partition_invariance(spark):
    base = _long_text(7)
    rows = [
        (1, "en", base),
        (2, "en", base + " drift"),
        (3, "en", base.replace("w0", "q9")),
        (4, "en", _long_text(8)),
    ]
    a = sorted(map(tuple, ctph_pairs(_docs(spark, rows, 1)).collect()))
    b = sorted(map(tuple, ctph_pairs(_docs(spark, rows, 5)).collect()))
    assert a == b
