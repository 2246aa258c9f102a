"""E171 Manku multi-table Hamming search: the table union must equal
the brute-force Hamming-ball pair relation EXACTLY (pigeonhole
completeness + popcount-verify soundness) for every (k, n_blocks)
profile, respect group boundaries, and never plan a cartesian
product."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.hammingindex import (
    _block_widths,
    hamming_complete_pairs,
)


def _corpus(seed: int, n: int = 120) -> list[tuple[str, str, int]]:
    """Random 64-bit fingerprints with planted <=k-bit perturbation
    families so the Hamming ball is well populated."""
    rng = random.Random(seed)
    rows = []
    fid = 0
    while len(rows) < n:
        base = rng.getrandbits(64)
        lang = rng.choice(["en", "de"])
        fam = rng.randint(1, 4)
        for _ in range(fam):
            h = base
            for _ in range(rng.randint(0, 5)):  # 0..5 bit flips
                h ^= 1 << rng.randrange(64)
            rows.append((f"doc{fid:05d}", lang, h - (1 << 63)))  # signed
            fid += 1
    return rows[:n]


def _brute(rows, k):
    out = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            a, b = rows[i], rows[j]
            if a[1] != b[1]:
                continue
            d = bin((a[2] ^ b[2]) & ((1 << 64) - 1)).count("1")
            if d <= k:
                p = tuple(sorted((a[0], b[0])))
                out.add((a[1], p[0], p[1], d))
    return out


@pytest.mark.parametrize(
    "k,n_blocks", [(3, 6), (3, 8), (2, 6), (1, 4), (0, 4), (4, 7)]
)
def test_equals_brute_force(spark, k, n_blocks):
    rows = _corpus(seed=k * 100 + n_blocks)
    df = spark.createDataFrame(rows, "url string, lang string, h64 long")
    got = {
        (r["lang"], r["url_a"], r["url_b"], r["hamming"])
        for r in hamming_complete_pairs(
            df, k=k, n_blocks=n_blocks
        ).collect()
    }
    assert got == _brute(rows, k)


def test_group_isolation(spark):
    # identical fingerprints in different langs never pair
    rows = [("a", "en", 7), ("b", "de", 7), ("c", "en", 7)]
    df = spark.createDataFrame(rows, "url string, lang string, h64 long")
    got = hamming_complete_pairs(df, k=3, n_blocks=6).collect()
    assert [(r["url_a"], r["url_b"]) for r in got] == [("a", "c")]


def test_uneven_block_widths_cover_all_bits(spark):
    # 64 not divisible by 7: widths must sum to 64 and stay contiguous
    assert sum(_block_widths(64, 7)) == 64
    rows = _corpus(seed=9, n=80)
    df = spark.createDataFrame(rows, "url string, lang string, h64 long")
    got = {
        (r["url_a"], r["url_b"])
        for r in hamming_complete_pairs(df, k=3, n_blocks=7).collect()
    }
    assert got == {(a, b) for (_, a, b, _) in _brute(rows, 3)}


def test_parameter_validation(spark):
    df = spark.createDataFrame(
        [("a", "en", 1)], "url string, lang string, h64 long"
    )
    with pytest.raises(ValueError):
        hamming_complete_pairs(df, k=6, n_blocks=6)
    with pytest.raises(ValueError):
        hamming_complete_pairs(df, k=-1, n_blocks=4)
    # k=0 with one block degenerates to the exact-equality join — legal
    assert hamming_complete_pairs(df, k=0, n_blocks=1).count() == 0


def test_plan_is_single_equi_join_no_cartesian(spark):
    rows = _corpus(seed=1, n=40)
    df = spark.createDataFrame(rows, "url string, lang string, h64 long")
    plan = (
        hamming_complete_pairs(df, k=3, n_blocks=6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
