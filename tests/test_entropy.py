"""E76 char-entropy quality scoring (functions/entropy.py)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from mediaduplicatefinder_spark.functions.entropy import (
    char_entropy,
    char_entropy_row,
    char_entropy_sql,
)

CASES = [
    (0, ""),
    (1, "aaaa"),  # single symbol: H = 0 exactly
    (2, "abab"),  # two symbols, uniform: H = 1 exactly
    (3, "the quick brown fox jumps over the lazy dog"),
    (4, "aabécéé"),  # non-ascii
    (5, "0123456789" * 13),  # uniform 10-symbol
    (6, None),
]


def test_kernel_edges():
    assert char_entropy_row("") == (0, 0, 0, 0.0, 0.0)
    assert char_entropy_row(None) == (0, 0, 0, 0.0, 0.0)
    n, d, top, frac, h = char_entropy_row("aaaa")
    assert (n, d, top, frac, h) == (4, 1, 4, 1.0, 0.0)
    n, d, top, frac, h = char_entropy_row("abab")
    assert (n, d, top) == (4, 2, 2) and frac == 0.5 and h == 1.0
    # uniform over 10 symbols -> log2(10)
    h10 = char_entropy_row("0123456789" * 13)[4]
    assert h10 == pytest.approx(math.log2(10), abs=1e-12)


def test_entropy_bounds():
    for _, t in CASES:
        if not t:
            continue
        n, d, top, frac, h = char_entropy_row(t)
        assert 0.0 <= h <= math.log2(max(d, 2)) + 1e-12
        assert top * d >= n  # pigeonhole
        assert frac == top / n


def test_duckdb_twin_bit_exact():
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {"doc_id": [i for i, _ in CASES], "text": [t for _, t in CASES]}
        ),
    )
    got = {
        r[0]: r[1:]
        for r in con.execute(char_entropy_sql()).fetchall()
    }
    for i, t in CASES:
        n, d, top, frac, h = char_entropy_row(t)
        gn, gd, gtop, gfrac, gh = got[i]
        assert (gn, gd, gtop) == (n, d, top), (i, t)
        assert gfrac == frac and gh == h, (i, t)  # BIT-exact, no approx


def test_spark_side(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in CASES], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in char_entropy(df).collect()}
    assert len(rows) == len(CASES)
    for i, t in CASES:
        n, d, top, frac, h = char_entropy_row(t)
        r = rows[i]
        assert (r.n_chars, r.n_distinct, r.top_count) == (n, d, top)
        assert r.top_frac == frac and r.char_entropy == h
