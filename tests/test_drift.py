"""E93 token-distribution drift (functions/drift.py)."""

from __future__ import annotations

import pytest

from mediaduplicatefinder_spark.functions.drift import token_drift


def _df(spark, rows):
    return spark.createDataFrame(rows, "grp string, text string")


def test_identical_snapshots_zero(spark):
    a = _df(spark, [("g", "alpha beta gamma alpha")])
    r = token_drift(a, a).collect()[0]
    assert r.drift == 0.0
    assert r.vocab_union == 3
    assert r.n_terms_a == r.n_terms_b == 4


def test_disjoint_snapshots_max(spark):
    a = _df(spark, [("g", "aa bb cc")])
    b = _df(spark, [("g", "xx yy zz")])
    r = token_drift(a, b).collect()[0]
    # disjoint support: every term contributes its own p -> D = 2
    assert r.drift == pytest.approx(2.0, abs=1e-12)
    assert r.vocab_union == 6


def test_hand_value(spark):
    # A: a,a,b  B: a,b,b -> pa = (2/3,1/3), pb = (1/3,2/3)
    # D = 2 * (1/3)^2 / 1 = 2/9
    a = _df(spark, [("g", "a a b")])
    b = _df(spark, [("g", "a b b")])
    r = token_drift(a, b).collect()[0]
    assert r.drift == pytest.approx(2 / 9, abs=1e-12)


def test_groups_and_monotone_sensitivity(spark):
    a = _df(
        spark,
        [("stable", "one two three four"), ("moved", "one two three four")],
    )
    b = _df(
        spark,
        [("stable", "one two three four"), ("moved", "one two nine ten")],
    )
    got = {r.grp: r for r in token_drift(a, b).collect()}
    assert got["stable"].drift == 0.0
    assert got["moved"].drift > 0.5  # half the mass moved
