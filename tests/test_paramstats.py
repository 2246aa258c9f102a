"""E126 query-param value-cardinality classification (operators/paramstats.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.paramstats import (
    param_value_stats,
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "host string, url string")
    return {
        (r.host, r.param): r for r in param_value_stats(df, **kw).collect()
    }


def test_session_constant_and_mid_cardinality(spark):
    rows = [
        ("h", f"http://h/p?sid=tok{i}&page={i % 2}&v=1") for i in range(10)
    ]
    got = _run(spark, rows)
    sid = got[("h", "sid")]
    assert (sid.n_urls, sid.n_values) == (10, 10)
    assert sid.session_like and not sid.constant_like
    v = got[("h", "v")]
    assert v.constant_like and not v.session_like
    page = got[("h", "page")]
    assert not page.session_like and not page.constant_like


def test_min_n_gate(spark):
    rows = [("h", f"http://h/p?tok={i}") for i in range(4)]
    got = _run(spark, rows)  # 4 < min_n 5
    r = got[("h", "tok")]
    assert not r.session_like and not r.constant_like
    got2 = _run(spark, rows, min_n=4)
    assert got2[("h", "tok")].session_like


def test_ninety_percent_boundary(spark):
    # 10 occurrences, 9 distinct values -> 90 >= 90 -> session_like
    rows = [("h", f"http://h/p?x={min(i, 8)}") for i in range(10)]
    got = _run(spark, rows)
    assert got[("h", "x")].n_values == 9
    assert got[("h", "x")].session_like
    # 8 distinct of 10 -> 80 < 90 -> not
    rows2 = [("h", f"http://h/p?y={min(i, 7)}") for i in range(10)]
    assert not _run(spark, rows2)[("h", "y")].session_like


def test_per_host_scoping_and_valueless_param(spark):
    rows = [("a", f"http://a/p?k={i}") for i in range(5)] + [
        ("b", "http://b/p?k=0")
    ] * 5
    got = _run(spark, rows)
    assert got[("a", "k")].session_like
    assert got[("b", "k")].constant_like
