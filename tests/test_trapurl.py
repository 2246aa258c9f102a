"""E100 spider-trap url scoring (functions/trapurl.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.trapurl import (
    TRAP_THRESHOLD,
    trap_url_scores,
)


def _run(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return {r.url: r for r in trap_url_scores(df).collect()}


def test_signal_matrix(spark):
    got = _run(
        spark,
        [
            "http://h/a/b/p1",  # clean
            "http://h/cal/2026/cal/2026/cal/p",  # repeated segments
            "http://h/d1/d2/d3/d4/d5/d6/d7/p",  # deep
            "http://h/a/p?phpsessid=tok&x=1",  # session param
            "http://h/a/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7",  # param bloat
            "http://h/long/" + "x" * 130 + "/p",  # oversized path
        ],
    )
    clean = got["http://h/a/b/p1"]
    assert (clean.trap_score, clean.is_trap) == (0, False)
    cal = got["http://h/cal/2026/cal/2026/cal/p"]
    # segs: cal x3 + 2026 x2 + p -> dup_segs = 6-3 = 3 -> score 9
    assert (cal.dup_segs, cal.trap_score, cal.is_trap) == (3, 9, True)
    deep = got["http://h/d1/d2/d3/d4/d5/d6/d7/p"]
    assert (deep.depth, deep.trap_score) == (8, 4)
    assert not deep.is_trap  # depth alone stays under threshold
    sess = got["http://h/a/p?phpsessid=tok&x=1"]
    assert (sess.n_session, sess.n_params, sess.trap_score) == (1, 2, 4)
    bloat = got["http://h/a/p?a=1&b=2&c=3&d=4&e=5&f=6&g=7"]
    assert (bloat.n_params, bloat.trap_score) == (7, 2)
    long_path = got["http://h/long/" + "x" * 130 + "/p"]
    assert long_path.trap_score == 2


def test_compound_signals_cross_threshold(spark):
    # session id + repeated segment together clear the gate
    u = "http://h/a/a/p?sid=1"
    r = _run(spark, [u])[u]
    assert r.trap_score == 3 + 4
    assert r.is_trap
    assert r.trap_score >= TRAP_THRESHOLD


def test_parse_edges(spark):
    got = _run(
        spark,
        [
            "http://h",  # no path at all
            "http://h/?SID=9",  # param name match is case-insensitive
            "http://h/p#frag?notquery=1",  # fragment is not a query
        ],
    )
    root = got["http://h"]
    assert (root.host, root.depth, root.trap_score) == ("h", 0, 0)
    sid = got["http://h/?SID=9"]
    assert (sid.n_session, sid.is_trap) == (1, False)
    frag = got["http://h/p#frag?notquery=1"]
    assert frag.n_params == 0
