"""E112 cross-host mirror detection (operators/mirrors.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.mirrors import mirror_host_pairs


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "host string, doc_id long, text string")
    return {
        (r.host_a, r.host_b): r
        for r in mirror_host_pairs(df, **kw).collect()
    }


def test_full_and_partial_mirror(spark):
    rows = (
        [("a", i, f"body {i}") for i in range(4)]
        + [("b", 10 + i, f"body {i}") for i in range(4)]  # full mirror of a
        + [("c", 20 + i, f"body {i}") for i in range(2)]  # half of a
        + [("c", 25, "own page"), ("c", 26, "another own page")]
    )
    got = _run(spark, rows)
    ab = got[("a", "b")]
    assert (ab.shared, ab.n_a, ab.n_b, ab.is_mirror) == (4, 4, 4, True)
    ac = got[("a", "c")]
    # 2 shared of min(4,4) -> exactly half -> mirror at the boundary
    assert (ac.shared, ac.is_mirror) == (2, True)


def test_weak_overlap_not_mirror(spark):
    rows = (
        [("a", i, f"a{i}") for i in range(5)]
        + [("b", 10 + i, f"b{i}") for i in range(5)]
        + [("a", 6, "one shared notice"), ("b", 16, "one shared notice")]
    )
    got = _run(spark, rows)
    r = got[("a", "b")]
    assert (r.shared, r.is_mirror) == (1, False)


def test_host_cap_drops_universal_content(spark):
    # the same parked-domain text on 5 hosts with cap 4: no pairs at all
    rows = [(f"h{i}", i, "parked domain notice") for i in range(5)]
    got = _run(spark, rows, host_cap=4)
    assert got == {}
    # under the cap the pairs appear
    got2 = _run(spark, rows[:3], host_cap=4)
    assert len(got2) == 3


def test_within_host_duplicates_count_once(spark):
    rows = [
        ("a", 1, "same"),
        ("a", 2, "same"),  # re-post on the same host
        ("b", 3, "same"),
        ("b", 4, "other"),
    ]
    got = _run(spark, rows)
    r = got[("a", "b")]
    # distinct (host, sha): a has n=1, shared=1 -> mirror of the smaller
    assert (r.shared, r.n_a, r.n_b, r.is_mirror) == (1, 1, 2, True)
