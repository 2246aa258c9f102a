"""E121 per-url fetch planning (operators/fetchplan.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.fetchplan import plan_fetches
from mediaduplicatefinder_spark.operators.robots import parse_robots_rules


def _run(spark, urls, prior, robots, schedule):
    u = spark.createDataFrame(urls, "host string, path string, url string")
    p = spark.createDataFrame(
        prior, "url string, etag string, last_modified string"
    )
    r = parse_robots_rules(
        spark.createDataFrame(robots, "host string, payload string")
    )
    s = spark.createDataFrame(schedule, "host string, tier string")
    return {x.url: x for x in plan_fetches(u, p, r, s).collect()}


ROBOTS = [("h", "User-agent: *\nDisallow: /priv")]


def test_action_matrix(spark):
    urls = [
        ("h", "/priv/a", "http://h/priv/a"),  # robots-denied
        ("h", "/cal/cal/b", "http://h/cal/cal/b?sid=1"),  # trap
        ("h", "/ok/c", "http://h/ok/c"),  # validators -> conditional
        ("h", "/ok/d", "http://h/ok/d"),  # nothing -> full
    ]
    prior = [("http://h/ok/c", "etag-1", None)]
    got = _run(spark, urls, prior, ROBOTS, [("h", "warm")])
    assert got["http://h/priv/a"].action == "skip"
    assert not got["http://h/priv/a"].allowed
    assert got["http://h/cal/cal/b?sid=1"].action == "skip"
    assert got["http://h/cal/cal/b?sid=1"].is_trap
    assert got["http://h/ok/c"].action == "conditional"
    assert got["http://h/ok/d"].action == "full"
    assert all(r.tier_rank == 2 for r in got.values())


def test_skip_outranks_validators(spark):
    urls = [("h", "/priv/x", "http://h/priv/x")]
    prior = [("http://h/priv/x", "etag", None)]
    got = _run(spark, urls, prior, ROBOTS, [("h", "hot")])
    assert got["http://h/priv/x"].action == "skip"
    assert got["http://h/priv/x"].has_validators


def test_lastmod_alone_is_a_validator_and_tier_defaults(spark):
    urls = [("h", "/ok/y", "http://h/ok/y"), ("g", "/ok/z", "http://g/ok/z")]
    prior = [("http://h/ok/y", None, "Mon, 17 Aug 2026 00:00:00 GMT")]
    got = _run(spark, urls, prior, ROBOTS, [("h", "hot")])
    assert got["http://h/ok/y"].action == "conditional"
    assert got["http://h/ok/y"].tier_rank == 1
    # host g: no robots rules (allowed), no schedule row -> rank 3
    z = got["http://g/ok/z"]
    assert (z.action, z.tier_rank) == ("full", 3)


def test_politeness_schedule_composition(spark):
    """E129: wave rank x learned delay -> fetch tick (query-level
    invariants; the stage operators have their own suites)."""
    import __spark_entry__ as entry

    out = entry.queries()["politeness_schedule"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out
    by_host = {}
    for r in out:
        assert r.fetch_tick_ms == (r.wave - 1) * r.delay_ms
        assert r.wave >= 1
        by_host.setdefault(r.host, []).append(r)
    for host, rows in by_host.items():
        # one delay per host; quota caps the kept set at 8
        assert len({r.delay_ms for r in rows}) == 1
        assert len(rows) <= 8
        # first wave fetches immediately
        assert min(r.fetch_tick_ms for r in rows) == 0
    # hosts without a directive use the 1000 ms default
    assert any(rows[0].delay_ms == 1000 for rows in by_host.values())
    assert any(rows[0].delay_ms == 500 for rows in by_host.values())
