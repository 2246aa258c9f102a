"""E110 recrawl scheduling (operators/recrawl.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.recrawl import recrawl_schedule


def _run(spark, diff_rows, seed_rows):
    diff = spark.createDataFrame(
        diff_rows, "url string, host string, status string"
    )
    seeds = spark.createDataFrame(seed_rows, "host string, changefreq string")
    return {r.host: r for r in recrawl_schedule(diff, seeds).collect()}


def _diff(host, changed, unchanged):
    rows = [(f"u{host}{i}c", host, "CHANGED") for i in range(changed)]
    rows += [(f"u{host}{i}u", host, "UNCHANGED") for i in range(unchanged)]
    return rows


def test_busy_quiet_and_neutral(spark):
    diff = (
        _diff("busy", 2, 4)  # 2/6 = 33.3% -> busy (>= 1/3)
        + _diff("quiet", 0, 11)  # 0% -> quiet
        + _diff("mid", 1, 5)  # 16.7% -> neither
    )
    seeds = [("busy", "weekly"), ("quiet", "weekly"), ("mid", "weekly")]
    got = _run(spark, diff, seeds)
    assert got["busy"].revisit_days == 3 and got["busy"].tier == "hot"
    assert got["quiet"].revisit_days == 14 and got["quiet"].tier == "warm"
    assert got["mid"].revisit_days == 7 and got["mid"].tier == "warm"


def test_defaults_and_unknown_labels(spark):
    got = _run(
        spark,
        _diff("nocover", 0, 5) + _diff("odd", 0, 5),
        [("odd", "sometimes"), ("seedonly", "daily")],
    )
    # host with no sitemap row: default 14, quiet -> 28 cold
    assert got["nocover"].freq_days == 14
    assert got["nocover"].revisit_days == 28 and got["nocover"].tier == "cold"
    # unknown label ignored -> default too
    assert got["odd"].freq_days == 14
    # sitemap-only host: no churn evidence -> declared cadence
    s = got["seedonly"]
    assert (s.n_changed, s.n_unchanged, s.revisit_days, s.tier) == (0, 0, 1, "hot")


def test_min_frequency_wins_and_floor(spark):
    got = _run(
        spark,
        _diff("h", 5, 0),  # 100% changed -> busy
        [("h", "monthly"), ("h", "daily")],
    )
    # min(30, 1) = 1; busy halves with floor 1
    assert got["h"].freq_days == 1 and got["h"].revisit_days == 1


def test_new_gone_do_not_count_as_evidence(spark):
    diff = [("u1", "h", "NEW"), ("u2", "h", "GONE")]
    got = _run(spark, diff, [("h", "weekly")])
    # no CHANGED/UNCHANGED overlap -> declared cadence, no override
    assert got["h"].revisit_days == 7
