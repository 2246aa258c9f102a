"""E99 per-host template-shingle detection (operators/hosttemplate.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.hosttemplate import (
    host_template_stats,
)

FOOTER = "footer nav menu copyright"  # 4 tokens -> 2 internal 3-shingles


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "host string, doc_id long, text string")
    return {(r.host, r.doc_id): r for r in host_template_stats(df, **kw).collect()}


def test_footer_shingles_are_template(spark):
    rows = [
        ("h", 1, f"alpha beta gamma {FOOTER}"),
        ("h", 2, f"delta epsilon zeta {FOOTER}"),
        ("h", 3, "unique words only here"),
    ]
    got = _run(spark, rows)
    # docs 1/2: footer-internal shingles shared by 2/3 hosts docs (>=50%)
    assert got[("h", 1)].n_template >= 2
    assert got[("h", 1)].n_template == got[("h", 2)].n_template
    # doc 3 shares nothing
    assert got[("h", 3)].n_template == 0
    assert not got[("h", 3)].boilerplate_heavy


def test_boilerplate_heavy_flag(spark):
    # doc whose text IS the footer: every shingle is template
    rows = [
        ("h", 1, FOOTER),
        ("h", 2, FOOTER),
        ("h", 3, f"one two three four five six seven eight nine {FOOTER}"),
    ]
    got = _run(spark, rows)
    assert got[("h", 1)].boilerplate_heavy
    assert got[("h", 1)].n_template == got[("h", 1)].n_shingles
    # doc 3 is mostly content -> not heavy
    assert not got[("h", 3)].boilerplate_heavy


def test_hosts_independent(spark):
    # identical footer on two hosts: df counted per host, not globally
    rows = [
        ("a", 1, f"x1 y1 z1 {FOOTER}"),
        ("a", 2, f"x2 y2 z2 {FOOTER}"),
        ("b", 3, f"x3 y3 z3 {FOOTER}"),
        ("b", 4, "plain page no footer at all"),
    ]
    got = _run(spark, rows)
    assert got[("a", 1)].n_template >= 2
    # on host b the footer appears in 1/2 docs -> 50% -> still template
    assert got[("b", 3)].n_template >= 2
    got2 = _run(spark, rows, pct=60)
    # at 60% threshold host b's footer (50%) drops out, host a's (100%) stays
    assert got2[("b", 3)].n_template == 0
    assert got2[("a", 1)].n_template >= 2


def test_short_docs_report_zero(spark):
    got = _run(spark, [("h", 1, "two words"), ("h", 2, "a b c d")])
    r = got[("h", 1)]
    assert (r.n_shingles, r.n_template, r.boilerplate_heavy) == (0, 0, False)
    assert got[("h", 2)].n_shingles == 2
