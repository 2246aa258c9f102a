"""E62 temperature/UniMax language-mix allocation
(operators/selection.lang_temperature_mix)."""

from __future__ import annotations

import math

from mediaduplicatefinder_spark.operators.selection import (
    lang_temperature_mix,
)


def _mk(spark, lang_tokens: dict[str, int]):
    # one doc per lang whose text has exactly n whitespace tokens
    rows = [
        (i, lang, " ".join(["w"] * n))
        for i, (lang, n) in enumerate(sorted(lang_tokens.items()))
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_unimax_waterfill_both_branches(spark):
    # total=100, pct=60 -> B=60, epochs=1: caps asc zh=5 fr=15 de=30 en=50
    #   zh: 5*4=20  < 60        -> capped (5)
    #   fr: 15*3=45 < 55        -> capped (15)
    #   de: 30*2=60 >= 40       -> uniform
    #   en:                        uniform
    # remaining = 60-20=40 over 2 langs -> 20 each
    out = {
        r.lang: r
        for r in lang_temperature_mix(
            _mk(spark, {"en": 50, "de": 30, "fr": 15, "zh": 5}),
            pct=60,
            max_epochs=1,
        ).collect()
    }
    assert out["zh"].unimax_alloc == 5 and out["fr"].unimax_alloc == 15
    assert out["de"].unimax_alloc == 20 and out["en"].unimax_alloc == 20
    # budget conservation: sum(alloc) <= B, shortfall only from floor
    assert sum(r.unimax_alloc for r in out.values()) == 60
    # epoch cap respected everywhere
    assert all(r.unimax_alloc <= r.capacity for r in out.values())
    assert out["zh"].epochs == 1.0 and out["en"].epochs == 0.4


def test_unimax_all_capped_when_budget_exceeds_capacity(spark):
    # B = 90% of 100 = 90 > sum(caps)=?? with epochs=0.. use epochs=1,
    # caps sum to 100 > 90: en capped? en: 50*1=50 < 90-50=40? no ->
    # construct a true all-capped case: pct=200 -> B=200 > caps
    out = {
        r.lang: r
        for r in lang_temperature_mix(
            _mk(spark, {"en": 50, "de": 30, "fr": 15, "zh": 5}),
            pct=200,
            max_epochs=1,
        ).collect()
    }
    assert all(r.unimax_alloc == r.capacity for r in out.values())


def test_temperature_shares(spark):
    out = {
        r.lang: r
        for r in lang_temperature_mix(
            _mk(spark, {"en": 400, "de": 100})
        ).collect()
    }
    # sqrt weights: 20 vs 10 -> shares 2/3, 1/3
    assert math.isclose(out["en"].share_temp, 2 / 3, abs_tol=1e-9)
    assert math.isclose(out["de"].share_temp, 1 / 3, abs_tol=1e-9)
    assert math.isclose(
        sum(r.share_temp for r in out.values()), 1.0, abs_tol=1e-8
    )


def test_single_lang(spark):
    rows = lang_temperature_mix(
        _mk(spark, {"en": 100}), pct=50, max_epochs=2
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.share_temp == 1.0
    # B=50 < capacity 200 -> uniform branch: 50 div 1 = 50
    assert r.unimax_alloc == 50 and r.epochs == 0.5


# --------------------------------------- E65 host duplication stats


def test_host_dup_stats_mirror_farm(spark):
    from mediaduplicatefinder_spark.operators.stats import host_dup_stats

    rows = []
    # mirror.org: 6 docs, 4 of them copies of the same boilerplate
    for i in range(4):
        rows.append((i, "mirror.org", "same boilerplate"))
    rows.append((4, "mirror.org", "unique a"))
    rows.append((5, "mirror.org", "unique b"))
    # clean.org: 5 unique docs, but one text ALSO appears on mirror.org
    # (cross-host mirrors count as dups on both sides)
    rows.append((6, "clean.org", "same boilerplate"))
    for i in range(7, 11):
        rows.append((i, "clean.org", f"unique {i}"))
    # tiny.org: 100% dup ratio but below the min-docs floor
    rows.append((11, "tiny.org", "same boilerplate"))
    df = spark.createDataFrame(rows, "doc_id long, host string, text string")
    out = {r.host: r for r in host_dup_stats(df).collect()}

    m = out["mirror.org"]
    assert (m.n_docs, m.n_dup_docs) == (6, 4)
    assert abs(m.dup_ratio - 4 / 6) < 1e-9
    assert m.blocklist_candidate  # 4*2 >= 6 and n >= 5

    c = out["clean.org"]
    assert (c.n_docs, c.n_dup_docs) == (5, 1)
    assert not c.blocklist_candidate  # 1*2 < 5

    t = out["tiny.org"]
    assert (t.n_docs, t.n_dup_docs) == (1, 1)
    assert not t.blocklist_candidate  # below HOST_DUP_MIN_DOCS
