"""E132 Broder super-shingles (operators/supershingle.py)."""

from __future__ import annotations

import duckdb

from mediaduplicatefinder_spark.operators.supershingle import (
    supershingle_keys,
    supershingle_pairs,
    supershingle_pairs_sql,
)

W = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " \
    "kilo lima mike november oscar papa quebec romeo sierra tango " \
    "uniform victor whiskey xray yankee zulu one two three four"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_identical_docs_share_all_supershingles(spark):
    df = _df(spark, [(1, "en", W), (2, "en", W)])
    got = supershingle_pairs(df, group_cols=["lang"], k=3, s=24, g=4, r=2).collect()
    assert len(got) == 1
    # 30 words -> 28 shingles, sketch 24 -> 6 full groups of 4
    assert got[0].id_a == 1 and got[0].id_b == 2 and got[0].n_shared == 6


def test_lang_gate(spark):
    df = _df(spark, [(1, "en", W), (2, "de", W)])
    assert (
        supershingle_pairs(df, group_cols=["lang"], r=1).count() == 0
    )


def test_disjoint_docs_share_none(spark):
    w2 = " ".join(w + "x" for w in W.split())
    df = _df(spark, [(1, "en", W), (2, "en", w2)])
    assert supershingle_pairs(df, group_cols=["lang"], r=1).count() == 0


def test_short_docs_emit_nothing(spark):
    # < k tokens, and >= k tokens but fewer than g sketch values
    df = _df(spark, [(1, "en", "a b"), (2, "en", "a b c d")])
    assert supershingle_keys(df, group_cols=["lang"], k=3, g=4).count() == 0


def test_r_threshold(spark):
    # variant keeps the front of the doc: shares some but not all groups
    words = W.split()
    variant = " ".join(words[:-6])
    df = _df(spark, [(1, "en", W), (2, "en", variant)])
    p1 = supershingle_pairs(df, group_cols=["lang"], r=1).collect()
    if p1:  # whatever r=1 finds, r > n_shared must drop
        n = p1[0].n_shared
        assert (
            supershingle_pairs(df, group_cols=["lang"], r=n + 1).count() == 0
        )


def test_bucket_cap_keeps_lowest_ids(spark):
    df = _df(spark, [(i, "en", W) for i in range(6)])
    capped = supershingle_pairs(
        df, group_cols=["lang"], r=2, bucket_cap=3
    ).collect()
    ids = {x for p in capped for x in (p.id_a, p.id_b)}
    assert ids == {0, 1, 2}
    assert len(capped) == 3  # C(3,2)
    full = supershingle_pairs(df, group_cols=["lang"], r=2).count()
    assert full == 15  # C(6,2)


def test_sql_twin_parity(spark):
    rows = [
        (1, "en", W),
        (2, "en", W),
        (3, "en", " ".join(W.split()[:-4])),
        (4, "de", W),
        (5, "en", "tiny doc"),
    ]
    df = _df(spark, rows)
    got = sorted(
        (r.id_a, r.id_b, r.n_shared)
        for r in supershingle_pairs(df, group_cols=["lang"], r=1).collect()
    )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{lang}', '{t}')" for i, lang, t in rows)
        + ") v(doc_id, lang, text)"
    )
    want = sorted(
        tuple(r)
        for r in con.sql(supershingle_pairs_sql(r=1)).fetchall()
    )
    assert got == want and len(got) >= 2
