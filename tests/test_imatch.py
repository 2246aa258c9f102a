"""E178 I-Match: collection-statistics filter semantics (df band),
fingerprint collision behavior (edits in filtered terms collide,
edits in kept terms split), lexicon-randomization recall (a one-term
edit still collides on some variant), and partition invariance."""

from __future__ import annotations

import hashlib

import pytest

from mediaduplicatefinder_spark.operators.imatch import imatch_groups


def _docs(spark, rows, parts=1):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).repartition(parts)


@pytest.fixture(scope="module")
def corpus():
    # vocabulary: "common" appears in every doc (df = N -> filtered by
    # the df <= N/2 ceiling); "hapax*" appear once (df=1 < df_min=2 ->
    # filtered); midband terms carry identity.
    return [
        (1, "en", "common alpha beta gamma hapax1"),
        (2, "en", "common alpha beta gamma hapax2"),  # == 1 after filter
        (3, "en", "common alpha beta delta hapax3"),  # differs in kept term
        (4, "en", "common alpha beta gamma"),  # == 1 after filter
        (5, "en", "common delta epsilon zeta"),
        (6, "en", "common delta epsilon zeta"),  # == 5 after filter
        (7, "en", "common hapax7 hapax8"),  # zero surviving terms
        (8, "de", "common hapax9"),  # de: unfingerprintable AND size-1
    ]


def test_filtered_term_edits_collide(spark, corpus):
    out = imatch_groups(_docs(spark, corpus)).collect()
    groups = {}
    for r in out:
        groups.setdefault((r["lang"], r["fingerprint"]), set()).add(
            r["doc_id"]
        )
    assert {1, 2, 4} in groups.values()  # hapax/ubiquitous edits collide
    assert {5, 6} in groups.values()
    docs = {r["doc_id"] for r in out}
    assert 3 not in docs  # kept-term edit -> unique fingerprint
    assert 7 not in docs  # unfingerprintable
    assert 8 not in docs  # de group has size 1


def test_fingerprint_is_sha256_of_sorted_terms(spark, corpus):
    out = imatch_groups(_docs(spark, corpus)).collect()
    # docs 1/2/4 keep exactly {alpha, beta, gamma} (df in [2, N/2])
    expect = hashlib.sha256(
        "\x1f".join(sorted(["alpha", "beta", "gamma"])).encode()
    ).hexdigest()
    fp = {r["doc_id"]: r["fingerprint"] for r in out}
    assert fp[1] == expect
    assert {r["n_terms"] for r in out if r["doc_id"] in (1, 2, 4)} == {3}
    assert {r["group_size"] for r in out if r["doc_id"] in (1, 2, 4)} == {3}


def test_lexicon_randomization_recovers_one_term_edit(spark):
    # 9 shared midband terms + one kept term present only in docs 1/3:
    # docs 1 and 2 differ by that single term, so their full (variant-0)
    # fingerprints differ, but every variant whose dropped bucket holds
    # "oddone" makes them collide — the KDD'05 recall mechanism.
    shared = "ta1 tb2 tc3 td4 te5 tf6 tg7 th8 ti9"
    filler = [
        # raise N without touching the shared terms' df (pads are hapax)
        (i, "en", f"pad{i}a pad{i}b pad{i}c")
        for i in range(10, 30)
    ]
    rows = [
        (1, "en", shared + " oddone"),
        (2, "en", shared),
        (3, "en", shared + " oddone"),  # gives oddone df=2 (kept)
    ] + filler
    out = imatch_groups(_docs(spark, rows), n_variants=4).collect()
    fp0 = {r["doc_id"]: r["fingerprint"] for r in out if r["variant"] == 0}
    # variant 0: docs 1 and 3 group (identical kept sets); doc 2 differs
    assert fp0[1] == fp0[3] and fp0.get(2) != fp0[1]
    hit = [
        r["variant"]
        for r in out
        if r["doc_id"] == 1
        and any(
            o["doc_id"] == 2
            and o["variant"] == r["variant"]
            and o["fingerprint"] == r["fingerprint"]
            for o in out
        )
    ]
    assert hit, "one-term edit must collide on some randomized variant"
    assert all(v > 0 for v in hit)


def test_partition_invariance(spark, corpus):
    def run(parts):
        return sorted(
            map(
                tuple,
                imatch_groups(_docs(spark, corpus, parts), n_variants=2)
                .collect(),
            )
        )

    assert run(1) == run(5)


def test_vertical_tab_is_whitespace_in_both_engines(spark):
    """Review r5: Java \\s treats \\x0B as whitespace but RE2's does
    not, and the twin's old strip class DELETED it (gluing tokens).
    Both engines must now tokenize 'alpha\\vbeta' as two words — the
    planted pair groups identically cross-engine."""
    import duckdb

    from mediaduplicatefinder_spark.operators.imatch import (
        imatch_groups_sql,
    )

    rows = [
        (0, "en", "alpha\x0bbeta gamma delta epsilon common filler"),
        (1, "en", "alpha beta gamma delta epsilon common filler"),
        (2, "en", "zeta eta theta iota kappa common filler"),
        (3, "en", "lambda mu nu xi omicron common filler"),
        (4, "en", "pi rho sigma tau upsilon common filler"),
        (5, "en", "phi chi psi omega alef common filler"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = sorted(map(tuple, imatch_groups(df).collect()))
    con = duckdb.connect()
    vals = ", ".join(
        "({}, 'en', '{}')".format(i, t.replace(chr(11), "'||chr(11)||'"))
        for i, _l, t in rows
    )
    con.sql(
        f"CREATE VIEW d AS SELECT * FROM (VALUES {vals}) v(doc_id, lang, text)"
    )
    twin = sorted(
        tuple(r)
        for r in con.sql(
            imatch_groups_sql("SELECT doc_id, lang, text FROM d")
        ).fetchall()
    )
    assert got == twin
    assert {r[0] for r in got} == {0, 1}  # \v doc groups with its twin
