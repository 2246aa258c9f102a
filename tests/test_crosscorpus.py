"""E170 cross-corpus near-dup join: the bipartite band-join probe must
equal the self-join pipeline restricted to cross-side pairs (set AND
score equality), match the pure-python oracle's full pair relation on
cross-side pairs, be invariant under the salted rewrite and the
128-bit key profile, and never plan a cartesian product."""

from __future__ import annotations

import dataclasses

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.operators.candidates import candidate_pairs
from mediaduplicatefinder_spark.operators.crosscorpus import (
    cross_corpus_pairs,
)
from mediaduplicatefinder_spark.operators.extract import (
    extracted_or_given_text,
)
from mediaduplicatefinder_spark.operators.signatures import (
    compute_signatures,
)
from mediaduplicatefinder_spark.operators.verify import verify_pairs

def _side():
    return F.pmod(F.xxhash64("url"), F.lit(2))


@pytest.fixture(scope="module")
def setup(spark, tiny_pages_df):
    docs = extracted_or_given_text(tiny_pages_df, use_html=True)
    sigs = compute_signatures(docs, DEFAULT_CONFIG).persist()
    sides = {
        r["url"]: r["side"]
        for r in sigs.select("url", _side().alias("side")).collect()
    }
    sigs_ref = sigs.filter(_side() == 0)
    sigs_new = sigs.filter(_side() == 1)
    yield sigs, sigs_ref, sigs_new, sides
    sigs.unpersist()


def _cross_rows(sigs_ref, sigs_new, **kw):
    return (
        cross_corpus_pairs(sigs_ref, sigs_new, DEFAULT_CONFIG, **kw)
        .filter("similar")
        .collect()
    )


def test_sides_labeled_and_bipartite(setup):
    _, sigs_ref, sigs_new, sides = setup
    rows = _cross_rows(sigs_ref, sigs_new)
    assert rows, "tiny corpus must produce cross-side near-dups"
    for r in rows:
        assert sides[r["url_ref"]] == 0
        assert sides[r["url_new"]] == 1


def test_equals_self_join_pipeline_restricted_to_cross_pairs(setup):
    sigs, sigs_ref, sigs_new, sides = setup
    res = candidate_pairs(sigs, DEFAULT_CONFIG)
    ver = verify_pairs(res.cands, sigs, DEFAULT_CONFIG).filter("similar")
    self_pairs = {
        tuple(sorted((r["url_a"], r["url_b"]))): round(r["jaccard"], 9)
        for r in ver.collect()
        if sides[r["url_a"]] != sides[r["url_b"]]
    }
    res.buckets.unpersist()
    cross = {
        tuple(sorted((r["url_ref"], r["url_new"]))): round(r["jaccard"], 9)
        for r in _cross_rows(sigs_ref, sigs_new)
    }
    assert cross == self_pairs


def test_salted_rewrite_is_identity(setup):
    _, sigs_ref, sigs_new, _ = setup
    plain = sorted(map(tuple, _cross_rows(sigs_ref, sigs_new)))
    salted = sorted(map(tuple, _cross_rows(sigs_ref, sigs_new, n_salt=4)))
    assert salted == plain


def test_matches_python_oracle_cross_pairs(setup, tiny_pages_df):
    from mediaduplicatefinder_spark.oracle.dedup import (
        Page,
        all_similar_pairs,
    )

    _, sigs_ref, sigs_new, sides = setup
    plist = [
        Page(r.url, r.text, r.lang, bytes(r.html))
        for r in tiny_pages_df.orderBy("url").collect()
    ]
    truth = {
        tuple(sorted(k)): round(v, 6)
        for k, v in all_similar_pairs(plist, set()).items()
        if sides[k[0]] != sides[k[1]]
    }
    got = {
        tuple(sorted((r["url_ref"], r["url_new"]))): round(r["jaccard"], 6)
        for r in _cross_rows(sigs_ref, sigs_new)
    }
    assert got == truth


def test_128bit_profile_same_pairs(setup, spark, tiny_pages_df):
    _, _, _, sides = setup
    cfg = dataclasses.replace(DEFAULT_CONFIG, doc_key_bits=128)
    docs = extracted_or_given_text(tiny_pages_df, use_html=True)
    sigs = compute_signatures(docs, cfg).persist()
    rows = (
        cross_corpus_pairs(
            sigs.filter(_side() == 0), sigs.filter(_side() == 1), cfg
        )
        .filter("similar")
        .collect()
    )
    sigs.unpersist()
    _, sigs_ref, sigs_new, _ = setup
    base = {
        (r["url_ref"], r["url_new"], round(r["jaccard"], 9))
        for r in _cross_rows(sigs_ref, sigs_new)
    }
    wide = {
        (r["url_ref"], r["url_new"], round(r["jaccard"], 9)) for r in rows
    }
    assert wide == base


def test_plan_has_no_cartesian_product(setup):
    _, sigs_ref, sigs_new, _ = setup
    plan = (
        cross_corpus_pairs(sigs_ref, sigs_new, DEFAULT_CONFIG)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
