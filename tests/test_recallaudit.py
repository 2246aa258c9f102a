"""E148 capture-recapture recall audit: set-algebra invariants, the
degenerate same-seed case, estimator behavior on a planted corpus, and
partition invariance. (The DuckDB value twin runs in the correctness
gate at sf0.01 — both full-pipeline SQL oracles merged.)"""

from __future__ import annotations

import dataclasses

import pytest

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.operators.extract import (
    extracted_or_given_text,
)
from mediaduplicatefinder_spark.operators.recallaudit import (
    PPM,
    recall_audit,
)


def _mk_docs(spark, n_families=12, copies=3):
    """Families of near-identical docs (one word flipped per copy) so
    the pipeline has real pairs to find."""
    import datetime

    ts = datetime.datetime(2026, 1, 1)
    rows = []
    for f in range(n_families):
        base = [f"family{f}word{w}" for w in range(40)]
        for c in range(copies):
            words = list(base)
            words[c] = f"variant{f}c{c}"
            rows.append(
                (f"doc://{f * 10 + c:010d}", ts, "en", " ".join(words), None)
            )
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, lang string, text string, html binary",
    )
    return extracted_or_given_text(df, use_html=False).persist()


@pytest.fixture(scope="module")
def audited(spark):
    docs = _mk_docs(spark)
    row = recall_audit(docs, DEFAULT_CONFIG).collect()[0]
    return docs, row


def test_set_algebra_invariants(audited):
    _, r = audited
    assert r["pairs_both"] <= min(r["pairs_a"], r["pairs_b"])
    assert r["union_pairs"] == r["pairs_a"] + r["pairs_b"] - r["pairs_both"]
    if r["pairs_both"] > 0:
        # Lincoln-Petersen never estimates below either observed sample
        assert r["est_total_pairs"] >= max(r["pairs_a"], r["pairs_b"])
        assert 0 < r["recall_a_ppm"] <= PPM
        assert 0 < r["recall_b_ppm"] <= PPM


def test_planted_corpus_full_recall(audited):
    """At default config (16 bands) near-identical copies collide in
    every family: both families find all C(3,2)*12 pairs and the
    estimator reports exactly that with recall 1.0."""
    _, r = audited
    want = 12 * 3  # C(3,2)=3 pairs per family of 3
    assert r["pairs_a"] == r["pairs_b"] == r["pairs_both"] == want
    assert r["est_total_pairs"] == want
    assert r["recall_a_ppm"] == PPM and r["recall_b_ppm"] == PPM


def test_same_seed_is_degenerate(spark, audited):
    """audit_seed == cfg.minhash_seed collapses to one family: both
    counts equal, recall exactly 1.0 — the sanity anchor that any
    disagreement comes from the seed, not nondeterminism."""
    docs, _ = audited
    r = recall_audit(
        docs, DEFAULT_CONFIG, audit_seed=DEFAULT_CONFIG.minhash_seed
    ).collect()[0]
    assert r["pairs_a"] == r["pairs_b"] == r["pairs_both"]
    assert r["recall_a_ppm"] == PPM


def test_partition_invariance(spark, audited):
    docs, base = audited
    r = recall_audit(docs.repartition(7), DEFAULT_CONFIG).collect()[0]
    assert tuple(r) == tuple(base)


def test_weak_banding_still_consistent(spark, audited):
    """A deliberately weak config (2 bands) may miss pairs, but the
    invariants and the subset relation vs the strong config must
    hold."""
    docs, strong = audited
    weak_cfg = dataclasses.replace(
        DEFAULT_CONFIG, minhash_bands=2, minhash_rows=8
    )
    r = recall_audit(docs, weak_cfg).collect()[0]
    assert r["pairs_a"] <= strong["pairs_a"]
    assert r["pairs_b"] <= strong["pairs_b"]
    assert r["pairs_both"] <= min(r["pairs_a"], r["pairs_b"])
    assert r["union_pairs"] == r["pairs_a"] + r["pairs_b"] - r["pairs_both"]
