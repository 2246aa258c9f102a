"""P7 name-shortcut in the DISTRIBUTED verify stage (VERDICT r1 item 4):
on a file-path-like corpus with cfg.use_name_shortcut=True, every
verified candidate pair's (similar, score) must equal
oracle.textsim.documents_similar(use_name_shortcut=True); the flag is
off by default for the webtext profile."""

from __future__ import annotations

from dataclasses import replace

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.operators.candidates import candidate_pairs
from mediaduplicatefinder_spark.operators.signatures import page_signatures
from mediaduplicatefinder_spark.operators.verify import (
    _url_stem_expr,
    verify_pairs,
)
from mediaduplicatefinder_spark.oracle import textsim


def test_url_stem_expr_matches_oracle(spark):
    urls = [
        "http://x.com/docs/report_v1.txt",
        "docs/report.final.csv",
        "noslash.pdf",
        "dir/.hidden",
        "dir/trailingdot.",
        "plainname",
        "a/b/",
        "x/..weird",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    got = {r.u: r.s for r in df.select("u", _url_stem_expr(F.col("u")).alias("s")).collect()}
    for u in urls:
        assert got[u] == textsim.url_stem(u), u


def _path_corpus():
    """File-path-like urls; texts tuned so some pairs are text-similar,
    some only NAME-similar (moderate token overlap -> still LSH
    candidates, Jaccard <= 0.6)."""
    common = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
        "sigma tau upsilon koppa sampi stigma digamma heta sho san qoppa"
    )
    extra_a = "omicron rho finis unus duo tres quattuor quinque sexa"
    extra_b = "phi chi psi omega aleph beth gimel daleth teth"
    rows = [
        # name-similar twins (stem containment -> 0.8), texts J ~ 0.54:
        # candidates with high probability, below the 0.6 text gate
        ("files/quarterly_report_2024.txt", f"{common} {extra_a}"),
        ("files/quarterly_report_2024x.txt", f"{common} {extra_b}"),
        # text-similar pair, names dissimilar
        ("files/aaa_notes.txt", f"{common} {extra_a} one two three"),
        ("files/zzz_summary.csv", f"{common} {extra_a} one two four"),
        # filler docs
        ("files/unrelated_doc_q.txt", "totally different words entirely here now"),
        ("files/another_thing_r.txt", "more unrelated content with other tokens"),
    ]
    return [(u, None, t, "en") for u, t in rows]


@pytest.fixture(scope="module")
def verified(spark):
    pages = spark.createDataFrame(
        _path_corpus(), "url string, warc_ts timestamp, text string, lang string"
    )
    cfg = replace(DEFAULT_CONFIG, use_name_shortcut=True)
    sigs = page_signatures(pages, cfg, min_partitions=4, use_html=False).persist()
    cands, _m, _b = candidate_pairs(sigs, cfg)
    rows = verify_pairs(cands, sigs, cfg).collect()
    sigs.unpersist()
    return rows


def test_verify_matches_oracle_with_shortcut(verified):
    docs = {u: t for u, _, t, _ in _path_corpus()}
    sizes = {u: len(t.encode()) for u, t in docs.items()}
    assert len(verified) > 0
    shortcut_hits = 0
    for r in verified:
        want_sim, want_score = textsim.documents_similar(
            sizes[r.url_a],
            sizes[r.url_b],
            r.url_a,
            r.url_b,
            docs[r.url_a],
            docs[r.url_b],
            use_name_shortcut=True,
        )
        assert r.similar == want_sim, (r.url_a, r.url_b)
        assert r.score == pytest.approx(want_score, abs=1e-12), (r.url_a, r.url_b)
        if want_sim and r.jaccard <= DEFAULT_CONFIG.jaccard_threshold:
            shortcut_hits += 1
    # at least one pair is similar ONLY via the name shortcut
    assert shortcut_hits >= 1


def test_shortcut_off_by_default(spark, verified):
    pages = spark.createDataFrame(
        _path_corpus(), "url string, warc_ts timestamp, text string, lang string"
    )
    sigs = page_signatures(pages, DEFAULT_CONFIG, min_partitions=4, use_html=False)
    cands, _m, _b = candidate_pairs(sigs, DEFAULT_CONFIG)
    base = {
        (r.url_a, r.url_b): (r.similar, r.score)
        for r in verify_pairs(cands, sigs, DEFAULT_CONFIG).collect()
    }
    # default profile: pure Jaccard decision (no name column influence)
    for (a, b), (sim, score) in base.items():
        docs = {u: t for u, _, t, _ in _path_corpus()}
        want = textsim.text_similarity(
            textsim.first_n_lines(docs[a]), textsim.first_n_lines(docs[b])
        )
        assert score == pytest.approx(want, abs=1e-9)
        assert sim == (want > DEFAULT_CONFIG.jaccard_threshold)
