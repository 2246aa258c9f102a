"""E182 LSH Forest: prefix mechanics (exact dup matches at full
depth), the depth~similarity ladder, retrieval quality (true nearest
by Jaccard found at rank 1 on planted data), k/self-exclusion
contracts, and partition invariance."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.operators.extract import (
    extracted_or_given_text,
)
from mediaduplicatefinder_spark.operators.lshforest import (
    FOREST_DEPTH,
    FOREST_TREES,
    lshforest_topk,
)
from mediaduplicatefinder_spark.operators.signatures import (
    compute_signatures,
)


def _sigs(spark, rows, parts=4):
    pages = spark.createDataFrame(
        [(u, None, t, "en") for u, t in rows],
        "url string, warc_ts timestamp, text string, lang string",
    ).repartition(parts)
    docs = extracted_or_given_text(pages, use_html=False)
    return compute_signatures(docs, DEFAULT_CONFIG)


def _queries(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(17)
    vocab = [f"word{i:04d}" for i in range(400)]
    rows = []
    base_words = {}
    for i in range(30):
        words = rng.sample(vocab, 60)
        base_words[i] = words
        rows.append((f"doc://base{i:03d}", " ".join(words)))
    # exact duplicate of base0
    rows.append(("doc://exact000", " ".join(base_words[0])))
    # near-dup of base1: 55/65 tokens shared
    rows.append(
        (
            "doc://near0001",
            " ".join(base_words[1][:55] + [f"extra{j}" for j in range(10)]),
        )
    )
    return rows


def test_exact_dup_full_depth_rank1(spark, corpus):
    sigs = _sigs(spark, corpus).persist()
    out = lshforest_topk(
        sigs, _queries(spark, ["doc://base000"]), k=3
    ).collect()
    top = [r for r in out if r["rank"] == 1][0]
    assert top["url_c"] == "doc://exact000"
    assert top["depth"] == FOREST_DEPTH  # identical sig -> full prefix
    assert top["jaccard"] == 1.0
    sigs.unpersist()


def test_near_dup_found_and_ranked_by_depth_then_jaccard(spark, corpus):
    sigs = _sigs(spark, corpus).persist()
    out = lshforest_topk(
        sigs, _queries(spark, ["doc://base001"]), k=5
    ).collect()
    assert out, "near-dup must surface for its base"
    top = [r for r in out if r["rank"] == 1][0]
    assert top["url_c"] == "doc://near0001"
    # ladder sanity: deeper matches first
    depths = [r["depth"] for r in sorted(out, key=lambda r: r["rank"])]
    assert depths == sorted(depths, reverse=True) or len(set(depths)) == 1
    sigs.unpersist()


def test_k_and_self_exclusion(spark, corpus):
    sigs = _sigs(spark, corpus).persist()
    qs = ["doc://base000", "doc://base001", "doc://base002"]
    out = lshforest_topk(sigs, _queries(spark, qs), k=2).collect()
    per = {}
    for r in out:
        assert r["url_c"] != r["url_q"]
        per.setdefault(r["url_q"], []).append(r["rank"])
    assert all(len(v) <= 2 and sorted(v) == list(range(1, len(v) + 1))
               for v in per.values())
    sigs.unpersist()


def test_zero_shingle_docs_never_indexed(spark):
    rows = [
        ("doc://a", "alpha beta gamma delta shared tokens here"),
        ("doc://b", "alpha beta gamma delta shared tokens here extra"),
        ("doc://empty1", ""),
        ("doc://empty2", "   "),
    ]
    sigs = _sigs(spark, rows)
    out = lshforest_topk(
        sigs, _queries(spark, ["doc://a", "doc://empty1"]), k=5
    ).collect()
    urls = {r["url_q"] for r in out} | {r["url_c"] for r in out}
    assert "doc://empty1" not in urls and "doc://empty2" not in urls
    assert any(r["url_q"] == "doc://a" and r["url_c"] == "doc://b" for r in out)


def test_depth_is_prefix_agreement(spark, corpus):
    # depth reported for a pair == the max over trees of the longest
    # equal slot prefix — recomputed from the raw signatures
    sigs = _sigs(spark, corpus).persist()
    mh = {
        r["url"]: r["minhash"]
        for r in sigs.select("url", "minhash").collect()
    }
    out = lshforest_topk(
        sigs, _queries(spark, ["doc://base000", "doc://base001"]), k=5
    ).collect()
    for r in out:
        a, b = mh[r["url_q"]], mh[r["url_c"]]
        best = 0
        for t in range(FOREST_TREES):
            d = 0
            for j in range(FOREST_DEPTH):
                if a[t * FOREST_DEPTH + j] == b[t * FOREST_DEPTH + j]:
                    d += 1
                else:
                    break
            best = max(best, d)
        assert r["depth"] == best, (r["url_q"], r["url_c"])
    sigs.unpersist()


def test_partition_invariance(spark, corpus):
    def run(parts):
        sigs = _sigs(spark, corpus, parts)
        return sorted(
            map(
                tuple,
                lshforest_topk(
                    sigs, _queries(spark, ["doc://base000"]), k=4
                ).collect(),
            )
        )

    assert run(1) == run(7)
