"""CCNet LM perplexity buckets (operators/perplexity.py, E46)."""

from __future__ import annotations

import pytest

from mediaduplicatefinder_spark.operators.perplexity import (
    TARGET_MOD,
    perplexity_buckets,
)


def _run(spark, rows, parallelism=None):
    df = spark.createDataFrame(rows, "doc_id: long, lang: string, text: string")
    if parallelism:
        df = df.repartition(parallelism)
    return {r.doc_id: r for r in perplexity_buckets(df).collect()}


def _corpus():
    """Target docs (doc_id % TARGET_MOD == 0) share a stereotyped
    vocabulary; distractor docs use disjoint junk tokens."""
    rows = []
    target_text = "the quick brown fox jumps over the lazy dog again and again"
    for i in range(0, 4 * TARGET_MOD, TARGET_MOD):
        rows.append((i, "en", target_text))
    # target-like but NOT in the slice: should score well (head)
    rows.append((1, "en", target_text))
    # junk vocab never seen by the model: worst ce (tail)
    rows.append((2, "en", "zzq xxv wwu yyt zzq xxv wwu yyt zzq xxv"))
    # middling: half target vocab, half junk
    rows.append((3, "en", "the quick zzq xxv brown fox wwu yyt lazy dog"))
    return rows


def test_target_like_head_junk_tail(spark):
    got = _run(spark, _corpus())
    assert got[1].bucket == "head"
    assert got[2].bucket == "tail"
    order = sorted(
        (r.ce, r.doc_id) for r in got.values() if r.bucket != "na"
    )
    # ce ordering matches bucket ordering: all head ce <= all tail ce
    head_max = max(r.ce for r in got.values() if r.bucket == "head")
    tail_min = min(r.ce for r in got.values() if r.bucket == "tail")
    assert head_max <= tail_min
    assert order  # sanity


def test_na_bucket_for_short_docs(spark):
    rows = _corpus() + [(100, "en", "single"), (101, "en", "  ")]
    got = _run(spark, rows)
    for i in (100, 101):
        assert got[i].bucket == "na"
        assert got[i].n_bigrams == 0 and got[i].ce == 0.0


def test_tercile_sizes(spark):
    # 9 scorable docs -> exactly 3 per bucket (ntile definition)
    rows = _corpus() + [
        (200 + k, "en", f"the quick brown tok{k} fox lazy") for k in range(2)
    ]
    got = _run(spark, rows)
    scorable = [r for r in got.values() if r.bucket != "na"]
    assert len(scorable) == 9
    from collections import Counter

    c = Counter(r.bucket for r in scorable)
    assert c == {"head": 3, "middle": 3, "tail": 3}


def test_per_lang_partitioning(spark):
    # a lone 'de' doc is its own tercile universe -> head by definition
    rows = _corpus() + [(50, "de", "völlig anderes vokabular hier drüben")]
    got = _run(spark, rows)
    assert got[50].bucket == "head"


def test_partition_invariance(spark):
    rows = _corpus()
    a = _run(spark, rows, parallelism=2)
    b = _run(spark, rows, parallelism=7)
    assert {k: (v.ce, v.bucket, v.n_bigrams) for k, v in a.items()} == {
        k: (v.ce, v.bucket, v.n_bigrams) for k, v in b.items()
    }


def test_smoothing_floor(spark):
    import math

    from mediaduplicatefinder_spark.operators.perplexity import N_BUCKETS

    # no target slice at all (no doc_id % TARGET_MOD == 0): every gram
    # scores the unseen floor ln(1/N_BUCKETS) -> ce = ln(N_BUCKETS)
    got = _run(spark, [(1, "en", "a b c d")])
    assert got[1].n_bigrams == 3
    assert got[1].ce == pytest.approx(math.log(N_BUCKETS), abs=1e-6)
