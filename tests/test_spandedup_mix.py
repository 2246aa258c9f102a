"""E28 span dedup + E29 deterministic corpus mixing."""

from __future__ import annotations

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.selection import (
    MIX_MODULUS,
    corpus_mix,
    mix_keep_expr,
)
from mediaduplicatefinder_spark.operators.spandedup import span_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _by_id(res):
    return {r.doc_id: r for r in res.collect()}


def test_span_dedup_first_occurrence_wins(spark):
    rows = [
        (1, "en", "a b c d e f g h i j"),  # spans: "a b c d e", "f g h i j"
        (2, "en", "a b c d e x y z w v"),  # first span duplicates doc 1's
        (3, "en", "q r s t u"),  # unique
    ]
    got = _by_id(span_dedup(_docs(spark, rows)))
    assert got[1].n_spans == 2 and got[1].n_dropped == 0
    assert got[1].text_dedup == "a b c d e f g h i j"
    assert got[2].n_spans == 2 and got[2].n_dropped == 1
    assert got[2].text_dedup == "x y z w v"
    assert got[3].n_dropped == 0 and got[3].text_dedup == "q r s t u"


def test_span_dedup_within_doc_repeat_and_tail(spark):
    # doc 5 repeats its own first span; 12 tokens -> tail span of 2
    rows = [
        (5, "en", "a b c d e a b c d e y z"),
        (6, "en", "y z"),  # tail span "y z" already taken by doc 5
    ]
    got = _by_id(span_dedup(_docs(spark, rows)))
    assert got[5].n_spans == 3 and got[5].n_dropped == 1
    assert got[5].text_dedup == "a b c d e y z"
    assert got[6].n_spans == 1 and got[6].n_dropped == 1
    assert got[6].text_dedup == ""


def test_span_dedup_empty_and_whitespace_docs(spark):
    rows = [(7, "en", ""), (8, "en", "   "), (9, "en", "k l m")]
    got = _by_id(span_dedup(_docs(spark, rows)))
    for d in (7, 8):
        assert got[d].n_spans == 0 and got[d].n_kept == 0
        assert got[d].text_dedup == ""
    assert got[9].text_dedup == "k l m"


def test_span_dedup_partition_invariance(spark):
    rows = [
        (i, "en", " ".join(f"w{(i * 7 + j) % 23}" for j in range(17)))
        for i in range(40)
    ]
    d = _docs(spark, rows)
    a = sorted(map(tuple, span_dedup(d.repartition(1)).collect()))
    b = sorted(map(tuple, span_dedup(d.repartition(7)).collect()))
    assert a == b


def test_corpus_mix_deterministic_and_rate_shaped(spark):
    rows = [(i, "en", f"src{i % 4}", "t") for i in range(4000)]
    d = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string"
    )
    a = {r.source: r for r in corpus_mix(d.repartition(3)).collect()}
    b = {r.source: r for r in corpus_mix(d.repartition(11)).collect()}
    assert {s: (r.n_docs, r.n_kept, r.keep_threshold) for s, r in a.items()} == {
        s: (r.n_docs, r.n_kept, r.keep_threshold) for s, r in b.items()
    }
    for n in range(4):
        r = a[f"src{n}"]
        assert r.keep_threshold == MIX_MODULUS // (n + 1)
        # binomial(1000, 1/(n+1)) stays well within 5 sigma of the mean
        expect = 1000 / (n + 1)
        sigma = (1000 * (1 / (n + 1)) * (1 - 1 / (n + 1))) ** 0.5 or 1.0
        assert abs(r.n_kept - expect) <= 5 * sigma + 1


def test_mix_gate_is_pure_function_of_doc_key(spark):
    """Same doc_id kept/dropped identically regardless of which rows
    surround it (retry/composability contract)."""
    full = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(300)], "doc_id long, source string"
    )
    half = full.filter(F.col("doc_id") % 2 == 0)
    kept_full = {
        r.doc_id
        for r in full.filter(mix_keep_expr()).select("doc_id").collect()
    }
    kept_half = {
        r.doc_id
        for r in half.filter(mix_keep_expr()).select("doc_id").collect()
    }
    assert kept_half == {i for i in kept_full if i % 2 == 0}
