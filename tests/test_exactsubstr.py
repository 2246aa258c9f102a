"""E36 ExactSubstr span removal: first-occurrence-wins semantics over
the bounded suffix array, exact reassembly, and the no-op guarantee on
duplicate-free corpora."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.suffixarray import (
    exactsubstr_dedup,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest tonight"),
    (2, "some filler words then the quick brown fox jumps over the lazy "
        "dog and runs far away into town"),
    (3, "completely unrelated text about cooking pasta with tomato sauce "
        "and fresh basil leaves"),
    (4, "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest tonight"),  # exact dup of 1
    (5, ""),
]


def test_exactsubstr_drops_non_first_occurrences(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in exactsubstr_dedup(df, min_match=10).collect()
    }
    # doc 4 is byte-equal to doc 1 and ranks after it at every tied
    # suffix (SA ties break by doc_id): its early flagged spans cover
    # the doc through the end -> fully cut
    assert out[4]["n_dropped"] == out[4]["n_tokens"] == 19
    assert out[4]["text_deduped"] == ""
    # docs 1 and 2 share the 14-token run "the quick ... far away into";
    # exactly ONE of them keeps it (which one is decided by the
    # md5-alphabet SA order — deterministic, engine == oracle), and the
    # other keeps only its unshared remainder
    d1, d2 = out[1], out[2]
    assert sorted([d1["n_dropped"], d2["n_dropped"]]) == [0, 14]
    winner, loser = (d1, d2) if d1["n_dropped"] == 0 else (d2, d1)
    shared = "the quick brown fox jumps over the lazy dog and runs far away into"
    assert shared in winner["text_deduped"]
    assert shared not in loser["text_deduped"]
    # the loser's surviving tokens are a subsequence of its original
    orig = {1: DOCS[0][1], 2: DOCS[1][1]}[
        1 if loser is d1 else 2
    ].split()
    it = iter(orig)
    assert all(w in it for w in loser["text_deduped"].split())
    # doc 3 (unique) and doc 5 (empty) are untouched
    assert out[3]["n_dropped"] == 0
    assert out[3]["text_deduped"] == DOCS[2][1]
    assert out[5]["n_tokens"] == 0 and out[5]["text_deduped"] == ""


def test_exactsubstr_noop_on_unique_corpus(spark):
    docs = [
        (i, " ".join(f"tok{i}x{j}" for j in range(30))) for i in range(8)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = exactsubstr_dedup(df, min_match=10).collect()
    assert all(r["n_dropped"] == 0 for r in out)
    got = {r["doc_id"]: r["text_deduped"] for r in out}
    assert got == dict(docs)


def test_exactsubstr_partition_invariant(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, exactsubstr_dedup(df, min_match=10).collect()))
    b = sorted(
        map(
            tuple,
            exactsubstr_dedup(df.repartition(6), min_match=10).collect(),
        )
    )
    assert a == b
