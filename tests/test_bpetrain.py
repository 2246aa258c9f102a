"""E133 BPE merge training (operators/bpetrain.py): hand-derived
merges, greedy-fold edge cases (runs, non-cascading), deterministic
tie-break, and fuzz parity against a pure-Python reference."""

from __future__ import annotations

import random

import duckdb

from mediaduplicatefinder_spark.operators.bpetrain import (
    END,
    bpe_segments_sql,
    bpe_train,
)


# ---------------------------------------------------- python reference


def _ref_apply(seq: tuple, l: str, r: str) -> tuple:
    out = []
    for x in seq:
        if out and out[-1] == l and x == r:
            out[-1] = l + r
        else:
            out.append(x)
    return tuple(out)


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    vocab = {w: tuple(list(w) + [END]) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple, int] = {}
        for w, c in word_counts.items():
            seq = vocab[w]
            for a, b in zip(seq, seq[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (l, r), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, c))
        vocab = {w: _ref_apply(s, l, r) for w, s in vocab.items()}
    return merges, {w: " ".join(s) for w, s in vocab.items()}


def _train(spark, texts, n):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    merges, seg = bpe_train(df, n_merges=n)
    return merges, {r.word: r.seg for r in seg.collect()}, {
        r.word: r.wcount for r in seg.collect()
    }


def test_sennrich_style_corpus(spark):
    texts = ["low low low low low", "lower lower", "newest newest",
             "widest"]
    merges, segs, counts = _train(spark, texts, 4)
    wc = {"low": 5, "lower": 2, "newest": 2, "widest": 1}
    ref_merges, ref_segs = _ref_bpe(wc, 4)
    assert [(l, r, c) for _, l, r, c in merges] == ref_merges
    assert segs == ref_segs
    assert counts == wc


def test_run_is_greedy_left_to_right(spark):
    # 'aaaa': merge (a,a) pairs left-to-right without cascade -> aa aa
    merges, segs, _ = _train(spark, ["aaaa aaaa"], 1)
    assert merges[0][1:3] == ("a", "a")
    assert segs["aaaa"] == f"aa aa {END}"


def test_odd_run(spark):
    merges, segs, _ = _train(spark, ["aaa aaa"], 1)
    assert segs["aaa"] == f"aa a {END}"


def test_tie_break_lexicographic(spark):
    # 'ab' and 'cd' each appear twice; (a,b) wins over (c,d) on l ASC
    merges, _, _ = _train(spark, ["ab ab cd cd"], 1)
    assert merges[0][1:3] == ("a", "b")


def test_fuzz_parity_python_and_sql(spark):
    rng = random.Random(7)
    words = [
        "".join(rng.choice("abcde") for _ in range(rng.randint(1, 8)))
        for _ in range(40)
    ]
    text = " ".join(rng.choice(words) for _ in range(300))
    merges, segs, counts = _train(spark, [text], 5)
    ref_merges, ref_segs = _ref_bpe(counts, 5)
    assert [(l, r, c) for _, l, r, c in merges] == ref_merges
    assert segs == {w: ref_segs[w] for w in segs}

    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents AS SELECT '"
        + text
        + "' AS text"
    )
    got = {
        w: s for w, _, s in con.sql(
            bpe_segments_sql(n_merges=5)
        ).fetchall()
    }
    assert got == segs
