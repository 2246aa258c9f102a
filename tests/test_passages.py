"""E81 overlapping passage windows (operators/passages.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.passages import passage_windows


def _run(spark, text, **kw):
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    return sorted(
        passage_windows(df, **kw).collect(), key=lambda r: r.start_tok
    )


def _toks(n):
    return " ".join(f"t{i}" for i in range(n))


def test_exact_coverage_and_overlap(spark):
    rows = _run(spark, _toks(100), window=64, stride=48, min_tail=8)
    assert [(r.start_tok, r.n_tok) for r in rows] == [(0, 64), (48, 52)]
    assert rows[0].passage.split() == [f"t{i}" for i in range(64)]
    assert rows[1].passage.split() == [f"t{i}" for i in range(48, 100)]
    # every token covered; consecutive windows overlap by window-stride
    assert rows[0].start_tok + rows[0].n_tok > rows[1].start_tok


def test_tail_rule(spark):
    # n=100, stride=48 -> starts 0,48,96; tail (96,4) < min_tail dropped
    rows = _run(spark, _toks(100), window=48, stride=48, min_tail=8)
    assert [(r.start_tok, r.n_tok) for r in rows] == [(0, 48), (48, 48)]
    # raise tail allowance: the 4-token tail now survives
    rows = _run(spark, _toks(100), window=48, stride=48, min_tail=4)
    assert [(r.start_tok, r.n_tok) for r in rows] == [
        (0, 48),
        (48, 48),
        (96, 4),
    ]


def test_short_doc_single_window(spark):
    rows = _run(spark, "a b c", window=64, stride=48, min_tail=8)
    assert [(r.start_tok, r.n_tok, r.passage) for r in rows] == [
        (0, 3, "a b c")
    ]


def test_passage_ids_sequential(spark):
    rows = _run(spark, _toks(200), window=24, stride=16, min_tail=4)
    assert [r.passage_id for r in rows] == list(range(len(rows)))
    # full coverage: union of slices == original tokens
    seen = set()
    for r in rows:
        seen.update(range(r.start_tok, r.start_tok + r.n_tok))
    assert seen == set(range(200))
