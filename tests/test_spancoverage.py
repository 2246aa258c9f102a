"""E88 duplicate-span interval union (operators/spancoverage.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.spancoverage import span_coverage


def _run(spark, spans, texts):
    sdf = spark.createDataFrame(spans, "doc_id long, s long, e long")
    ddf = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    return {r.doc_id: r for r in span_coverage(sdf, ddf).collect()}


def test_merge_rules(spark):
    texts = ["x" * 100, "y" * 100, "z" * 50]
    spans = [
        # doc 0: overlapping + touching + disjoint
        (0, 10, 20),
        (0, 15, 30),  # overlaps -> [10,30)
        (0, 30, 40),  # touches  -> [10,40)
        (0, 60, 70),  # island 2
        # doc 1: nested + duplicate
        (1, 5, 50),
        (1, 10, 20),
        (1, 5, 50),
    ]
    got = _run(spark, spans, texts)
    r0 = got[0]
    assert (r0.n_spans, r0.n_islands, r0.covered) == (4, 2, 40)
    assert r0.coverage == round(40 / 100, 6)
    r1 = got[1]
    assert (r1.n_spans, r1.n_islands, r1.covered) == (3, 1, 45)
    r2 = got[2]
    assert (r2.n_spans, r2.n_islands, r2.covered, r2.coverage) == (
        0,
        0,
        0,
        0.0,
    )


def test_full_and_empty(spark):
    got = _run(spark, [(0, 0, 10)], ["0123456789", ""])
    assert got[0].coverage == 1.0
    assert got[1].coverage == 0.0 and got[1].n_chars == 0


def test_python_replay(spark):
    import random

    rng = random.Random(7)
    spans = []
    for d in range(5):
        for _ in range(30):
            s = rng.randrange(0, 180)
            spans.append((d, s, s + rng.randrange(1, 40)))
    texts = ["t" * 200] * 5
    got = _run(spark, spans, texts)
    for d in range(5):
        ivs = sorted((s, e) for dd, s, e in spans if dd == d)
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        covered = sum(e - s for s, e in islands)
        assert got[d].n_islands == len(islands), d
        assert got[d].covered == covered, d
