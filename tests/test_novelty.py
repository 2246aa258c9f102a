"""E108 cross-snapshot shingle novelty (operators/novelty.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.novelty import shingle_novelty

OLD = "alpha beta gamma delta epsilon zeta eta theta"


def _run(spark, a_rows, b_rows):
    a = spark.createDataFrame(a_rows, "doc_id long, text string")
    b = spark.createDataFrame(b_rows, "doc_id long, text string")
    return {r.doc_id: r for r in shingle_novelty(a, b).collect()}


def test_unchanged_copied_and_fresh(spark):
    got = _run(
        spark,
        [(1, OLD), (2, "one two three four five")],
        [
            (1, OLD),  # unchanged
            (2, OLD),  # copied from ANOTHER old doc -> still zero novelty
            (3, "totally fresh words never seen before today"),
        ],
    )
    assert got[1].n_novel == 0 and not got[1].is_novel
    assert got[2].n_novel == 0 and not got[2].is_novel
    r3 = got[3]
    assert r3.n_known == 0 and r3.n_novel == r3.n_shingles and r3.is_novel


def test_partial_append(spark):
    got = _run(
        spark,
        [(1, OLD)],
        [(1, OLD + " brand new closing sentence")],
    )
    r = got[1]
    # old interior shingles known; tail shingles novel
    assert 0 < r.n_novel < r.n_shingles
    assert r.n_known + r.n_novel == r.n_shingles
    # 4 novel tail shingles vs 6 known -> under half -> not novel
    assert not r.is_novel


def test_short_doc_and_empty_old(spark):
    got = _run(
        spark,
        [(1, "x")],  # old snapshot has no shingles at all
        [(2, "aa bb"), (3, "fresh page full of new words")],
    )
    assert (got[2].n_shingles, got[2].is_novel) == (0, False)
    assert got[3].is_novel


def test_novelty_is_order_insensitive_set_math(spark):
    # same shingle repeated in the new doc counts once (distinct)
    got = _run(
        spark,
        [(1, "a b c")],
        [(1, "a b c a b c a b c")],
    )
    r = got[1]
    assert r.n_known >= 1  # 'a_b_c' is known
    assert r.n_known + r.n_novel == r.n_shingles
