"""Rank-Biased Overlap (operators/rbo.py, Webber et al. TOIS'10):
closed forms, top-weighting, non-conjoint lists, SQL twin."""

from __future__ import annotations

import duckdb
import pytest

from mediaduplicatefinder_spark.operators.rbo import rbo_sql, rbo_topk


def _lists_df(spark, rows):
    # rows: (query_id, vec_id, cosine)
    return spark.createDataFrame(
        rows, "query_id long, vec_id long, cosine double"
    )


def _ranked(q, ids):
    # build a list with strictly decreasing cosines in the given order
    return [(q, v, 1.0 - 0.01 * i) for i, v in enumerate(ids)]


def _rbo(spark, a_ids, b_ids, k=10, p=0.9):
    a = _lists_df(spark, _ranked(0, a_ids))
    b = _lists_df(spark, _ranked(0, b_ids))
    [row] = rbo_topk(a, b, k=k, p=p).collect()
    return row["overlap_k"], row["rbo"]


def test_identical_lists_closed_form(spark):
    # A_d = d for all d: RBO@k = (1-p) * sum p^{d-1} = 1 - p^k
    ids = list(range(10))
    ov, rbo = _rbo(spark, ids, ids)
    assert ov == 10
    assert rbo == pytest.approx(1 - 0.9**10, abs=1e-12)


def test_disjoint_lists_zero(spark):
    ov, rbo = _rbo(spark, list(range(10)), list(range(100, 110)))
    assert ov == 0 and rbo == 0.0


def test_top_weighting(spark):
    base = list(range(10))
    swap_top = [1, 0] + base[2:]     # disagree at ranks 1-2
    swap_tail = base[:8] + [9, 8]    # disagree at ranks 9-10
    _, r_top = _rbo(spark, base, swap_top)
    _, r_tail = _rbo(spark, base, swap_tail)
    ident = 1 - 0.9**10
    assert r_top < r_tail < ident  # early disagreement costs more


def test_reversed_full_overlap_partial_rbo(spark):
    ids = list(range(10))
    ov, rbo = _rbo(spark, ids, ids[::-1])
    assert ov == 10  # set recall would call this perfect
    assert 0 < rbo < 1 - 0.9**10  # RBO does not


def test_query_missing_from_b_scores_zero(spark):
    a = _lists_df(spark, _ranked(0, list(range(5))) + _ranked(1, [7, 8]))
    b = _lists_df(spark, _ranked(0, list(range(5))))
    got = {r["query_id"]: r for r in rbo_topk(a, b, k=5).collect()}
    assert set(got) == {0, 1}
    assert got[1]["overlap_k"] == 0 and got[1]["rbo"] == 0.0


def test_sql_twin_matches(spark):
    rows_a = _ranked(0, [3, 1, 4, 1_5, 9]) + _ranked(50, [2, 7, 18, 28, 3])
    rows_b = _ranked(0, [1, 4, 3, 99, 9]) + _ranked(50, [18, 2, 5, 7, 11])
    a, b = _lists_df(spark, rows_a), _lists_df(spark, rows_b)
    got = sorted(
        (r["query_id"], r["overlap_k"], r["rbo"])
        for r in rbo_topk(a, b, k=5).collect()
    )
    con = duckdb.connect()
    con.register("la", a.toPandas())
    con.register("lb", b.toPandas())
    want = sorted(
        (int(q), int(o), float(r))
        for q, o, r in con.execute(
            rbo_sql("SELECT * FROM la", "SELECT * FROM lb", k=5)
        ).fetchall()
    )
    assert got == want
