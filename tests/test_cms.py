"""E135 count-min sketch (operators/cms.py)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.cms import (
    cms_build,
    cms_estimate,
    cms_merge,
    cms_sql,
)


def _items(spark, rows):
    return spark.createDataFrame(rows, "item string, wt long")


def test_estimate_overcounts_never_undercounts(spark):
    rows = [(f"k{i % 17}", 1) for i in range(300)]
    items = _items(spark, rows)
    grid = cms_build(items, weight_col="wt", d=4, w=8)  # force collisions
    exact = {r.item: r.exact for r in
             items.groupBy("item").agg(F.sum("wt").alias("exact")).collect()}
    probes = items.select("item").distinct()
    est = {r.item: r.est for r in
           cms_estimate(grid, probes, d=4, w=8).collect()}
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    # with w=8 and 17 keys there MUST be at least one overestimate
    assert any(est[k] > exact[k] for k in exact)


def test_exact_when_no_collisions(spark):
    rows = [("a", 5), ("b", 3)]
    grid = cms_build(_items(spark, rows), weight_col="wt")
    est = {r.item: r.est for r in cms_estimate(
        grid, _items(spark, rows).select("item").distinct()
    ).collect()}
    assert est == {"a": 5, "b": 3}


def test_unseen_item_estimates_from_grid(spark):
    rows = [("a", 5)]
    grid = cms_build(_items(spark, rows), weight_col="wt")
    probes = spark.createDataFrame([("zzz",)], "item string")
    [r] = cms_estimate(grid, probes).collect()
    assert 0 <= r.est <= 5  # 0 unless all 4 cells collide with 'a'


def test_merge_equals_single_build(spark):
    rows1 = [(f"k{i % 5}", 1) for i in range(40)]
    rows2 = [(f"k{i % 7}", 2) for i in range(30)]
    g1 = cms_build(_items(spark, rows1), weight_col="wt")
    g2 = cms_build(_items(spark, rows2), weight_col="wt")
    merged = cms_merge(g1.unionByName(g2))
    whole = cms_build(_items(spark, rows1 + rows2), weight_col="wt")
    key = lambda r: (r.j, r.col, r.cnt)
    assert sorted(map(key, merged.collect())) == sorted(
        map(key, whole.collect())
    )


def test_sql_twin_parity(spark):
    rows = [(f"w{i % 11}", 1) for i in range(100)]
    items = _items(spark, rows)
    grid = cms_build(items, weight_col="wt")
    exact_df = items.groupBy("item").count()
    est = {r.item: r.est for r in cms_estimate(
        grid, exact_df.select("item")
    ).collect()}
    con = duckdb.connect()
    vals = ", ".join(f"('{k}', {w})" for k, w in rows)
    got = con.sql(
        cms_sql(f"SELECT * FROM (VALUES {vals}) v(item, wt)")
    ).fetchall()
    assert {k: e for k, e, _ in got} == est
    assert all(e >= x for _, e, x in got)
