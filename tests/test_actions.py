"""Deletion / quarantine executor (operators/actions.py vs
duplicate_gui.py:810-910)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.actions import (
    apply_actions,
    deletion_report,
    format_space,
    plan_actions,
    space_str_expr,
)
from mediaduplicatefinder_spark.pipeline import run_dedup


@pytest.fixture(scope="module")
def planned(spark, tiny_pages_df):
    res = run_dedup(spark, tiny_pages_df)
    plan = plan_actions(res.clusters, tiny_pages_df).cache()
    plan.count()
    return res, plan


def test_plan_partitions_actions(planned):
    res, plan = planned
    rows = {r.url: r for r in plan.collect()}
    # every clustered url gets exactly one action row
    assert len(rows) == res.clusters.select("url").distinct().count()
    for r in res.clusters.collect():
        a = rows[r.url]
        if r.is_keeper:
            assert a.action == "keep" and a.bytes_reclaimed == 0
        elif r.kind == "EXACT":
            assert a.action == "delete" and a.bytes_reclaimed > 0
        else:  # SIMILAR non-keepers are never deleted (duplicate_gui.py:882)
            assert a.action == "flag" and a.bytes_reclaimed == 0


def test_delete_bytes_match_corpus(planned, tiny_pages_df):
    _, plan = planned
    sizes = {
        r.url: r.n
        for r in tiny_pages_df.select(
            "url", F.octet_length("text").alias("n")
        ).collect()
    }
    for r in plan.filter("action = 'delete'").collect():
        assert r.bytes_reclaimed == sizes[r.url]


def test_report_matches_plan(planned):
    _, plan = planned
    rpt = deletion_report(plan).collect()[0]
    dels = plan.filter("action = 'delete'").collect()
    assert rpt.total_to_delete == len(dels)
    assert rpt.total_space_to_free == sum(r.bytes_reclaimed for r in dels)
    assert rpt.space_str == format_space(rpt.total_space_to_free)


def test_apply_quarantines_and_cleans(planned, tiny_pages_df, tmp_path):
    res, plan = planned
    qpath = str(tmp_path / "quarantine")
    out = apply_actions(tiny_pages_df, plan, quarantine_path=qpath)
    n_del = plan.filter("action = 'delete'").count()
    assert out.deleted_count == n_del
    assert out.errors == []
    assert out.space_str == format_space(out.space_freed)
    # clean + quarantine partition the corpus; no keeper was deleted
    spark = tiny_pages_df.sparkSession
    quarantined = spark.read.parquet(qpath)
    assert quarantined.count() == n_del
    assert out.clean.count() == tiny_pages_df.count() - n_del
    keepers = {r.url for r in res.clusters.filter("is_keeper").collect()}
    assert not keepers & {r.url for r in quarantined.select("url").collect()}
    # idempotent: re-applying to the clean corpus deletes nothing, and
    # every originally-planned url lands in the error branch
    again = apply_actions(out.clean, plan)
    assert again.deleted_count == 0
    assert len(again.errors) == n_del


def test_missing_url_is_error_not_delete(planned, tiny_pages_df):
    _, plan = planned
    victim = plan.filter("action = 'delete'").limit(1).collect()[0].url
    corpus = tiny_pages_df.filter(F.col("url") != victim)
    out = apply_actions(corpus, plan)
    assert out.errors == [f"{victim}: not found"]
    assert out.error_count == 1
    assert out.deleted_count == plan.filter("action = 'delete'").count() - 1


def test_error_collect_is_capped(spark, tiny_pages_df):
    # stale plan vs a re-crawled corpus: thousands of planned urls no
    # longer exist — the driver must see only a bounded sample while the
    # true count and full set stay available (distributed)
    n_stale = 5000
    stale = spark.range(n_stale).select(
        F.concat(F.lit("https://gone.example/p"), F.col("id")).alias("url"),
        F.lit(10).cast("long").alias("bytes_reclaimed"),
        F.lit("delete").alias("action"),
    )
    out = apply_actions(tiny_pages_df, stale, error_sample_cap=25)
    assert out.deleted_count == 0
    assert len(out.errors) == 25  # bounded driver memory
    assert out.error_count == n_stale  # true total, counted distributed
    assert out.errors_df.count() == n_stale  # full set sinkable as a table
    # sample is deterministic (ordered by url before limit)
    urls = [e.removesuffix(": not found") for e in out.errors]
    assert urls == sorted(urls)


def test_space_str_expr_matches_python(spark):
    # probe the strict-> boundaries of duplicate_gui.py:864-870
    vals = [0, 1023, 1024, 1025, 1048576, 1048577, 5 << 20,
            1073741824, 1073741825, 7 << 30]
    df = spark.createDataFrame([(v,) for v in vals], "b: long")
    got = {
        r.b: r.s
        for r in df.select("b", space_str_expr(F.col("b")).alias("s")).collect()
    }
    for v in vals:
        assert got[v] == format_space(v)
    assert got[1073741825].endswith("GB") and got[1073741824].endswith("MB")
    assert got[1048576].endswith("KB")
