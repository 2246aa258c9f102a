"""E83 per-host quota sampling (operators/hostquota.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.hostquota import (
    host_quota_sample,
)


def _docs(spark, n_hosts, per_host):
    rows = [
        (f"h{h}", "doc://%010d" % (h * 1000 + i))
        for h in range(n_hosts)
        for i in range(per_host)
    ]
    return spark.createDataFrame(rows, "host string, url string")


def test_quota_enforced(spark):
    df = _docs(spark, 3, 50)
    out = host_quota_sample(df, quota=20).collect()
    assert len(out) == 150
    per_host_kept = {}
    for r in out:
        per_host_kept[r.host] = per_host_kept.get(r.host, 0) + int(r.kept)
        assert r.kept == (r.pick_rank is not None)
        if r.pick_rank is not None:
            assert 1 <= r.pick_rank <= 20
    assert per_host_kept == {"h0": 20, "h1": 20, "h2": 20}
    # kept ranks are a permutation of 1..quota per host
    for h in ("h0", "h1", "h2"):
        ranks = sorted(
            r.pick_rank for r in out if r.host == h and r.kept
        )
        assert ranks == list(range(1, 21))


def test_under_quota_all_kept(spark):
    df = _docs(spark, 2, 5)
    out = host_quota_sample(df, quota=20).collect()
    assert all(r.kept for r in out)
    assert len(out) == 10


def test_deterministic_and_partition_invariant(spark):
    df1 = _docs(spark, 4, 40).repartition(1)
    df7 = _docs(spark, 4, 40).repartition(7)
    k1 = {
        (r.host, r.url, r.pick_rank)
        for r in host_quota_sample(df1, quota=10).collect()
        if r.kept
    }
    k7 = {
        (r.host, r.url, r.pick_rank)
        for r in host_quota_sample(df7, quota=10).collect()
        if r.kept
    }
    assert k1 == k7


def test_lottery_follows_hash_order(spark):
    df = _docs(spark, 1, 30)
    out = [
        r
        for r in host_quota_sample(df, quota=5).collect()
        if r.kept
    ]
    hs = {
        r.url: h
        for r, h in zip(
            out,
            [
                x.h
                for x in spark.createDataFrame(
                    [(r.url,) for r in out], "url string"
                )
                .select(F.xxhash64("url").alias("h"))
                .collect()
            ],
        )
    }
    ordered = sorted(out, key=lambda r: r.pick_rank)
    hashes = [hs[r.url] for r in ordered]
    assert hashes == sorted(hashes)  # signed int64 ascending
