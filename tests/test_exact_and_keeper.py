"""Exact-dup pass (A1/A3/C1/F3/F4) + keeper selection (O1) vs oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators import exact as exact_ops
from mediaduplicatefinder_spark.operators import keeper as keeper_ops
from mediaduplicatefinder_spark.oracle import dedup as oracle_dedup
from mediaduplicatefinder_spark.oracle.dedup import Page


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, ["url", "lang", "size_bytes", "text"])


def test_exact_groups_match_oracle(spark):
    rows = [
        ("https://h/a.html", "en", 10, "same content here"),
        ("https://h/b.html", "en", 10, "same content here"),
        ("https://h/c.html", "en", 10, "same content here"),
        ("https://h/d.html", "en", 11, "different content"),
        ("https://h/e.html", "de", 10, "same content here"),  # exact ignores lang
    ]
    grouped = exact_ops.exact_groups(exact_ops.with_sha256(_docs_df(spark, rows)))
    clusters = exact_ops.exact_clusters(grouped).collect()
    got = {}
    for r in clusters:
        got.setdefault(r.cluster_id, set()).add(r.url)
    pages = [Page(u, t, lang) for u, lang, _, t in rows]
    expected = {min(g): set(g) for g in oracle_dedup.exact_duplicate_groups(pages)}
    assert got == expected
    # survivors: first of each hash group in url order + the singleton
    survivors = {r.url for r in exact_ops.similarity_survivors(grouped).collect()}
    assert survivors == {"https://h/a.html", "https://h/d.html"}


def test_keeper_priority_scan_root(spark):
    # three members: one directly under scan root (wins), two deeper
    rows = [
        ("https://h/deep/x/a.html", "c1"),
        ("https://h/b.html", "c1"),
        ("https://h/alpha/c.html", "c1"),
    ]
    df = spark.createDataFrame(rows, ["url", "cluster_id"]).withColumn(
        "kind", F.lit("EXACT")
    )
    flagged = keeper_ops.with_keeper_flags(df, scan_root="https://h")
    keeper = keeper_ops.keepers(flagged).collect()[0]
    assert keeper.url == "https://h/b.html"
    # without matching scan root: lexicographic dirname ordering —
    # "https://h" < "https://h/alpha" < "https://h/deep/x"
    flagged2 = keeper_ops.with_keeper_flags(df, scan_root="")
    keeper2 = keeper_ops.keepers(flagged2).collect()[0]
    assert keeper2.url == "https://h/b.html"
    # oracle agreement in both modes
    urls = [r[0] for r in rows]
    (k, _), = oracle_dedup.select_keepers([sorted(urls)], "https://h")
    assert k == keeper.url
    (k2, _), = oracle_dedup.select_keepers([sorted(urls)], "")
    assert k2 == keeper2.url


def test_redundant_are_non_keepers(spark):
    rows = [("https://h/a.html", "c1"), ("https://h/b.html", "c1")]
    df = spark.createDataFrame(rows, ["url", "cluster_id"]).withColumn(
        "kind", F.lit("EXACT")
    )
    flagged = keeper_ops.with_keeper_flags(df, scan_root="https://h")
    red = keeper_ops.redundant(flagged).collect()
    assert [r.url for r in red] == ["https://h/b.html"]
