"""E37 URL canonicalization: rule-by-rule adversarial cases, idempotence
(canon(canon(u)) == canon(u)), and direct Spark-vs-DuckDB parity on the
same probe set."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.urls import (
    canon_url_expr,
    canon_url_sql,
    domain_expr,
    host_expr,
)

CASES = [
    # (url, canon, host, domain)
    ("HTTP://WWW.Example.COM/Path", "http://example.com/Path",
     "example.com", "example.com"),
    ("https://example.com:443/a", "https://example.com/a",
     "example.com", "example.com"),
    ("http://example.com:80/a", "http://example.com/a",
     "example.com", "example.com"),
    ("https://example.com:80/a", "https://example.com:80/a",
     "example.com", "example.com"),  # 80 is NOT https' default
    ("http://example.com:8080/a", "http://example.com:8080/a",
     "example.com", "example.com"),
    ("https://sub.Example.org", "https://sub.example.org/",
     "sub.example.org", "example.org"),  # empty path -> "/"
    ("https://e.com/a?utm_source=x&b=2&a=1#frag",
     "https://e.com/a?a=1&b=2", "e.com", "e.com"),
    ("https://e.com/a?utm_campaign=x&fbclid=y&gclid=z",
     "https://e.com/a", "e.com", "e.com"),  # emptied query drops '?'
    ("https://e.com/a?z=1&y=2&z=0", "https://e.com/a?y=2&z=0&z=1",
     "e.com", "e.com"),  # params sorted, duplicates kept
    ("https://e.com/a#only-frag", "https://e.com/a", "e.com", "e.com"),
    ("https://www.e.com?a=1", "https://e.com/?a=1", "e.com", "e.com"),
    ("https://e.com/UTM_source/keep?a=1", "https://e.com/UTM_source/keep?a=1",
     "e.com", "e.com"),  # tracking rule hits params only, not paths
    ("https://localhost/x", "https://localhost/x", "localhost", ""),
]


@pytest.fixture(scope="module")
def canon_rows(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, *_ ) in enumerate(CASES)], "i long, url string"
    )
    out = df.select(
        "i",
        canon_url_expr(F.col("url")).alias("canon"),
        host_expr(F.col("url")).alias("host"),
        domain_expr(F.col("url")).alias("domain"),
    ).collect()
    return {r["i"]: r for r in out}


def test_canon_rules(canon_rows):
    for i, (url, canon, host, domain) in enumerate(CASES):
        r = canon_rows[i]
        assert r["canon"] == canon, url
        assert r["host"] == host, url
        assert r["domain"] == domain, url


def test_canon_idempotent(spark):
    df = spark.createDataFrame(
        [(u,) for u, *_ in CASES], "url string"
    ).select(canon_url_expr(F.col("url")).alias("c1"))
    twice = df.select(
        "c1", canon_url_expr(F.col("c1")).alias("c2")
    ).collect()
    for r in twice:
        assert r["c2"] == r["c1"]


def test_canon_duckdb_parity(spark, canon_rows):
    con = duckdb.connect()
    exprs = canon_url_sql("url")
    sql = (
        f"SELECT {exprs['canon']} AS canon, {exprs['host']} AS host, "
        f"{exprs['domain']} AS domain FROM (SELECT ? AS url)"
    )
    for i, (url, *_ ) in enumerate(CASES):
        duck = con.execute(sql, [url]).fetchone()
        r = canon_rows[i]
        assert (r["canon"], r["host"], r["domain"]) == duck, url
