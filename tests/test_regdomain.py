"""E113 registrable-domain extraction (functions/regdomain.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.regdomain import (
    registrable_domains,
)

CASES = [
    ("http://example.com/a", "example.com", "com"),
    ("http://www.example.com/a", "example.com", "com"),
    ("http://a.b.c.example.org/x", "example.org", "org"),
    ("http://example.co.uk/y", "example.co.uk", "co.uk"),
    ("http://en.blog.example.co.uk/z", "example.co.uk", "co.uk"),
    ("http://shop.example.com.au/", "example.com.au", "com.au"),
    # a bare two-label host whose tail IS a multi suffix stays itself
    ("http://co.uk/", "co.uk", "co.uk"),
    ("http://intranet/portal", "intranet", ""),
    ("http://EXAMPLE.COM/upper", "example.com", "com"),
]


def test_registrable_matrix(spark):
    df = spark.createDataFrame([(u,) for u, _, _ in CASES], "url string")
    got = {r.url: r for r in registrable_domains(df).collect()}
    for url, reg, suffix in CASES:
        assert got[url].reg_domain == reg, (url, got[url])
        assert got[url].public_suffix == suffix, (url, got[url])
    assert got["http://intranet/portal"].n_labels == 1
    assert got["http://en.blog.example.co.uk/z"].n_labels == 5


def test_same_owner_subdomains_collapse(spark):
    df = spark.createDataFrame(
        [
            ("http://en.blog.example.co.uk/a",),
            ("http://shop.example.co.uk/b",),
            ("http://other.co.uk/c",),
        ],
        "url string",
    )
    regs = [r.reg_domain for r in registrable_domains(df).collect()]
    assert regs.count("example.co.uk") == 2
    assert regs.count("other.co.uk") == 1
