"""E123 RFC 3986 dot-segment removal (functions/dotsegments.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.dotsegments import (
    remove_dot_segments,
)

# (path, expected) — RFC 3986 §5.2.4 semantics for absolute paths
CASES = [
    ("/a/b/c", "/a/b/c"),
    ("/a/./b/../c", "/a/c"),
    ("/../a", "/a"),  # root escape dropped
    ("/a/b/../../../y", "/y"),  # over-pop
    ("/dir/", "/dir/"),  # trailing slash kept
    ("/a/b/..", "/a/"),  # trailing '..' leaves a slash
    ("/a/b/.", "/a/b/"),  # trailing '.' leaves a slash
    ("/./", "/"),
    ("/", "/"),
    ("/..", "/"),
    ("/a//b", "/a/b"),  # empty segments collapse
]


def test_rfc_matrix(spark):
    df = spark.createDataFrame(
        [(f"u{i}", p) for i, (p, _) in enumerate(CASES)],
        "url string, path string",
    )
    got = {r.url: r for r in remove_dot_segments(df).collect()}
    for i, (p, want) in enumerate(CASES):
        r = got[f"u{i}"]
        assert r.norm_path == want, (p, r.norm_path, want)
        assert r.changed == (want != p)
