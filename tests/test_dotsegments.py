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


def _py_rfc(path):
    stack = []
    for seg in path.split("/"):
        if seg in ("", "."):
            continue
        if seg == "..":
            if stack:
                stack.pop()
        else:
            stack.append(seg)
    trailing = path.endswith(("/", "/.", "/..")) and bool(stack)
    return "/" + "/".join(stack) + ("/" if trailing else "")


def test_seeded_fuzz_vs_python_reference(spark):
    import random

    rng = random.Random(0)
    alphabet = ["a", "bb", "c9", ".", "..", ""]
    paths = [
        "/" + "/".join(rng.choice(alphabet) for _ in range(rng.randint(0, 8)))
        for _ in range(120)
    ]
    df = spark.createDataFrame(
        [(f"u{i}", p) for i, p in enumerate(paths)], "url string, path string"
    )
    got = {r.url: r.norm_path for r in remove_dot_segments(df).collect()}
    for i, p in enumerate(paths):
        assert got[f"u{i}"] == _py_rfc(p), (p, got[f"u{i}"], _py_rfc(p))
