"""E115 DUST rule mining (operators/dust.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.dust import dust_rules


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "host string, url string, text string")
    return {
        (r.host, r.param): r.support for r in dust_rules(df, **kw).collect()
    }


def _variants(host, n, param="utm=x"):
    rows = []
    for c in range(n):
        rows.append((host, f"http://{host}/p{c}?id={c}", f"body {c}"))
        rows.append((host, f"http://{host}/p{c}?id={c}&{param}", f"body {c}"))
    return rows


def test_rule_mined_with_support(spark):
    got = _run(spark, _variants("h", 3))
    assert got == {("h", "utm"): 3}


def test_support_counts_distinct_content_not_pairs(spark):
    # one document re-rendered many times must not reach support 3
    rows = []
    for i in range(5):
        rows.append(("h", f"http://h/p?id=1&v={i}", "same body"))
        rows.append(("h", f"http://h/p?id=1&v={i}&utm=x", "same body"))
    got = _run(spark, rows)
    assert got == {}  # 1 distinct sha -> support 1 < 3


def test_different_content_never_votes(spark):
    rows = [
        ("h", "http://h/p?id=1", "body one"),
        ("h", "http://h/p?id=1&utm=x", "DIFFERENT body"),
    ] * 3
    assert _run(spark, rows) == {}


def test_two_param_gap_is_not_a_single_rule(spark):
    rows = []
    for c in range(3):
        rows.append(("h", f"http://h/p{c}?id={c}", f"b{c}"))
        rows.append(("h", f"http://h/p{c}?id={c}&a=1&b=2", f"b{c}"))
    assert _run(spark, rows) == {}


def test_rules_are_per_host_and_path_scoped(spark):
    rows = _variants("a", 3) + _variants("b", 2)
    got = _run(spark, rows)
    assert got == {("a", "utm"): 3}  # host b has support 2 only
    # same content at DIFFERENT paths never pairs
    rows2 = [
        ("h", "http://h/p1?utm=x", "same"),
        ("h", "http://h/p2", "same"),
    ] * 3
    assert _run(spark, rows2) == {}


def test_apply_rules_collapses_variants(spark):
    from mediaduplicatefinder_spark.operators.dust import apply_dust_rules

    pages = spark.createDataFrame(
        _variants("h", 3) + [("h", "http://h/p0?id=0&ref=9", "body 0")],
        "host string, url string, text string",
    )
    rules = spark.createDataFrame([("h", "utm")], "host string, param string")
    got = {r.url: r for r in apply_dust_rules(pages, rules).collect()}
    base = got["http://h/p0?id=0"]
    variant = got["http://h/p0?id=0&utm=x"]
    assert variant.canon_url == "http://h/p0?id=0"
    assert variant.n_dropped == 1 and base.n_dropped == 0
    # family: base + utm variant collapse; the unruled ref url stays out
    assert base.family_size == 2 and variant.family_size == 2
    assert base.is_winner and not variant.is_winner
    ref = got["http://h/p0?id=0&ref=9"]
    assert ref.canon_url == "http://h/p0?id=0&ref=9" and ref.family_size == 1


def test_apply_sorts_kept_params_and_handles_paramless(spark):
    from mediaduplicatefinder_spark.operators.dust import apply_dust_rules

    pages = spark.createDataFrame(
        [
            ("h", "http://h/p?b=2&a=1", "t1"),
            ("h", "http://h/p?a=1&b=2", "t2"),
            ("h", "http://h/plain", "t3"),
        ],
        "host string, url string, text string",
    )
    rules = spark.createDataFrame([], "host string, param string")
    got = {r.url: r for r in apply_dust_rules(pages, rules).collect()}
    # param ORDER is canonicalized even with no rules
    assert got["http://h/p?b=2&a=1"].canon_url == "http://h/p?a=1&b=2"
    assert got["http://h/p?b=2&a=1"].family_size == 2
    p = got["http://h/plain"]
    assert (p.canon_url, p.n_dropped, p.family_size) == ("http://h/plain", 0, 1)


def _py_dust(rows, min_support=3):
    import hashlib
    from collections import defaultdict

    keyed = []
    for host, url, text in rows:
        path, _, q = url.partition("?")
        params = sorted(p for p in q.split("&") if p)
        sha = hashlib.sha256(text.encode()).hexdigest()
        keyed.append((host, sha, path, tuple(params)))
    votes = set()
    for h, s, p, pa in keyed:
        for h2, s2, p2, pb in keyed:
            if (h, s, p) == (h2, s2, p2) and len(pa) == len(pb) + 1 and set(
                pb
            ) <= set(pa):
                (rem,) = set(pa) - set(pb)
                votes.add((h, s, rem.split("=")[0]))
    support = defaultdict(set)
    for h, s, param in votes:
        support[(h, param)].add(s)
    return {
        k: len(v) for k, v in support.items() if len(v) >= min_support
    }


def test_seeded_fuzz_vs_python_reference(spark):
    import random

    rng = random.Random(2)
    rows = []
    for c in range(25):
        host = f"h{c % 3}"
        base_params = [f"id={c}"]
        rows.append((host, f"http://{host}/p{c}?id={c}", f"body {c}"))
        for extra in ("utm=x", f"sid=s{c}", "ref=1"):
            if rng.random() < 0.55:
                q = "&".join(sorted(base_params + [extra]))
                rows.append(
                    (host, f"http://{host}/p{c}?{q}", f"body {c}")
                )
    want = _py_dust(rows)
    got = _run(spark, rows)
    assert got == want
