"""E106 per-host health rollup (operators/hosthealth.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.hosthealth import host_health

FOOTER = "footer nav menu copyright contact"


def _prose(i):
    # per-page-unique tokens so content shingles never become template
    return " ".join(f"w{i}x{k}" for k in range(20))


def _page(host, i, *, text=None, url=None, html="<html></html>"):
    return (
        host,
        i,
        url or f"http://{host}/p{i}",
        text if text is not None else f"{_prose(i)} {FOOTER}",
        html,
    )


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "host string, doc_id long, url string, text string, html string"
    )
    return {r.host: r for r in host_health(df).collect()}


def test_channel_counts(spark):
    rows = [
        _page("h", 1),
        _page("h", 2),
        _page("h", 3, text=FOOTER),  # pure boilerplate -> heavy
        _page(
            "h",
            4,
            text="error 404 page not found it does not exist",
        ),  # soft404 (2 phrases)
        _page("h", 5, url="http://h/cal/cal/x?sid=1"),  # trap url
        _page(
            "h",
            6,
            html='<link rel="canonical" href="http://h/p1">',
        ),  # dup loser (p1 crawled)
    ]
    r = _run(spark, rows)["h"]
    assert r.n_pages == 6
    assert r.n_boiler == 1
    assert r.n_soft404 == 1
    assert r.n_trap == 1
    assert r.n_dup_losers == 1
    # penalty = 2*1 + 1 + 1 + 1 = 5; 5*5 > 6 -> unhealthy
    assert r.penalty == 5 and not r.healthy


def test_clean_host_is_healthy(spark):
    rows = [_page("ok", i) for i in range(1, 11)]
    r = _run(spark, rows)["ok"]
    assert (r.penalty, r.healthy) == (0, True)


def test_healthy_boundary(spark):
    # 1 soft404 in 5 pages: penalty 1, 1*5 <= 5 -> still healthy
    rows = [_page("h", i) for i in range(1, 5)] + [
        _page("h", 5, text="error 404 page not found it does not exist")
    ]
    r = _run(spark, rows)["h"]
    assert r.penalty == 1 and r.healthy
    # 1 soft404 in 4 pages: 5 > 4 -> unhealthy
    rows2 = [_page("g", i) for i in range(1, 4)] + [
        _page("g", 4, text="error 404 page not found it does not exist")
    ]
    r2 = _run(spark, rows2)["g"]
    assert r2.penalty == 1 and not r2.healthy
