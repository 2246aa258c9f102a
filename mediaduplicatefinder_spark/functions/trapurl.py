"""Spider-trap URL scoring (E100).

A crawl frontier must score urls for trap risk BEFORE fetching:
calendar traps and rewrite loops mint unbounded url spaces whose pages
are near-duplicates of each other (they then flood the dedup stages —
cheaper to not fetch them).  Classic signals, all computable from the
url string alone: repeated path segments (``/cal/2026/cal/2026/...``),
excessive depth, session-id query parameters (each session mints a
distinct url for identical content — a pure duplication channel), and
parameter/path bloat.

Integer score, literal weights, map-only whole-stage codegen — at
frontier scale this runs inside the same projection as E37/E61.
Duplicate-segment counting is set-based (``depth - n_distinct``), not
a nested-lambda multiplicity scan, so the expression stays flat in
both engines.

Reference anchor: the reference prefilters by cheap metadata before
any content work (size ratio, main_cli.cpp:297-305); this is the url
analog of that gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SESSION_PARAMS = ("sessionid", "sid", "phpsessid", "jsessionid", "sess")
TRAP_THRESHOLD = 5

_HOST_RE = "^[a-z]+://([^/?#]+)"
_PATH_RE = "^[a-z]+://[^/?#]+([^?#]*)"
# the '?' must sit BEFORE any '#' — '[^#?]*' anchors to the FIRST
# pre-fragment '?', so '#frag?x=1' contributes no query params
_QUERY_RE = "^[^#?]*\\?([^#]*)"


def _nonempty(arr: Column) -> Column:
    return F.filter(arr, lambda x: x != "")


def trap_url_scores(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """urls(url, ...) -> url + (host, depth, dup_segs, n_params,
    n_session, trap_score, is_trap)."""
    u = F.col(url_col)
    host = F.regexp_extract(u, _HOST_RE, 1)
    path = F.regexp_extract(u, _PATH_RE, 1)
    query = F.regexp_extract(u, _QUERY_RE, 1)
    segs = _nonempty(F.split(path, "/"))
    depth = F.size(segs)
    dup_segs = depth - F.size(F.array_distinct(segs))
    params = _nonempty(F.split(query, "&"))
    n_params = F.size(params)
    pname = lambda p: F.lower(  # noqa: E731
        F.regexp_extract(p, "^([^=]*)", 1)
    )
    n_session = F.size(
        F.filter(
            params,
            lambda p: pname(p).isin(*[F.lit(s) for s in SESSION_PARAMS]),
        )
    )
    score = (
        F.lit(3) * dup_segs
        + F.lit(2) * F.greatest(depth - F.lit(6), F.lit(0))
        + F.lit(4) * n_session
        + F.when(n_params > 5, F.lit(2)).otherwise(F.lit(0))
        + F.when(F.length(path) > 120, F.lit(2)).otherwise(F.lit(0))
    )
    return urls.select(
        url_col,
        host.alias("host"),
        depth.cast("long").alias("depth"),
        dup_segs.cast("long").alias("dup_segs"),
        n_params.cast("long").alias("n_params"),
        n_session.cast("long").alias("n_session"),
        score.cast("long").alias("trap_score"),
        (score >= TRAP_THRESHOLD).alias("is_trap"),
    )


def trap_url_scores_sql(urls_sql: str) -> str:
    """DuckDB twin; ``urls_sql`` SELECTs (url)."""
    in_list = ", ".join(f"'{s}'" for s in SESSION_PARAMS)
    return f"""
WITH turls AS ({urls_sql}),
parts AS (
  SELECT url,
         regexp_extract(url, '{_HOST_RE}', 1) AS host,
         list_filter(string_split(
           regexp_extract(url, '{_PATH_RE}', 1), '/'), x -> x <> '')
           AS segs,
         list_filter(string_split(
           regexp_extract(url, '{_QUERY_RE}', 1), '&'), x -> x <> '')
           AS params
  FROM turls
),
sig AS (
  SELECT url, host,
         len(segs)::BIGINT AS depth,
         (len(segs) - len(list_distinct(segs)))::BIGINT AS dup_segs,
         len(params)::BIGINT AS n_params,
         len(list_filter(params,
             p -> lower(regexp_extract(p, '^([^=]*)', 1)) IN ({in_list})))
           ::BIGINT AS n_session,
         len(regexp_extract(url, '{_PATH_RE}', 1)) AS path_len
  FROM parts
)
SELECT url, host, depth, dup_segs, n_params, n_session,
       (3 * dup_segs + 2 * greatest(depth - 6, 0) + 4 * n_session
        + CASE WHEN n_params > 5 THEN 2 ELSE 0 END
        + CASE WHEN path_len > 120 THEN 2 ELSE 0 END)::BIGINT AS trap_score,
       (3 * dup_segs + 2 * greatest(depth - 6, 0) + 4 * n_session
        + CASE WHEN n_params > 5 THEN 2 ELSE 0 END
        + CASE WHEN path_len > 120 THEN 2 ELSE 0 END)
         >= {TRAP_THRESHOLD} AS is_trap
FROM sig
"""
