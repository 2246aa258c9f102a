"""RFC 3986 dot-segment removal (E123).

The one canonicalization rule E37 deliberately deferred ("needs a
stack"): ``/a/./b/../c`` and ``/a/c`` are the same resource, and
servers resolve them identically — so url-keyed dedup that skips this
rule splits families and the trap scorer (E100) over-counts depth.
The stack IS expressible relationally: a left fold over the path
segments (``F.aggregate`` — push normal segments, pop on ``..``,
skip ``.``/empty), which keeps the whole operator in one map-side
projection; the twin replays the SAME fold as a per-segment recursive
CTE carrying the stack as a LIST column — agreement proves the fold
against a step-at-a-time evaluation.

Semantics (RFC 3986 §5.2.4 for absolute paths): ``..`` at root is
dropped; a trailing ``/``, ``/.`` or ``/..`` leaves a trailing slash;
the empty path resolves to ``/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def remove_dot_segments(
    urls: DataFrame, path_col: str = "path"
) -> DataFrame:
    """urls(url, path) -> (url, path, norm_path, changed)."""
    p = F.col(path_col)
    segs = F.split(p, "/")
    stack = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: F.when((s == "") | (s == "."), acc)
        .when(
            s == "..",
            F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))),
        )
        .otherwise(F.concat(acc, F.array(s))),
    )
    trailing = p.rlike("(/|/\\.|/\\.\\.)$") & (F.size(stack) > 0)
    norm = F.concat(
        F.lit("/"),
        F.array_join(stack, "/"),
        F.when(trailing, F.lit("/")).otherwise(F.lit("")),
    )
    return urls.select(
        "url",
        path_col,
        norm.alias("norm_path"),
        (norm != p).alias("changed"),
    )


def remove_dot_segments_sql(urls_sql: str) -> str:
    """DuckDB twin — per-segment recursive walk with a LIST stack;
    ``urls_sql`` SELECTs (url, path)."""
    return f"""
WITH RECURSIVE dsu AS ({urls_sql}),
dseg AS (SELECT url, path, string_split(path, '/') AS ss FROM dsu),
walk(url, i, st) AS (
  SELECT url, 0, []::VARCHAR[] FROM dseg
  UNION ALL
  SELECT w.url, w.i + 1,
         CASE
           WHEN s.ss[w.i + 1] IN ('', '.') THEN w.st
           WHEN s.ss[w.i + 1] = '..'
             THEN w.st[1:greatest(len(w.st) - 1, 0)]
           ELSE list_append(w.st, s.ss[w.i + 1])
         END
  FROM walk w JOIN dseg s USING (url)
  WHERE w.i < len(s.ss)
),
done AS (
  SELECT w.url, w.st
  FROM walk w JOIN dseg s USING (url)
  WHERE w.i = len(s.ss)
),
built AS (
  SELECT d.url, s.path,
         -- DuckDB 1.0: array_to_string([]) is NULL, Spark's '' —
         -- coalesce to keep the root path '/'
         '/' || coalesce(array_to_string(d.st, '/'), '')
         || CASE WHEN regexp_matches(s.path, '(/|/\\.|/\\.\\.)$')
                      AND len(d.st) > 0
                 THEN '/' ELSE '' END AS norm_path
  FROM done d JOIN dseg s USING (url)
)
SELECT url, path, norm_path, norm_path <> path AS changed
FROM built
"""
