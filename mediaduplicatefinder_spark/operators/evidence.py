"""Duplicate-evidence localization (E154): for every verified
near-dup pair, WHERE the overlap lives — the audit answer to "why was
this pair flagged", which a removal pipeline owes its operators before
it deletes at 10^12-document scale (MOSS shows matched regions for the
same reason; the reference shows the user both files side by side,
duplicate_gui.py preview pane — this is that affordance as a relation).

Method: the winnowing guarantee (SIGMOD'03) — any shared substring of
length >= w+k-1 in the normalized text contributes at least one COMMON
selected fingerprint — so the shared-fingerprint positions localize
the duplicated regions without re-reading either document:

    (url_a, url_b, n_shared_fps,
     a_start, a_end, b_start, b_end)   -- 1-based k-gram positions in
                                       -- each side's normalized text

``n_shared_fps = 0`` with -1 spans is a legitimate outcome (verified
pairs share token SETS; a short doc can verify while sharing no
selected window minimum) and is exactly the row an auditor wants to
see flagged.

Scale shape: per-side position relations aggregate to one row per
(pair, fingerprint) BEFORE the sides meet, so repeated values never
cross-multiply positions; the side joins are hash joins keyed by the
pair's own url; everything downstream of the fingerprint pass is
O(pairs x fingerprints-per-doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dup_evidence(pairs: DataFrame, fp_pos: DataFrame) -> DataFrame:
    """pairs(url_a, url_b) x fp_pos(url, fingerprint, pos) -> one row
    per pair with shared-fingerprint count and min/max position spans
    on both sides (sentinels 0 / -1 when nothing is shared)."""
    p = pairs.select("url_a", "url_b")
    fa = (
        p.join(fp_pos.withColumnRenamed("url", "url_a"), "url_a")
        .groupBy("url_a", "url_b", "fingerprint")
        .agg(F.min("pos").alias("pa_min"), F.max("pos").alias("pa_max"))
    )
    fb = (
        p.join(fp_pos.withColumnRenamed("url", "url_b"), "url_b")
        .groupBy("url_a", "url_b", "fingerprint")
        .agg(F.min("pos").alias("pb_min"), F.max("pos").alias("pb_max"))
    )
    shared = fa.join(fb, ["url_a", "url_b", "fingerprint"]).groupBy(
        "url_a", "url_b"
    ).agg(
        F.count(F.lit(1)).alias("n_shared_fps"),
        F.min("pa_min").alias("a_start"),
        F.max("pa_max").alias("a_end"),
        F.min("pb_min").alias("b_start"),
        F.max("pb_max").alias("b_end"),
    )
    return p.join(shared, ["url_a", "url_b"], "left").select(
        "url_a",
        "url_b",
        F.coalesce("n_shared_fps", F.lit(0)).alias("n_shared_fps"),
        F.coalesce("a_start", F.lit(-1)).alias("a_start"),
        F.coalesce("a_end", F.lit(-1)).alias("a_end"),
        F.coalesce("b_start", F.lit(-1)).alias("b_start"),
        F.coalesce("b_end", F.lit(-1)).alias("b_end"),
    )


def winnow_pos_ctes(k: int, w: int) -> str:
    """CTE chain ``wgrams -> wh -> wk -> wsel -> wpos`` computing the
    selected (url, fingerprint, pos) rows from a CTE ``wnorm(url, s)``
    — the position-carrying twin of oracle/lsh_sql.winnow_fp_ctes
    (same packed (hash, 2^32-1-pos) HUGEINT key; DISTINCT keys ARE
    distinct positions)."""
    from mediaduplicatefinder_spark.oracle.lsh_sql import winnow_horner

    return f"""
wgrams AS (
  SELECT url, p, substr(s, p, {k}) AS g
  FROM wnorm, unnest(range(1, length(s) - {k} + 2)) AS t(p)
  WHERE length(s) >= {k}
),
wh AS (
  SELECT url, p, {winnow_horner(k)} AS hv,
         count(*) OVER (PARTITION BY url) AS nh
  FROM wgrams
),
wk AS (
  SELECT url, p, nh,
         (hv * 4294967296::HUGEINT + (4294967295 - p)) AS key
  FROM wh
),
wsel AS (
  SELECT DISTINCT url, mk AS key FROM (
    SELECT url, nh,
           min(key) OVER (PARTITION BY url ORDER BY p
                          ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
             AS mk,
           count(*) OVER (PARTITION BY url ORDER BY p
                          ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
             AS wn
    FROM wk
  ) WHERE nh > {w} AND wn = {w}
  UNION
  SELECT url, min(key) FROM wk WHERE nh <= {w} GROUP BY url
),
wpos AS (
  SELECT url, (key // 4294967296::HUGEINT)::BIGINT AS fingerprint,
         (4294967295 - (key % 4294967296::HUGEINT))::BIGINT AS pos
  FROM wsel
)"""


def dup_evidence_tail_sql(
    k: int, w: int, wnorm_sql: str, threshold: float = 0.6
) -> str:
    """SQL fragment appended after oracle/lsh_sql.lsh_base_cte: the
    verified-pair relation joined to the winnow position relation by
    the same two-sided pre-aggregated algebra."""
    return f""",
wnorm AS MATERIALIZED ({wnorm_sql}),{winnow_pos_ctes(k, w)},
epairs AS (SELECT url_a, url_b FROM jac WHERE jaccard > {threshold}),
efa AS (
  SELECT p.url_a, p.url_b, f.fingerprint,
         min(f.pos) AS pa_min, max(f.pos) AS pa_max
  FROM epairs p JOIN wpos f ON f.url = p.url_a
  GROUP BY p.url_a, p.url_b, f.fingerprint
),
efb AS (
  SELECT p.url_a, p.url_b, f.fingerprint,
         min(f.pos) AS pb_min, max(f.pos) AS pb_max
  FROM epairs p JOIN wpos f ON f.url = p.url_b
  GROUP BY p.url_a, p.url_b, f.fingerprint
),
eshared AS (
  SELECT a.url_a, a.url_b,
         CAST(count(*) AS BIGINT) AS n_shared_fps,
         CAST(min(a.pa_min) AS BIGINT) AS a_start,
         CAST(max(a.pa_max) AS BIGINT) AS a_end,
         CAST(min(b.pb_min) AS BIGINT) AS b_start,
         CAST(max(b.pb_max) AS BIGINT) AS b_end
  FROM efa a
  JOIN efb b ON b.url_a = a.url_a AND b.url_b = a.url_b
            AND b.fingerprint = a.fingerprint
  GROUP BY a.url_a, a.url_b
)
SELECT p.url_a, p.url_b,
       COALESCE(s.n_shared_fps, 0) AS n_shared_fps,
       COALESCE(s.a_start, -1) AS a_start,
       COALESCE(s.a_end, -1) AS a_end,
       COALESCE(s.b_start, -1) AS b_start,
       COALESCE(s.b_end, -1) AS b_end
FROM epairs p
LEFT JOIN eshared s ON s.url_a = p.url_a AND s.url_b = p.url_b"""
