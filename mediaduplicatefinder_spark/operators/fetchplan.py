"""Per-url fetch planning (E121).

The last decision before bytes move: for each frontier url this wave,
DO we fetch, and how?  Composes the session's control channels —
robots permission (E95), trap scoring (E100), the validators a
previous crawl stored (E118's ETag/Last-Modified), and the host's
recrawl tier (E110) — into one action column:

    skip         disallowed by robots, or trap-scored
    conditional  validators exist (If-None-Match/If-Modified-Since —
                 a 304 costs headers, not bytes)
    full         everything else

plus the tier rank the scheduler sorts waves by.  This is the
fetch-side mirror of E56's crawl_to_training: every stage verdict on
one row per url.

Shape: all four inputs join on url or host keys; robots/trap are
map-only + one rule join; the plan itself adds two hash joins and no
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.trapurl import trap_url_scores
from mediaduplicatefinder_spark.operators.robots import evaluate_urls

TIER_RANK = (("hot", 1), ("warm", 2), ("cold", 3))


def plan_fetches(
    urls: DataFrame,
    prior: DataFrame,
    rules: DataFrame,
    schedule: DataFrame,
) -> DataFrame:
    """urls(host, path, url) x prior(url, etag, last_modified) x
    rules(host, rule_path, is_allow) x schedule(host, tier) ->
    (url, host, allowed, is_trap, has_validators, action, tier_rank).
    """
    perm = evaluate_urls(urls.select("host", "path"), rules).select(
        "host", "path", "allowed"
    )
    trap = trap_url_scores(urls.select("url")).select("url", "is_trap")
    val = prior.select(
        "url",
        (
            F.coalesce(F.col("etag"), F.col("last_modified")).isNotNull()
        ).alias("has_validators"),
    )
    rank = None
    for name, r in TIER_RANK:
        c = F.when(F.col("tier") == name, F.lit(r))
        rank = c if rank is None else rank.when(F.col("tier") == name, F.lit(r))
    sched = schedule.select("host", rank.otherwise(F.lit(3)).alias("tier_rank"))
    j = (
        urls.join(perm, ["host", "path"])
        .join(trap, "url")
        .join(val, "url", "left")
        .join(sched, "host", "left")
    )
    hv = F.coalesce("has_validators", F.lit(False))
    action = (
        F.when(~F.col("allowed") | F.col("is_trap"), F.lit("skip"))
        .when(hv, F.lit("conditional"))
        .otherwise(F.lit("full"))
    )
    return j.select(
        "url",
        "host",
        "allowed",
        "is_trap",
        hv.alias("has_validators"),
        action.alias("action"),
        F.coalesce("tier_rank", F.lit(3)).cast("long").alias("tier_rank"),
    )


def plan_fetches_sql(
    urls_sql: str, prior_sql: str, robots_eval_subquery: str,
    schedule_sql: str,
) -> str:
    """DuckDB twin.  ``urls_sql`` SELECTs (host, path, url);
    ``prior_sql`` (url, etag, last_modified);
    ``robots_eval_subquery`` a full E95-twin SELECT of (host, path,
    allowed); ``schedule_sql`` (host, tier)."""
    from mediaduplicatefinder_spark.functions.trapurl import (
        trap_url_scores_sql,
    )

    rank = " ".join(f"WHEN '{n}' THEN {r}" for n, r in TIER_RANK)
    return f"""
WITH fpu AS ({urls_sql}),
perm AS (SELECT host, path, allowed FROM ({robots_eval_subquery})),
trap AS (
  SELECT url, is_trap
  FROM ({trap_url_scores_sql("SELECT url FROM fpu")})
),
val AS (
  SELECT url,
         coalesce(etag, last_modified) IS NOT NULL AS has_validators
  FROM ({prior_sql})
),
sched AS (
  SELECT host,
         (CASE tier {rank} ELSE 3 END)::BIGINT AS tier_rank
  FROM ({schedule_sql})
)
SELECT u.url, u.host, p.allowed, t.is_trap,
       coalesce(v.has_validators, FALSE) AS has_validators,
       CASE WHEN NOT p.allowed OR t.is_trap THEN 'skip'
            WHEN coalesce(v.has_validators, FALSE) THEN 'conditional'
            ELSE 'full' END AS action,
       coalesce(s.tier_rank, 3)::BIGINT AS tier_rank
FROM fpu u
JOIN perm p ON p.host = u.host AND p.path = u.path
JOIN trap t ON t.url = u.url
LEFT JOIN val v ON v.url = u.url
LEFT JOIN sched s ON s.host = u.host
"""
