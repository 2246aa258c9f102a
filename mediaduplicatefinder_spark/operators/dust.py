"""DUST rule mining (E115) — Different URLs with Similar Text.

The url-level generalization of exact dedup (Bar-Yossef et al., WWW
2007 "Do not crawl in the DUST"): when the same host serves
byte-identical content at urls differing only by a query parameter,
that parameter is content-irrelevant — and once LEARNED as a rule, the
crawler canonicalizes future urls *before* fetching, killing the whole
duplicate family at zero cost.  This operator mines the single-param
removal rules: pairs of same-(host, sha, path) urls whose param sets
differ by exactly one element vote for that parameter; a rule needs
support from >= ``min_support`` DISTINCT content items (one page
re-rendered many times must not mint a host-wide rule).

Shape: grouping key (host, sha, path) bounds the pair join to url
variants of ONE document — group sizes are tiny by construction, so
the self-join is skew-safe without caps; rule rollup is one exchange
on (host, param).  Params travel as sorted ``k=v`` arrays; the subset
test is ``array_except`` emptiness — no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DUST_MIN_SUPPORT = 3

_PATH_RE = "^([a-z]+://[^?#]*)"
_QUERY_RE = "^[^#?]*\\?([^#]*)"


def dust_rules(
    pages: DataFrame,
    min_support: int = DUST_MIN_SUPPORT,
    text_col: str = "text",
) -> DataFrame:
    """pages(host, url, text) -> (host, param, support): query params
    proven content-irrelevant on >= min_support distinct documents."""
    params = F.array_sort(
        F.filter(
            F.split(F.regexp_extract("url", _QUERY_RE, 1), "&"),
            lambda p: p != "",
        )
    )
    keyed = pages.select(
        "host",
        F.sha2(F.col(text_col), 256).alias("sha"),
        F.regexp_extract("url", _PATH_RE, 1).alias("path"),
        params.alias("params"),
    ).persist()
    a = keyed.select(
        "host", "sha", "path", F.col("params").alias("pa")
    )
    b = keyed.select(
        "host", "sha", "path", F.col("params").alias("pb")
    )
    votes = (
        a.join(b, ["host", "sha", "path"])
        .filter(
            (F.size("pa") == F.size("pb") + 1)
            & (F.size(F.array_except("pb", "pa")) == 0)
        )
        .select(
            "host",
            "sha",
            F.regexp_extract(
                F.element_at(F.array_except("pa", "pb"), 1), "^([^=]*)", 1
            ).alias("param"),
        )
        .distinct()
    )
    return (
        votes.groupBy("host", "param")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )


def apply_dust_rules(pages: DataFrame, rules: DataFrame) -> DataFrame:
    """pages(host, url, ...) x rules(host, param) -> (url, canon_url,
    n_dropped, family_size, is_winner) — urls rewritten without the
    ruled params (kept params sorted, the canonical form), then
    collapsed into families per (host, canon_url).

    Shape: explode params -> broadcast-join the tiny rule relation ->
    one url-key re-aggregation -> one family-key window.  The apply
    side is where mining pays off: the whole rewrite is two exchanges
    regardless of how many duplicate families the rules kill.
    """
    params = F.filter(
        F.split(F.regexp_extract("url", _QUERY_RE, 1), "&"),
        lambda p: p != "",
    )
    parsed = pages.select(
        "host",
        "url",
        F.regexp_extract("url", _PATH_RE, 1).alias("path"),
        F.explode_outer(params).alias("p"),
    ).withColumn("param", F.regexp_extract("p", "^([^=]*)", 1))
    flagged = parsed.join(
        F.broadcast(rules.select("host", "param", F.lit(True).alias("ruled"))),
        ["host", "param"],
        "left",
    )
    per_url = flagged.groupBy("host", "url", "path").agg(
        F.array_sort(
            F.collect_list(F.when(F.col("ruled").isNull(), F.col("p")))
        ).alias("kept"),
        F.sum(
            F.when(F.col("ruled").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("n_dropped"),
    )
    canon = F.concat(
        F.col("path"),
        F.when(
            F.size("kept") > 0,
            F.concat(F.lit("?"), F.array_join("kept", "&")),
        ).otherwise(F.lit("")),
    )
    keyed = per_url.select(
        "host", "url", "n_dropped", canon.alias("canon_url")
    )
    fam = Window.partitionBy("host", "canon_url")
    return keyed.select(
        "url",
        "canon_url",
        "n_dropped",
        F.count(F.lit(1)).over(fam).cast("long").alias("family_size"),
        (F.col("url") == F.min("url").over(fam)).alias("is_winner"),
    )


def apply_dust_rules_sql(pages_sql: str, rules_sql: str) -> str:
    """DuckDB twin; ``pages_sql`` SELECTs (host, url, ...),
    ``rules_sql`` SELECTs (host, param)."""
    return f"""
WITH adp AS ({pages_sql}),
adr AS (SELECT host, param FROM ({rules_sql})),
parsed AS (
  SELECT host, url,
         regexp_extract(url, '{_PATH_RE}', 1) AS path,
         unnest(COALESCE(NULLIF(list_filter(
           string_split(regexp_extract(url, '{_QUERY_RE}', 1), '&'),
           x -> x <> ''), []), [NULL])) AS p
  FROM adp
),
flagged AS (
  SELECT pr.host, pr.url, pr.path, pr.p,
         r.param IS NOT NULL AS ruled
  FROM (SELECT *, regexp_extract(p, '^([^=]*)', 1) AS param FROM parsed) pr
  LEFT JOIN adr r ON r.host = pr.host AND r.param = pr.param
),
per_url AS (
  SELECT host, url, path,
         list_sort(list(p) FILTER (p IS NOT NULL AND NOT ruled)) AS kept,
         sum(CASE WHEN p IS NOT NULL AND ruled THEN 1 ELSE 0 END)::BIGINT
           AS n_dropped
  FROM flagged GROUP BY host, url, path
),
keyed AS (
  SELECT host, url, n_dropped,
         path || CASE WHEN len(kept) > 0
                      THEN '?' || array_to_string(kept, '&')
                      ELSE '' END AS canon_url
  FROM per_url
)
SELECT url, canon_url, n_dropped,
       count(*) OVER (PARTITION BY host, canon_url)::BIGINT AS family_size,
       url = min(url) OVER (PARTITION BY host, canon_url) AS is_winner
FROM keyed
"""


def dust_rules_sql(
    pages_sql: str, min_support: int = DUST_MIN_SUPPORT
) -> str:
    """DuckDB twin; ``pages_sql`` SELECTs (host, url, text)."""
    return f"""
WITH dup AS ({pages_sql}),
keyed AS (
  SELECT host, sha256(text) AS sha,
         regexp_extract(url, '{_PATH_RE}', 1) AS path,
         list_sort(list_filter(
           string_split(regexp_extract(url, '{_QUERY_RE}', 1), '&'),
           p -> p <> '')) AS params
  FROM dup
),
votes AS (
  SELECT DISTINCT a.host, a.sha,
         regexp_extract(
           list_extract(list_filter(a.params,
             p -> NOT list_contains(b.params, p)), 1),
           '^([^=]*)', 1) AS param
  FROM keyed a
  JOIN keyed b
    ON a.host = b.host AND a.sha = b.sha AND a.path = b.path
   AND len(a.params) = len(b.params) + 1
   AND NOT EXISTS (
         SELECT 1 FROM unnest(b.params) AS t(p)
         WHERE NOT list_contains(a.params, p))
)
SELECT host, param, count(*)::BIGINT AS support
FROM votes
GROUP BY host, param
HAVING count(*) >= {min_support}
"""
