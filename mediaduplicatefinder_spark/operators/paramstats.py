"""Query-parameter value-cardinality classification (E126).

E115's DUST mining proves a parameter irrelevant when byte-identical
CONTENT exists at both urls — strong evidence, but it needs the pages
fetched.  The url-only complement classifies parameters by VALUE
cardinality across a host's urls: a parameter whose value is unique
per occurrence (``sessionid=...``, cache busters, signatures) mints a
new url per request and is a canonicalization candidate BEFORE any
fetch; a parameter stuck on one value is dead weight.  E100 hardcodes
a literal session-param name list; this operator LEARNS the same
class per host from the url log.

Shape: explode params -> one exchange on (host, param) computing
occurrence and distinct-value counts -> integer cross-multiplied
verdicts.  Linear in total parameters; the per-(host, param) relation
is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PARAM_MIN_N = 5

_QUERY_RE = "^[^#?]*\\?([^#]*)"


def param_value_stats(
    urls: DataFrame, min_n: int = PARAM_MIN_N
) -> DataFrame:
    """urls(host, url) -> (host, param, n_urls, n_values,
    session_like, constant_like); params seen < min_n times report
    both flags false."""
    params = F.filter(
        F.split(F.regexp_extract("url", _QUERY_RE, 1), "&"),
        lambda p: p != "",
    )
    kv = urls.select("host", F.explode(params).alias("p")).select(
        "host",
        F.regexp_extract("p", "^([^=]*)", 1).alias("param"),
        F.regexp_extract("p", "=(.*)$", 1).alias("val"),
    )
    agg = kv.groupBy("host", "param").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("val").alias("n_values"),
    )
    enough = F.col("n_urls") >= min_n
    return agg.select(
        "host",
        "param",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("n_values").cast("long").alias("n_values"),
        (enough & (F.col("n_values") * 10 >= 9 * F.col("n_urls"))).alias(
            "session_like"
        ),
        (enough & (F.col("n_values") == 1)).alias("constant_like"),
    )


def param_value_stats_sql(urls_sql: str, min_n: int = PARAM_MIN_N) -> str:
    """DuckDB twin; ``urls_sql`` SELECTs (host, url)."""
    return f"""
WITH pvu AS ({urls_sql}),
kv AS (
  SELECT host,
         regexp_extract(p, '^([^=]*)', 1) AS param,
         regexp_extract(p, '=(.*)$', 1) AS val
  FROM (
    SELECT host,
           unnest(list_filter(
             string_split(regexp_extract(url, '{_QUERY_RE}', 1), '&'),
             x -> x <> '')) AS p
    FROM pvu
  )
),
agg AS (
  SELECT host, param,
         count(*)::BIGINT AS n_urls,
         count(DISTINCT val)::BIGINT AS n_values
  FROM kv GROUP BY host, param
)
SELECT host, param, n_urls, n_values,
       n_urls >= {min_n} AND n_values * 10 >= 9 * n_urls AS session_like,
       n_urls >= {min_n} AND n_values = 1 AS constant_like
FROM agg
"""
