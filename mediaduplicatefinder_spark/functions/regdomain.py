"""Registrable-domain extraction (E113, public-suffix-lite).

Host-level rollups (E65/E83/E106/E112) group by hostname, but policy
lives at the REGISTRABLE domain: ``en.blog.example.co.uk`` and
``shop.example.co.uk`` are one owner, and a blocklist entry for
``example.co.uk`` must catch both.  The full public-suffix list is a
data file; the deterministic subset here implements its lookup rule —
take the last two labels, or three when the two-label tail is itself a
public suffix (``co.uk`` et al.) — over a literal suffix table both
engines share.  This is the eTLD+1 rule every crawl stack applies
before quota/blocklist decisions.

Map-only: split, negative-index label pulls, one CASE.  Hosts with a
single label (intranet names) pass through unchanged with an empty
suffix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# two-label public suffixes (subset of the PSL); everything else uses
# the one-label rule
MULTI_SUFFIXES = (
    "co.uk",
    "org.uk",
    "ac.uk",
    "gov.uk",
    "com.au",
    "net.au",
    "org.au",
    "co.jp",
    "ne.jp",
    "com.br",
    "co.in",
    "com.cn",
)

_HOST_RE = "^[a-z]+://([^/?#]+)"


def registrable_domains(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """urls(url, ...) -> (url, host, reg_domain, public_suffix,
    n_labels)."""
    host = F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    labels = F.split(host, "\\.")
    n = F.size(labels)
    # try_element_at: out-of-range label pulls must yield NULL, not an
    # ANSI INVALID_ARRAY_INDEX error (single-label intranet hosts)
    l1 = F.element_at(labels, -1)
    l2 = F.try_element_at(labels, F.lit(-2))
    l3 = F.try_element_at(labels, F.lit(-3))
    tail2 = F.concat_ws(".", l2, l1)
    is_multi = tail2.isin(*MULTI_SUFFIXES)
    reg = (
        F.when(n < 2, host)
        .when(is_multi & (n >= 3), F.concat_ws(".", l3, l2, l1))
        .otherwise(tail2)
    )
    suffix = (
        F.when(n < 2, F.lit(""))
        .when(is_multi, tail2)
        .otherwise(l1)
    )
    return urls.select(
        url_col,
        host.alias("host"),
        reg.alias("reg_domain"),
        suffix.alias("public_suffix"),
        n.cast("long").alias("n_labels"),
    )


def registrable_domains_sql(urls_sql: str) -> str:
    """DuckDB twin; ``urls_sql`` SELECTs (url)."""
    multi = ", ".join(f"'{s}'" for s in MULTI_SUFFIXES)
    return f"""
WITH rdu AS ({urls_sql}),
lab AS (
  SELECT url,
         lower(regexp_extract(url, '{_HOST_RE}', 1)) AS host,
         string_split(lower(regexp_extract(url, '{_HOST_RE}', 1)), '.')
           AS labels
  FROM rdu
),
parts AS (
  SELECT url, host, len(labels)::BIGINT AS n,
         labels[-1] AS l1, labels[-2] AS l2, labels[-3] AS l3
  FROM lab
)
SELECT url, host,
       CASE WHEN n < 2 THEN host
            WHEN (l2 || '.' || l1) IN ({multi}) AND n >= 3
              THEN l3 || '.' || l2 || '.' || l1
            ELSE l2 || '.' || l1 END AS reg_domain,
       CASE WHEN n < 2 THEN ''
            WHEN (l2 || '.' || l1) IN ({multi}) THEN l2 || '.' || l1
            ELSE l1 END AS public_suffix,
       n AS n_labels
FROM parts
"""
