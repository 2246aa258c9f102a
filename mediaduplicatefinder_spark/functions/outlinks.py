"""Per-page outlink profiling and link-farm scoring (E111).

Link spam is a duplication phenomenon: farms mint thousands of
near-identical pages whose payload is the LINK BLOCK, not the prose —
so the outlink profile (how many links, how many leave the host, how
many are nofollow) is both a spam gate and a routing signal for the
PageRank channel (E77 weights hosts; a farm page should not vote).

Entirely array expressions over the anchor tags — one map-only
projection, no explode (counts come from filtered array sizes), in
whole-stage codegen next to the other url gates (E37/E61/E100).
Internal vs external is a host compare between the page url and each
absolute href; relative hrefs count as internal.  The farm flag is
the standard shape: many links, almost all external, low prose-to-
link ratio — integer cross-multiplies only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_A_TAG_RE = "<a [^>]*>"
_HREF_IN_TAG_RE = 'href="([^"]*)"'
_HOST_RE = "^[a-z]+://([^/?#]+)"

FARM_MIN_LINKS = 20
FARM_EXT_PCT = 90


def outlink_profile(pages: DataFrame) -> DataFrame:
    """pages(url, html) -> (url, n_links, n_external, n_internal,
    n_nofollow, is_link_farm)."""
    my_host = F.regexp_extract("url", _HOST_RE, 1)
    tags = F.regexp_extract_all(F.col("html"), F.lit(_A_TAG_RE), F.lit(0))
    hrefs = F.transform(
        tags, lambda t: F.regexp_extract(t, _HREF_IN_TAG_RE, 1)
    )
    n_links = F.size(tags)
    ext_host = lambda h: F.regexp_extract(h, _HOST_RE, 1)  # noqa: E731
    n_external = F.size(
        F.filter(
            hrefs,
            lambda h: (ext_host(h) != "") & (ext_host(h) != my_host),
        )
    )
    n_nofollow = F.size(
        F.filter(tags, lambda t: t.contains('rel="nofollow"'))
    )
    farm = (n_links >= FARM_MIN_LINKS) & (
        n_external * 100 >= F.lit(FARM_EXT_PCT) * n_links
    )
    return pages.select(
        "url",
        n_links.cast("long").alias("n_links"),
        n_external.cast("long").alias("n_external"),
        (n_links - n_external).cast("long").alias("n_internal"),
        n_nofollow.cast("long").alias("n_nofollow"),
        farm.alias("is_link_farm"),
    )


def outlink_profile_sql(pages_sql: str) -> str:
    """DuckDB twin; ``pages_sql`` SELECTs (url, html)."""
    return f"""
WITH opages AS ({pages_sql}),
prof AS (
  SELECT url,
         regexp_extract(url, '{_HOST_RE}', 1) AS my_host,
         regexp_extract_all(html, '{_A_TAG_RE}', 0) AS tags
  FROM opages
),
counted AS (
  SELECT url,
         len(tags)::BIGINT AS n_links,
         len(list_filter(
           list_transform(tags,
             t -> regexp_extract(regexp_extract(t, '{_HREF_IN_TAG_RE}', 1),
                                 '{_HOST_RE}', 1)),
           h -> h <> '' AND h <> my_host))::BIGINT AS n_external,
         len(list_filter(tags, t -> contains(t, 'rel="nofollow"')))::BIGINT
           AS n_nofollow
  FROM prof
)
SELECT url, n_links, n_external,
       (n_links - n_external)::BIGINT AS n_internal,
       n_nofollow,
       n_links >= {FARM_MIN_LINKS}
         AND n_external * 100 >= {FARM_EXT_PCT} * n_links AS is_link_farm
FROM counted
"""
