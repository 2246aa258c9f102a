"""Canonical-link collapse (E98).

Webtext duplication is often DECLARED before it is detected:
``<link rel="canonical">`` (and the ``og:url`` meta fallback) lets a
page name the url that should stand for it, and CDX-style dedup
pipelines collapse on that declaration before any content hashing
runs.  This operator is that channel: extract each page's declared
canonical target, default to self when none is declared, and elect one
winner per canonical family — the target page itself when it was
crawled, else the lexicographically first member (the engine's
deterministic-order convention, exact.py).

Extraction is a deterministic literal-regex subset (the shape real
pages overwhelmingly have): double-quoted attributes, precedence
``rel-before-href`` > ``href-before-rel`` > ``og:url``, first match
wins.  One map-only projection plus ONE hash exchange on the canonical
target (window election); family skew is bounded by how many crawled
pages can declare the same target — a host-local quantity, the same
bound the LSH band caps rely on.

Reference anchor: the keeper-election semantics mirror
main_cli.cpp:333-356 (first-by-deterministic-order wins a duplicate
group); the declaration channel itself is the webtext lift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_REL_FIRST = '<link[^>]*rel="canonical"[^>]*href="([^"]*)"'
_HREF_FIRST = '<link[^>]*href="([^"]*)"[^>]*rel="canonical"'
_OG_URL = '<meta[^>]*property="og:url"[^>]*content="([^"]*)"'


def canonical_collapse(pages: DataFrame) -> DataFrame:
    """pages(url, html) -> (url, canon_target, declared, group_size,
    is_winner); winner = crawled target page else min(url)."""
    c1 = F.regexp_extract("html", _REL_FIRST, 1)
    c2 = F.regexp_extract("html", _HREF_FIRST, 1)
    c3 = F.regexp_extract("html", _OG_URL, 1)
    declared = (
        F.when(c1 != "", c1).when(c2 != "", c2).when(c3 != "", c3)
    )
    tagged = pages.select(
        "url",
        F.coalesce(declared, F.col("url")).alias("canon_target"),
        declared.isNotNull().alias("declared"),
    )
    fam = Window.partitionBy("canon_target")
    self_member = F.max(
        F.when(F.col("url") == F.col("canon_target"), F.col("url"))
    ).over(fam)
    winner = F.coalesce(self_member, F.min("url").over(fam))
    return tagged.select(
        "url",
        "canon_target",
        "declared",
        F.count(F.lit(1)).over(fam).alias("group_size"),
        (F.col("url") == winner).alias("is_winner"),
    )


def canonical_collapse_sql(pages_sql: str) -> str:
    """DuckDB twin; ``pages_sql`` SELECTs (url, html)."""
    return f"""
WITH pages AS ({pages_sql}),
tagged AS (
  SELECT url,
         CASE
           WHEN regexp_extract(html, '{_REL_FIRST}', 1) <> ''
             THEN regexp_extract(html, '{_REL_FIRST}', 1)
           WHEN regexp_extract(html, '{_HREF_FIRST}', 1) <> ''
             THEN regexp_extract(html, '{_HREF_FIRST}', 1)
           WHEN regexp_extract(html, '{_OG_URL}', 1) <> ''
             THEN regexp_extract(html, '{_OG_URL}', 1)
         END AS decl,
         url AS self_url
  FROM pages
),
fam AS (
  SELECT url,
         coalesce(decl, self_url) AS canon_target,
         decl IS NOT NULL AS declared
  FROM tagged
)
SELECT url, canon_target, declared,
       count(*) OVER (PARTITION BY canon_target) AS group_size,
       url = coalesce(
         max(CASE WHEN url = canon_target THEN url END)
           OVER (PARTITION BY canon_target),
         min(url) OVER (PARTITION BY canon_target)
       ) AS is_winner
FROM fam
"""
