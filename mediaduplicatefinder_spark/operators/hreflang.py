"""hreflang translation families (E102).

The second DECLARED-relationship channel next to ``rel=canonical``
(E98): pages list their language alternates via
``<link rel="alternate" hreflang=".." href="..">``, and the declared
edges connect a TRANSLATION FAMILY.  A dedup pipeline needs these
families for the opposite reason it needs canonical families — members
are intentional variants that must NOT be collapsed by near-dup
channels (shared templates + numbers make translations collide in
SimHash), and training-data pipelines mine them as parallel corpora.

Declarations are edges, families are connected components — the same
min-label CC operator the dedup clusters use (clustering.py), so an
asymmetric declaration (only the English page lists its alternates)
still connects the whole family.  Extraction is the literal-attribute
deterministic subset (fixed ``rel, hreflang, href`` order, double
quotes); self-references (x-default to self) contribute their label to
the family's language count but no edge.

Shape: map-only tag explode, one distinct on canonical edge pairs,
the O(log n) CC loop, then two co-partitioned family rollups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG, EngineConfig
from mediaduplicatefinder_spark.operators.clustering import (
    connected_components,
)

_TAG_RE = '<link rel="alternate" hreflang="[^"]*" href="[^"]*"[^>]*>'
_LANG_RE = 'hreflang="([^"]*)"'
_HREF_RE = 'href="([^"]*)"'


def hreflang_families(
    pages: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """pages(url, html) -> (url, family_id, family_size, n_langs);
    only urls connected to at least one alternate appear."""
    tags = F.regexp_extract_all(F.col("html"), F.lit(_TAG_RE), F.lit(0))
    decl = (
        pages.select("url", F.explode(tags).alias("t"))
        .select(
            "url",
            F.regexp_extract("t", _LANG_RE, 1).alias("hreflang"),
            F.regexp_extract("t", _HREF_RE, 1).alias("href"),
        )
        .filter(F.col("href") != "")
        .persist()  # feeds the edge list AND the language rollup
    )
    edges = (
        decl.filter(F.col("url") != F.col("href"))
        .select(
            F.least("url", "href").alias("url_a"),
            F.greatest("url", "href").alias("url_b"),
        )
        .distinct()
    )
    labels = connected_components(edges, cfg).withColumnRenamed(
        "cluster_id", "family_id"
    )
    fam = labels.groupBy("family_id").agg(
        F.count(F.lit(1)).alias("family_size")
    )
    langs = (
        decl.join(labels, "url")
        .groupBy("family_id")
        .agg(F.countDistinct("hreflang").alias("n_langs"))
    )
    return (
        labels.join(fam, "family_id")
        .join(langs, "family_id")
        .select("url", "family_id", "family_size", "n_langs")
    )


def hreflang_families_sql(pages_sql: str) -> str:
    """DuckDB twin — recursive-CTE min-label components;
    ``pages_sql`` SELECTs (url, html)."""
    return f"""
WITH RECURSIVE hpages AS ({pages_sql}),
htags AS (
  SELECT url, unnest(regexp_extract_all(html, '{_TAG_RE}', 0)) AS t
  FROM hpages
),
decl AS (
  SELECT url,
         regexp_extract(t, '{_LANG_RE}', 1) AS hreflang,
         regexp_extract(t, '{_HREF_RE}', 1) AS href
  FROM htags
  WHERE regexp_extract(t, '{_HREF_RE}', 1) <> ''
),
hedges AS (
  SELECT DISTINCT least(url, href) AS a, greatest(url, href) AS b
  FROM decl WHERE url <> href
),
hsym AS (
  SELECT a AS src, b AS dst FROM hedges
  UNION ALL
  SELECT b, a FROM hedges
),
hnodes AS (SELECT DISTINCT src AS url FROM hsym),
walk(url, label) AS (
  SELECT url, url FROM hnodes
  UNION
  SELECT s.dst, w.label FROM walk w JOIN hsym s ON s.src = w.url
),
hlabels AS (SELECT url, min(label) AS family_id FROM walk GROUP BY url),
hfam AS (
  SELECT family_id, count(*)::BIGINT AS family_size
  FROM hlabels GROUP BY family_id
),
hlangs AS (
  SELECT l.family_id, count(DISTINCT d.hreflang)::BIGINT AS n_langs
  FROM decl d JOIN hlabels l ON l.url = d.url
  GROUP BY l.family_id
)
SELECT l.url, l.family_id, f.family_size, g.n_langs
FROM hlabels l
JOIN hfam f USING (family_id)
JOIN hlangs g USING (family_id)
"""
