"""RSS/Atom feed extraction (E124).

The fourth discovery channel next to sitemaps (E97), anchors and
canonical targets (E104): feeds enumerate a host's NEW urls with
publish timestamps — the freshest seeds a frontier gets, and the ones
recrawl scheduling (E110) trusts most.  Two syntaxes dominate: RSS
``<item><link>URL</link><pubDate>..</pubDate></item>`` and Atom
``<entry><link href="URL"/><published>..</published></entry>``.

Deterministic subset (the E97 discipline): lazy block explode per
``<item>``/``<entry>``, literal tag pulls, first occurrence per block
wins, blocks without a url dropped, timestamps kept as raw strings
(scheduler semantics stay downstream).  Map-only, whole-stage
codegen; the output shape matches E97's seeds so the two channels
union directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ITEM_RE = "<item>(.*?)</item>"
_ENTRY_RE = "<entry>(.*?)</entry>"
_RSS_LINK_RE = "<link>([^<]*)</link>"
_ATOM_LINK_RE = '<link[^>]*href="([^"]*)"'
_RSS_DATE_RE = "<pubDate>([^<]*)</pubDate>"
_ATOM_DATE_RE = "<published>([^<]*)</published>"


def extract_feed_urls(feeds: DataFrame) -> DataFrame:
    """feeds(host, payload) -> (host, loc, published, fmt); fmt is
    'rss' or 'atom'; blocks without a url are dropped."""
    rss_blocks = F.regexp_extract_all(
        F.col("payload"), F.lit(_ITEM_RE), F.lit(1)
    )
    atom_blocks = F.regexp_extract_all(
        F.col("payload"), F.lit(_ENTRY_RE), F.lit(1)
    )

    def channel(blocks, link_re, date_re, fmt):
        b = feeds.select("host", F.explode(blocks).alias("b"))
        loc = F.regexp_extract("b", link_re, 1)
        pub = F.regexp_extract("b", date_re, 1)
        return b.select(
            "host",
            loc.alias("loc"),
            F.when(pub != "", pub).alias("published"),
            F.lit(fmt).alias("fmt"),
        ).filter(F.col("loc") != "")

    return channel(rss_blocks, _RSS_LINK_RE, _RSS_DATE_RE, "rss").unionByName(
        channel(atom_blocks, _ATOM_LINK_RE, _ATOM_DATE_RE, "atom")
    )


def extract_feed_urls_sql(feeds_sql: str) -> str:
    """DuckDB twin; ``feeds_sql`` SELECTs (host, payload)."""

    def channel(block_re, link_re, date_re, fmt):
        return f"""
  SELECT host,
         regexp_extract(b, '{link_re}', 1) AS loc,
         CASE WHEN regexp_extract(b, '{date_re}', 1) <> ''
              THEN regexp_extract(b, '{date_re}', 1) END AS published,
         '{fmt}' AS fmt
  FROM (
    SELECT host, unnest(regexp_extract_all(payload, '{block_re}', 1)) AS b
    FROM fsrc
  )
  WHERE regexp_extract(b, '{link_re}', 1) <> ''"""

    return f"""
WITH fsrc AS ({feeds_sql})
{channel(_ITEM_RE, _RSS_LINK_RE, _RSS_DATE_RE, "rss")}
UNION ALL
{channel(_ENTRY_RE, _ATOM_LINK_RE, _ATOM_DATE_RE, "atom")}
"""
