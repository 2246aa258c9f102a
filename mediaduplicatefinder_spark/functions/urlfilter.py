"""URL-level filtering (E61) — the stage a webtext pipeline runs
BEFORE fetching/extracting content (RefinedWeb §3.1's URL filtering,
C4's bad-words source filtering, CCNet's source selection).

Two published rule families, both computed without touching page
bodies:

* **Domain blocklist**: the canonical host is blocked when it equals
  a blocklisted domain or is a subdomain of one (match at LABEL
  boundaries: ``ads.example.org`` matches ``example.org``;
  ``notexample.org`` does not).  Scale shape: the host explodes into
  its dot-suffixes (``a.b.c`` -> ``a.b.c``, ``b.c``, ``c``) and
  EQUI-joins the blocklist — a broadcast hash join, never a LIKE /
  non-equi join; the corpus side stays map-only + one semi-join.
* **Keyword scoring** (RefinedWeb's soft-word list): each keyword has
  a weight; score = sum over keywords of weight * (substring
  occurrences in the lowercased URL).  Occurrence counting is the
  codegen-safe ``(len(u) - len(replace(u, kw))) / len(kw)`` identity
  — no regex, no Python.  ``blocked_kw`` when score >= threshold.

``keep = NOT blocked_domain AND NOT blocked_kw``.

The default lists below are deterministic fixtures sized for the
synthesized test corpus; a production run passes its own blocklist
DataFrame (UT1-scale lists are millions of rows — still broadcast-able
at ~tens of MB, else the same equi-join shuffles both sides).

Cross-engine parity: the Spark expressions and the DuckDB SQL are
built from the SAME keyword/weight literals by the two builders here
(the script_mix shared-builder pattern), so the oracle can't drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.urls import (
    canon_url_expr,
    canon_url_sql,
    host_expr,
)

# (domain, ) blocklist fixture — exact host or any subdomain is blocked
BLOCK_DOMAINS: tuple[str, ...] = (
    "site-3.example.org",
    "site-13.example.org",
    "tracker-ads.net",
)

# (keyword, weight) — RefinedWeb-style soft URL word list
URL_KEYWORDS: tuple[tuple[str, float], ...] = (
    ("casino", 2.0),
    ("poker", 1.5),
    ("free-download", 0.5),
    ("win-big", 0.5),
)

KW_THRESHOLD = 2.0


def _occurrences(lowered: Column, kw: str) -> Column:
    """Substring occurrence count, pure string codegen."""
    return (
        F.length(lowered) - F.length(F.replace(lowered, F.lit(kw)))
    ) / len(kw)


def kw_score_expr(url: Column) -> Column:
    lowered = F.lower(url)
    score = F.lit(0.0)
    for kw, w in URL_KEYWORDS:
        score = score + F.lit(float(w)) * _occurrences(lowered, kw)
    return score


def host_suffixes_expr(host: Column) -> Column:
    """All dot-label suffixes of a host, e.g. 'a.b.c' ->
    ['a.b.c', 'b.c', 'c'] — the equi-join key set for blocklist
    matching at label boundaries."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n), "."),
    )


def default_blocklist(spark) -> DataFrame:
    return spark.createDataFrame(
        [(d,) for d in BLOCK_DOMAINS], "blocked_domain_name string"
    )


def url_filter(urls: DataFrame, blocklist: DataFrame | None = None) -> DataFrame:
    """urls(doc_id, url) [+ blocklist(blocked_domain_name)] ->
    (doc_id, url, canon_url, host, blocked_domain, kw_score,
    blocked_kw, keep).

    Plan shape: one map-only projection (canon/host/score), one
    explode + broadcast-equi-join + distinct for the domain verdict
    (the explode multiplies rows only by the host's label count, ~3-5),
    one left join back.  Nothing touches page bodies; at 10^12 urls the
    only shuffle is the final doc_id join, and AQE converts it to a
    broadcast when the hit set is small."""
    spark = urls.sparkSession
    if blocklist is None:
        blocklist = default_blocklist(spark)
    base = urls.select(
        "doc_id",
        "url",
        canon_url_expr(F.col("url")).alias("canon_url"),
        host_expr(F.col("url")).alias("host"),
        kw_score_expr(F.col("url")).alias("kw_score"),
    )
    sfx = base.select(
        "doc_id", F.explode(host_suffixes_expr(F.col("host"))).alias("sfx")
    )
    hits = (
        sfx.join(
            F.broadcast(blocklist),
            sfx["sfx"] == blocklist["blocked_domain_name"],
            "inner",
        )
        .select("doc_id")
        .distinct()
        .withColumn("blocked_domain", F.lit(True))
    )
    return (
        base.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "url",
            "canon_url",
            "host",
            F.coalesce("blocked_domain", F.lit(False)).alias(
                "blocked_domain"
            ),
            F.round("kw_score", 6).alias("kw_score"),
            (F.col("kw_score") >= KW_THRESHOLD).alias("blocked_kw"),
        )
        .withColumn(
            "keep", ~F.col("blocked_domain") & ~F.col("blocked_kw")
        )
    )


def url_filter_sql(urls_sql: str) -> str:
    """DuckDB twin over ``urls_sql`` (must yield doc_id, url) — built
    from the SAME literals.  The oracle's domain match uses the
    EXISTS/suffix formulation (host = d OR host LIKE '%.' || d), an
    independent expression of the same label-boundary semantics."""
    c = canon_url_sql("url")
    lowered = "lower(url)"
    score_terms = " + ".join(
        f"{float(w)} * (length({lowered}) - "
        f"length(replace({lowered}, '{kw}', ''))) / {len(kw)}"
        for kw, w in URL_KEYWORDS
    )
    domains = ", ".join(f"('{d}')" for d in BLOCK_DOMAINS)
    return f"""
WITH u AS (SELECT doc_id, url FROM ({urls_sql})),
bl(blocked_domain_name) AS (VALUES {domains}),
base AS (
  SELECT doc_id, url,
         {c['canon']} AS canon_url,
         {c['host']} AS host,
         round({score_terms}, 6) AS kw_score
  FROM u
)
SELECT doc_id, url, canon_url, host,
  EXISTS (SELECT 1 FROM bl b WHERE base.host = b.blocked_domain_name
          OR base.host LIKE '%.' || b.blocked_domain_name)
    AS blocked_domain,
  kw_score,
  kw_score >= {KW_THRESHOLD} AS blocked_kw,
  NOT (EXISTS (SELECT 1 FROM bl b WHERE base.host = b.blocked_domain_name
       OR base.host LIKE '%.' || b.blocked_domain_name))
  AND NOT (kw_score >= {KW_THRESHOLD}) AS keep
FROM base
"""
