"""Per-host template-shingle detection (E99).

Boilerplate is the enemy of near-dup precision: navigation bars,
footers, and cookie banners repeat on every page of a host, inflating
shingle overlap between pages whose CONTENT is unrelated (the reason
MassiveText/CCNet strip boilerplate before dedup, and the reason E80
needs a stop-shingle cap).  This operator measures that channel
directly: a shingle occurring in at least ``pct``% of a host's pages
is a TEMPLATE shingle, and each page reports how much of its shingle
set is template — the signal a pipeline uses to route pages to
boilerplate-stripping (E45/E101-style) or to discount LSH scores.

Scale shape: one exchange on ``(host, shingle_hash)`` for the
document-frequency count, a co-partitioned join back to the postings,
one exchange on ``(host, doc_id)`` for the per-page rollup, and a tiny
per-host size aggregate joined broadcast-style.  No pairing anywhere —
the job is linear in total postings.  Hot shingles are *the point*
here (they become template rows), not a skew hazard: per-(host,
shingle) cardinality is bounded by host size, the same bound the E80
cap relies on.

Determinism: shingles travel as ``xxhash64`` of the '_'-joined k-gram
(the engine-wide channel); the oracle counts shingle STRINGS, so
agreement doubles as the collision check (E80 precedent).  The
template threshold is an integer cross-multiply — no float ratios on
either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TEMPLATE_K = 3
TEMPLATE_PCT = 50


def host_template_stats(
    pages: DataFrame,
    k: int = TEMPLATE_K,
    pct: int = TEMPLATE_PCT,
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """pages(host, doc_id, text) -> (host, doc_id, n_shingles,
    n_template, boilerplate_heavy); docs with < k tokens report 0/0."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.xxhash64(F.concat_ws("_", F.slice(toks, i, k))),
        )
    )
    postings = (
        pages.filter(F.size(toks) >= k)
        .select(host_col, "doc_id", F.explode(shingles).alias("s"))
        .persist()  # feeds the df count AND the per-doc rollup
    )
    host_n = pages.groupBy(host_col).agg(
        F.count(F.lit(1)).alias("host_docs")
    )
    sdf = postings.groupBy(host_col, "s").agg(
        F.count(F.lit(1)).alias("df")
    )
    templ = sdf.join(host_n, host_col).select(
        host_col,
        "s",
        (F.col("df") * 100 >= F.lit(pct) * F.col("host_docs")).alias(
            "is_template"
        ),
    )
    per_doc = (
        postings.join(templ, [host_col, "s"])
        .groupBy(host_col, "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.col("is_template").cast("long")).alias("n_template"),
        )
    )
    n_sh = F.coalesce(F.col("n_shingles"), F.lit(0)).alias("n_shingles")
    n_t = F.coalesce(F.col("n_template"), F.lit(0)).alias("n_template")
    return (
        pages.select(host_col, "doc_id")
        .join(per_doc, [host_col, "doc_id"], "left")
        .select(
            host_col,
            "doc_id",
            n_sh,
            n_t,
            (
                (F.coalesce(F.col("n_shingles"), F.lit(0)) > 0)
                & (
                    F.coalesce(F.col("n_template"), F.lit(0)) * 2
                    >= F.coalesce(F.col("n_shingles"), F.lit(0))
                )
            ).alias("boilerplate_heavy"),
        )
    )


def host_template_stats_sql(
    pages_sql: str,
    k: int = TEMPLATE_K,
    pct: int = TEMPLATE_PCT,
) -> str:
    """DuckDB twin over shingle STRINGS (collision check rides);
    ``pages_sql`` SELECTs (host, doc_id, text)."""
    return f"""
WITH tpages AS ({pages_sql}),
sh AS (
  SELECT host, doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(ws) - {k - 1}),
           i -> array_to_string(list_slice(ws, i, i + {k - 1}), '_'))))
           AS s
  FROM (SELECT host, doc_id, string_split_regex(trim(text), '\\s+') AS ws
        FROM tpages)
  WHERE len(ws) >= {k}
),
hn AS (SELECT host, count(*)::BIGINT AS host_docs FROM tpages GROUP BY host),
sdf AS (SELECT host, s, count(*)::BIGINT AS df FROM sh GROUP BY host, s),
templ AS (
  SELECT sdf.host, sdf.s, sdf.df * 100 >= {pct} * hn.host_docs AS is_template
  FROM sdf JOIN hn USING (host)
),
per_doc AS (
  SELECT sh.host, sh.doc_id,
         count(*)::BIGINT AS n_shingles,
         sum(CASE WHEN templ.is_template THEN 1 ELSE 0 END)::BIGINT
           AS n_template
  FROM sh JOIN templ ON templ.host = sh.host AND templ.s = sh.s
  GROUP BY sh.host, sh.doc_id
)
SELECT t.host, t.doc_id,
       coalesce(p.n_shingles, 0)::BIGINT AS n_shingles,
       coalesce(p.n_template, 0)::BIGINT AS n_template,
       coalesce(p.n_shingles, 0) > 0
         AND coalesce(p.n_template, 0) * 2 >= coalesce(p.n_shingles, 0)
         AS boilerplate_heavy
FROM tpages t
LEFT JOIN per_doc p ON p.host = t.host AND p.doc_id = t.doc_id
"""
