"""C4-style cross-document span dedup (E28, Raffel et al. 2020 §2.2
adapted): remove every duplicated token span from the corpus, keeping
exactly one occurrence, and reassemble each document from its surviving
spans.

C4 deduplicates three-sentence spans; the driver corpus is unpunctuated
token soup, so the span unit here is a non-overlapping window of
``span_tokens`` whitespace tokens (the last span of a doc may be
shorter). This extends the reference's exact-duplicate family (A1/A3,
main_cli.cpp:573-607 — whole-file hash groups) to sub-document
granularity, the way a webtext pipeline strips boilerplate sentences
that recur across millions of pages.

Keep rule: the first occurrence in (doc_id ASC, span_idx ASC) order
wins; every other occurrence — including repeats *within* the winning
document — is dropped.

Scale shape (the plan at 10^12 docs):

1. spans: narrow projection + ``posexplode`` — no shuffle.
2. winners: ONE ``groupBy(span).agg(min(struct(doc_id, span_idx)))``.
   The min is a map-side-combining partial aggregate, so a boilerplate
   span occurring 10^9 times ("enable javascript to continue") reduces
   to one row per partition before the exchange — the hot-key shuffle
   volume is bounded by distinct-spans-per-partition, not occurrences.
3. keep filter: hash join back on ``span``. The winners side has
   exactly ONE row per distinct span, so each occurrence matches one
   row — no pair explosion on hot spans (contrast a self-join).
4. reassembly: ``groupBy(doc_id)`` + sorted ``array_join`` — skew
   bounded by document length.

Total: two exchanges over compact (span-hash-sized) rows plus the
doc-key exchange; nothing quadratic anywhere.

The DuckDB oracle states the same semantics as a ROW_NUMBER window
over (span) — the naive single-reducer-per-span formulation — so
Spark/oracle agreement proves the distributed min-struct + join
decomposition exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SPAN_TOKENS = 5


def _tokens_col(text: str = "text"):
    t = F.trim(F.col(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def span_dedup(
    docs: DataFrame, span_tokens: int = DEFAULT_SPAN_TOKENS
) -> DataFrame:
    """docs(doc_id, lang, text) -> one row per doc:
    (doc_id, lang, n_spans, n_kept, n_dropped, text_dedup)."""
    w = span_tokens
    toks = docs.select("doc_id", "lang", _tokens_col().alias("tk"))
    n_spans = ((F.size("tk") + (w - 1)) / w).cast("long")  # ceil div
    spans_arr = F.when(F.size("tk") == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), (n_spans - 1).cast("int")),
            lambda i: F.array_join(F.slice(F.col("tk"), i * w + 1, w), " "),
        )
    )
    base = toks.select(
        "doc_id", "lang", n_spans.alias("n_spans"), spans_arr.alias("spans")
    )
    spans = base.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    )
    winners = spans.groupBy("span").agg(
        F.min(F.struct("doc_id", "span_idx")).alias("w")
    )
    kept = (
        spans.join(winners, "span")
        .where(
            (F.col("doc_id") == F.col("w.doc_id"))
            & (F.col("span_idx") == F.col("w.span_idx"))
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("span_idx", "span"))),
                    lambda s: s["span"],
                ),
                " ",
            ).alias("text_dedup"),
        )
    )
    return (
        base.drop("spans")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "n_spans",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_spans") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_dropped"
            ),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


def span_dedup_sql(span_tokens: int = DEFAULT_SPAN_TOKENS) -> str:
    """DuckDB twin: ROW_NUMBER over (span) ordered (doc_id, span_idx)
    — the naive formulation whose agreement proves the distributed
    min-struct decomposition exact."""
    w = span_tokens
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, lang,
         CASE WHEN len(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\\s+') END AS tk
  FROM documents
),
spans AS (
  SELECT doc_id, u.i AS span_idx,
         array_to_string(tk[u.i*{w}+1 : u.i*{w}+{w}], ' ') AS span
  FROM toks, LATERAL UNNEST(range((len(tk)+{w-1})//{w})) AS u(i)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY span
                               ORDER BY doc_id, span_idx) AS rk
  FROM spans
),
kept AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept,
         string_agg(span, ' ' ORDER BY span_idx) AS text_dedup
  FROM ranked WHERE rk = 1 GROUP BY doc_id
)
SELECT t.doc_id, t.lang,
       ((len(tk)+{w-1})//{w})::BIGINT AS n_spans,
       coalesce(k.n_kept, 0)::BIGINT AS n_kept,
       (((len(tk)+{w-1})//{w}) - coalesce(k.n_kept, 0))::BIGINT AS n_dropped,
       coalesce(k.text_dedup, '') AS text_dedup
FROM toks t LEFT JOIN kept k ON t.doc_id = k.doc_id
"""
