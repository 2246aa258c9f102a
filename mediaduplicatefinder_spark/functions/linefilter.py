"""RefinedWeb-style line-wise structural cleanup (Penedo et al. 2023,
arXiv:2306.01116 §G.2 "line-wise corrections").

Real CC pipelines run a rule pass BEFORE dedup that strips page
furniture line-by-line and drops documents that were mostly furniture.
Published rule set, made integer-exact here:

  removed if the line is
    (1) mainly uppercase          — 2 * n_upper > n_alpha, n_alpha > 0
    (2) only numerical            — ^[0-9 .,%]+$ (non-empty)
    (3) a social counter          — "<digits> likes|shares|comments|
                                     views|points" (case-insensitive
                                     via lower(), both engines ASCII)
    (4) a single word             — non-empty, no whitespace inside

  and the whole document is dropped when removed characters exceed 5%
  of line characters: 20 * removed_chars > total_chars (cross-
  multiplied, no float).

Plan shape: one map-only projection — split + higher-order
transform/filter/aggregate + array_join, all JVM whole-stage codegen,
no Python, no shuffle. Patterns are restricted to ASCII classes where
Java regex and DuckDB RE2 provably agree (the E30 PII precedent).

Empty / whitespace-only lines are document structure, never removed
(they trip none of the four rules by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUMERIC_ONLY_RE = "^[0-9 .,%]+$"
COUNTER_RE = "^[0-9]+ (likes?|shares?|comments?|views?|points?)$"

# The removal predicate restated in RE2 for the DuckDB oracle —
# explicit 'g' flags (DuckDB regexp_replace replaces first-only by
# default, Java replaces all); agreement proves the two dialects
# compute the same rule set.
REMOVED_SQL = (
    "(length(regexp_replace(x, '[^A-Za-z]', '', 'g')) > 0 AND "
    "2 * length(regexp_replace(x, '[^A-Z]', '', 'g')) > "
    "length(regexp_replace(x, '[^A-Za-z]', '', 'g'))) OR "
    "regexp_matches(x, '^[0-9 .,%]+$') OR "
    "regexp_matches(lower(trim(x)), "
    "'^[0-9]+ (likes?|shares?|comments?|views?|points?)$') OR "
    "(length(trim(x)) > 0 AND NOT regexp_matches(trim(x), "
    "'[ ' || chr(9) || ']'))"
)


def line_cleanup_sql(docs_sql: str) -> str:
    """DuckDB twin over ``docs_sql`` (must yield doc_id, text): same
    four rules + 5% doc-drop, RE2 dialect."""
    return f"""
WITH lc_docs AS MATERIALIZED ({docs_sql}),
lc_base AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM lc_docs
),
lc_flags AS (
  SELECT doc_id, ls,
    list_filter(ls, x -> NOT ({REMOVED_SQL})) AS kept,
    list_filter(ls, x -> {REMOVED_SQL}) AS removed
  FROM lc_base
),
lc_agg AS (
  SELECT doc_id,
    array_to_string(kept, chr(10)) AS cleaned_text,
    len(ls)::INT AS n_lines,
    (len(ls) - len(kept))::INT AS n_removed_lines,
    coalesce(list_sum(list_transform(removed, x -> length(x))), 0)::BIGINT
      AS removed_chars,
    coalesce(list_sum(list_transform(ls, x -> length(x))), 0)::BIGINT
      AS total_chars
  FROM lc_flags
)
SELECT *, 20 * removed_chars <= total_chars AS keep_doc FROM lc_agg
"""


def _line_removed(line: Column) -> Column:
    """True when any of the four published rules fires for this line."""
    n_upper = F.length(F.regexp_replace(line, "[^A-Z]", ""))
    n_alpha = F.length(F.regexp_replace(line, "[^A-Za-z]", ""))
    mainly_upper = (n_alpha > 0) & (2 * n_upper > n_alpha)
    numeric_only = line.rlike(NUMERIC_ONLY_RE)
    counter = F.lower(F.trim(line)).rlike(COUNTER_RE)
    trimmed = F.trim(line)
    one_word = (F.length(trimmed) > 0) & ~trimmed.rlike("[ \\t]")
    return mainly_upper | numeric_only | counter | one_word


def line_cleanup(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text) -> per doc: cleaned_text (surviving
    lines re-joined), line/char removal counts, and keep_doc (the 5%
    document-drop rule). Map-only; no UDF; no shuffle."""
    lines = F.split("text", "\n")
    removed_len = F.aggregate(
        F.filter(lines, _line_removed),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x),
    )
    total_len = F.aggregate(
        lines,
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(x),
    )
    kept = F.filter(lines, lambda x: ~_line_removed(x))
    out = docs.select(
        "doc_id",
        F.array_join(kept, "\n").alias("cleaned_text"),
        F.size(lines).cast("int").alias("n_lines"),
        (F.size(lines) - F.size(kept)).cast("int").alias("n_removed_lines"),
        removed_len.alias("removed_chars"),
        total_len.alias("total_chars"),
    )
    return out.select(
        "*",
        (20 * F.col("removed_chars") <= F.col("total_chars")).alias("keep_doc"),
    )
