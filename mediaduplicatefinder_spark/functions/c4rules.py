"""C4 cleanup rules (E49, Raffel et al. 2020, arXiv:1910.10683 §2.2 —
the filtering half; the span-dedup half is operators/spandedup.py E28).

Completes the big-four published quality suites next to Gopher (E41),
RefinedWeb line-wise (E45) and CCNet perplexity (E46). The paper's
rules, made integer-exact:

  line level (applied first, in order):
    keep a line only if it ends in a terminal punctuation mark
    (. ! ? ") AND contains at least 5 whitespace words
  page level (evaluated on the surviving lines):
    drop the page if it has fewer than 3 sentences (terminal-punct
    occurrences across kept lines), contains a curly brace '{', the
    phrase "lorem ipsum" (case-insensitive), or a bad word (the
    paper uses the "List of Dirty, Naughty ..." list; a small
    deterministic subset stands in — the mechanism, a word-boundary
    alternation scan, is what scales)

Plan shape: ONE map-only projection — split + higher-order filter /
aggregate + array_join + rlike, all JVM whole-stage codegen, no
Python, no shuffle. Patterns are ASCII-conservative so Java regex and
DuckDB RE2 agree (E30/E45 precedent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TERMINAL_RE = '[.!?"]$'
MIN_LINE_WORDS = 5
MIN_SENTENCES = 3
BAD_WORDS = ["badword1", "badword2", "obscenity"]  # stand-in list
SENTENCE_RE = '[.!?"]'


def _line_kept(line: Column) -> Column:
    words = F.filter(
        F.split(F.trim(line), " +"), lambda w: w != F.lit("")
    )
    ends_terminal = F.trim(line).rlike(TERMINAL_RE)
    return ends_terminal & (F.size(words) >= MIN_LINE_WORDS)


def c4_rules(docs: DataFrame) -> DataFrame:
    """documents(doc_id, text) -> (doc_id, cleaned_text, n_lines,
    n_kept_lines, n_sentences, has_brace, has_lorem, has_badword,
    keep_page). cleaned_text joins the surviving lines; page flags are
    evaluated over the surviving text exactly as the paper's pipeline
    order implies."""
    lines = F.split("text", "\n")
    kept = F.filter(lines, _line_kept)
    cleaned = F.array_join(kept, "\n")
    base = docs.select(
        "doc_id",
        cleaned.alias("cleaned_text"),
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept_lines"),
    )
    lc = F.lower(F.col("cleaned_text"))
    n_sentences = (
        F.size(F.split(F.col("cleaned_text"), SENTENCE_RE, -1)) - 1
    ).cast("int")
    bad_re = "(^|[^a-z0-9])(" + "|".join(BAD_WORDS) + ")($|[^a-z0-9])"
    out = base.select(
        "*",
        n_sentences.alias("n_sentences"),
        F.col("cleaned_text").contains("{").alias("has_brace"),
        lc.contains("lorem ipsum").alias("has_lorem"),
        lc.rlike(bad_re).alias("has_badword"),
    )
    return out.select(
        "*",
        (
            (F.col("n_sentences") >= MIN_SENTENCES)
            & ~F.col("has_brace")
            & ~F.col("has_lorem")
            & ~F.col("has_badword")
        ).alias("keep_page"),
    )


def c4_rules_sql(docs_sql: str = "SELECT doc_id, text FROM documents") -> str:
    """DuckDB twin over ``docs_sql`` (doc_id, text) — RE2 restatement
    of the same rules."""
    line_kept = (
        "regexp_matches(trim(x), '[.!?\"]$') AND "
        "len(list_filter(string_split(trim(x), ' '), w -> w <> '')) >= "
        f"{MIN_LINE_WORDS}"
    )
    bad_re = "(^|[^a-z0-9])(" + "|".join(BAD_WORDS) + ")($|[^a-z0-9])"
    return f"""
WITH c4_in AS MATERIALIZED ({docs_sql}),
c4_base AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM c4_in
),
c4_kept AS (
  SELECT doc_id, ls, list_filter(ls, x -> {line_kept}) AS kept
  FROM c4_base
),
c4_clean AS (
  SELECT doc_id,
         -- DuckDB's array_to_string([]) yields NULL, Spark's '' —
         coalesce(array_to_string(kept, chr(10)), '') AS cleaned_text,
         len(ls)::INT AS n_lines,
         len(kept)::INT AS n_kept_lines
  FROM c4_kept
),
c4_flags AS (
  SELECT *,
    (length(cleaned_text)
     - length(regexp_replace(cleaned_text, '[.!?\"]', '', 'g')))::INT
      AS n_sentences,
    contains(cleaned_text, '{{') AS has_brace,
    contains(lower(cleaned_text), 'lorem ipsum') AS has_lorem,
    regexp_matches(lower(cleaned_text), '{bad_re}') AS has_badword
  FROM c4_clean
)
SELECT *,
  n_sentences >= {MIN_SENTENCES} AND NOT has_brace AND NOT has_lorem
    AND NOT has_badword AS keep_page
FROM c4_flags
"""
