"""Text-analysis column expressions for training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All pure pyspark.sql.functions (JVM codegen), each with an exact ANSI-SQL
equivalent (see __spark_entry__.oracle_sql) so the DuckDB oracle can
verify values bit-for-bit.  These extend the reference's text toolbox
(main_cli.cpp:272-294) to the ops a 100 TB corpus pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.text import normalized_text_expr

# Tiny deterministic stopword marker sets per language (heuristic n-gram
# language ID — a closed, documented rule so the DuckDB oracle can
# replicate it exactly).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "und", "die", "das", "nicht"],
    "fr": ["le", "la", "les", "et", "est"],
    "el": ["kai", "tou", "tis", "den", "einai"],
}


def token_count_expr(text: Column | str) -> Column:
    """Whitespace token count; empty/blank text -> 0."""
    c = F.col(text) if isinstance(text, str) else text
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, "\\s+"))
    )


def word_regexp_count(text: Column, word: str) -> Column:
    """Occurrences of `word` as a whole word in lowercased text."""
    return F.regexp_count(F.lower(text), F.lit(f"\\b{word}\\b"))


def lang_scores_exprs(text: Column | str) -> dict[str, Column]:
    c = F.col(text) if isinstance(text, str) else text
    return {
        lang: sum(word_regexp_count(c, w) for w in words).alias(f"score_{lang}")
        for lang, words in LANG_MARKERS.items()
    }


def lang_id_expr(text: Column | str) -> Column:
    """argmax language by marker-word count; ties break alphabetically;
    all-zero -> 'und' (undetermined)."""
    scores = lang_scores_exprs(text)
    langs = sorted(LANG_MARKERS)  # alphabetical = deterministic tie-break
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties -> apply last
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def quality_score_expr(text: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic:
       0.5 * alnum-char ratio + 0.3 * min(tokens/200, 1) + 0.2 * (1 - punct ratio)
    rounded to 4 dp for cross-engine float stability."""
    c = F.col(text) if isinstance(text, str) else text
    n = F.length(c).cast("double")
    alnum = F.length(F.regexp_replace(c, "[^a-zA-Z0-9]", "")).cast("double")
    punct = F.length(F.regexp_replace(c, "[^.,;:!?'\"()]", "")).cast("double")
    toks = token_count_expr(c).cast("double")
    score = (
        F.lit(0.5) * F.when(n > 0, alnum / n).otherwise(F.lit(0.0))
        + F.lit(0.3) * F.least(toks / F.lit(200.0), F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.when(n > 0, punct / n).otherwise(F.lit(0.0)))
    )
    return F.round(score, 4)


def fingerprint_expr(text: Column | str) -> Column:
    """Normalized-content fingerprint: md5 of lowercase alnum+ws text.
    Whitespace-insensitive variant of the exact-dup key (A1,
    main_cli.cpp:488-526) for boilerplate-tolerant exact dedup."""
    return F.md5(F.regexp_replace(normalized_text_expr(text), "\\s+", " "))
