"""Column-expression building blocks (pure pyspark.sql.functions — JVM-side,
whole-stage-codegen; no Python in the hot path).

Reference semantics reproduced here:

- ``tokens_expr``: whitespace-split, strip non-alnum chars, lowercase,
  keep len > 2, dedupe into a set (main_cli.cpp:272-283).  Stripping
  non-alnum *before* splitting is equivalent to the reference's
  per-token strip because removal never introduces separators, and all
  non-ASCII bytes fail ``isalnum`` byte-wise in the reference just as
  they match ``[^a-zA-Z0-9...]`` here.
- ``jaccard_expr``: |A∩B| / (|A|+|B|-|A∩B|); empty side -> 0.0
  (main_cli.cpp:285-294).
- ``size_ratio_expr``: min/max byte-length ratio (main_cli.cpp:297-299).
- ``hamming_expr``: popcount of XOR (main_cli.cpp:211-219) via the
  built-in ``bit_count`` — stays inside codegen.
- ``url_stem_expr`` / ``url_dirname_expr``: path stem/dirname analogs
  (main_cli.cpp:246-247; duplicate_gui.py:651-658).
- ``first_n_lines_expr``: first-50-lines truncation (main_cli.cpp:260-270).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NON_ALNUM_KEEP_WS = "[^a-zA-Z0-9 \\t\\n\\r\\f\\v]"


def normalized_text_expr(text: Column | str) -> Column:
    """lowercase + strip non-alnum (whitespace kept) — shared by tokens_expr
    and the document fingerprint."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(c), NON_ALNUM_KEEP_WS, "")


def tokens_expr(text: Column | str, min_len: int = 3) -> Column:
    """Distinct normalized tokens of length >= min_len (main_cli.cpp:272-283).

    Result order is the first-occurrence order produced by
    ``array_distinct``; consumers that need set semantics only use
    intersection/union sizes, which are order-insensitive.
    """
    toks = F.split(normalized_text_expr(text), "\\s+")
    kept = F.filter(toks, lambda x: F.length(x) >= F.lit(min_len))
    return F.array_distinct(kept)


def sorted_tokens_expr(text: Column | str, min_len: int = 3) -> Column:
    """Tokens in sorted order — matches the reference's std::set iteration
    order (main_cli.cpp:272) for byte-stable golden comparisons."""
    return F.array_sort(tokens_expr(text, min_len))


def jaccard_expr(a: Column, b: Column) -> Column:
    """Exact Jaccard on token arrays; either side empty -> 0.0
    (main_cli.cpp:285-294: empty *text* -> 0, and |A|+|B|-|∩| == 0 -> 0)."""
    inter = F.size(F.array_intersect(a, b))
    total = F.size(a) + F.size(b) - inter
    return F.when(total > 0, inter.cast("double") / total.cast("double")).otherwise(
        F.lit(0.0)
    )


def size_ratio_expr(len_a: Column, len_b: Column) -> Column:
    """min/max size ratio (main_cli.cpp:297-299); 0 if either side is 0."""
    lo = F.least(len_a, len_b).cast("double")
    hi = F.greatest(len_a, len_b).cast("double")
    return F.when(hi > 0, lo / hi).otherwise(F.lit(0.0))


def hamming_expr(h1: Column, h2: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints stored as LongType
    (main_cli.cpp:211-219) — ``bit_count(xor)`` is a codegen built-in."""
    return F.bit_count(h1.bitwiseXOR(h2))


def url_stem_expr(url: Column | str) -> Column:
    """Filename stem of a url/path: basename minus the last extension
    (fs::path::stem analog, main_cli.cpp:246-247)."""
    c = F.col(url) if isinstance(url, str) else url
    base = F.element_at(F.split(c, "/"), -1)
    return F.regexp_replace(base, "\\.[^.]*$", "")


def url_dirname_expr(url: Column | str) -> Column:
    """Everything before the last '/' (os.path.dirname analog,
    duplicate_gui.py:651)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_replace(c, "/[^/]*$", "")


def first_n_lines_expr(text: Column | str, n: int = 50) -> Column:
    """First n lines, each re-terminated with '\\n' (main_cli.cpp:260-270:
    getline drops the terminator, the loop appends one — so a missing
    trailing newline on line n is normalized to present)."""
    c = F.col(text) if isinstance(text, str) else text
    # strip ONE trailing newline before splitting: getline never yields the
    # empty segment a trailing '\n' would otherwise create under split()
    lines = F.slice(F.split(F.regexp_replace(c, "\n$", ""), "\n"), 1, n)
    return F.when(
        F.length(c) > 0, F.concat(F.array_join(lines, "\n"), F.lit("\n"))
    ).otherwise(F.lit(""))
