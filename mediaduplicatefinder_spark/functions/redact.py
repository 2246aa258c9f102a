"""PII redaction (E30): scrub emails / IPv4 addresses / phone numbers
from webtext, the standard privacy pass of large-scale training
pipelines (RefinedWeb §2.2, The Pile appx C run the same class of
regex scrubs before training).

Extends the reference's name/content normalization family (X1-X4,
main_cli.cpp:244-266 — lowercase/strip transforms before comparison)
from normalization to removal, with per-doc match counts for the
pipeline's metrics ledger.

Scale shape: pure map-side projection — JVM regexes inside whole-stage
codegen, no Python, no shuffle. At 10^12 docs the pass is
embarrassingly parallel; the only exchange anywhere is whatever the
caller aggregates afterwards.

Engine-parity contract: patterns are alternation-free greedy regexes
(character classes + greedy quantifiers only), the fragment of regex
syntax where Java's leftmost-first backtracking matcher (Spark) and
RE2's leftmost-longest automaton (DuckDB) provably agree on every
match span. Do NOT add alternations or lookarounds here without
re-verifying cross-engine match parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{7,15}"  # E.164-style international numbers

_PATTERNS = (
    ("email", EMAIL_RE, "[EMAIL]"),
    ("ipv4", IPV4_RE, "[IP]"),
    ("phone", PHONE_RE, "[PHONE]"),
)


def redact_pii(text: Column) -> Column:
    """text with every email, then IPv4, then phone span replaced by
    its placeholder token (application order matters: an email's host
    part could otherwise be rewritten as a phone/IP first)."""
    out = text
    for _name, pat, token in _PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts on the ORIGINAL text (metrics ledger)."""
    return {
        f"n_{name}": F.regexp_count(text, F.lit(pat)).cast("long")
        for name, pat, _token in _PATTERNS
    }


def redact_sql(text_expr: str) -> tuple[str, dict[str, str]]:
    """DuckDB twins: (redacted-text expression, {n_<kind>: count
    expression}). Same patterns, same application order."""
    out = text_expr
    counts = {}
    for name, pat, token in _PATTERNS:
        sql_pat = pat.replace("'", "''")
        counts[f"n_{name}"] = (
            f"len(regexp_extract_all({text_expr}, '{sql_pat}'))::BIGINT"
        )
        out = f"regexp_replace({out}, '{sql_pat}', '{token}', 'g')"
    return out, counts
