"""Charset sniffing for raw page payloads (E105).

Before any text stage can run, a crawl pipeline must decide what
encoding each fetched byte payload is in.  The WHATWG encoding-sniff
order (BOM > declared ``<meta>`` charset > default) is deterministic
and relational: BOM detection is a hex-prefix compare on the binary
column, the meta declaration is a regex over the BOM-stripped decode,
and label normalization is the literal WHATWG alias table (famously,
``latin1``/``ascii`` label bytes that browsers decode as
``windows-1252`` — the exact mismatch whose double-encode E82 repairs).

All three steps are map-only codegen over (binary, string) columns;
the twin shares the regex/alias literals.  The BOM is stripped before
decoding so the scan never feeds UTF-16 bytes to a strict UTF-8
decoder (DuckDB's ``decode`` throws where Spark's replaces — the
dialect hazard is avoided rather than papered over).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_META_CHARSET_RE = '<meta charset="([^"]*)"'
_META_HTTPEQUIV_RE = "charset=([a-zA-Z0-9_-]+)"

# WHATWG alias table (subset): labels browsers map to windows-1252
_CP1252_ALIASES = (
    "latin1",
    "latin-1",
    "iso-8859-1",
    "iso8859-1",
    "ascii",
    "us-ascii",
    "windows-1252",
    "cp1252",
)
DEFAULT_CHARSET = "utf-8"


def sniff_charset(
    pages: DataFrame, raw_col: str = "raw", key_col: str = "doc_id"
) -> DataFrame:
    """pages(doc_id, raw:binary) -> (doc_id, bom, declared, effective);
    bom NULL when absent, declared NULL when nothing is declared."""
    p3 = F.hex(F.expr(f"substring({raw_col}, 1, 3)"))
    p2 = F.hex(F.expr(f"substring({raw_col}, 1, 2)"))
    bom = (
        F.when(p3 == "EFBBBF", F.lit("utf-8-bom"))
        .when(p2 == "FFFE", F.lit("utf-16le"))
        .when(p2 == "FEFF", F.lit("utf-16be"))
    )
    # substring with a row-dependent offset needs the SQL form
    body_at = (
        f"CASE WHEN hex(substring({raw_col}, 1, 3)) = 'EFBBBF' THEN 4 "
        f"WHEN hex(substring({raw_col}, 1, 2)) IN ('FFFE','FEFF') THEN 3 "
        "ELSE 1 END"
    )
    text = F.decode(
        F.expr(f"substring({raw_col}, {body_at})"), "UTF-8"
    )
    m1 = F.regexp_extract(text, _META_CHARSET_RE, 1)
    m2 = F.regexp_extract(text, _META_HTTPEQUIV_RE, 1)
    declared_raw = F.when(m1 != "", m1).when(m2 != "", m2)
    low = F.lower(declared_raw)
    declared = F.when(
        low.isin(*_CP1252_ALIASES), F.lit("windows-1252")
    ).otherwise(F.when(low == "utf8", F.lit("utf-8")).otherwise(low))
    effective = (
        F.when(bom == "utf-8-bom", F.lit("utf-8"))
        .when(bom.isNotNull(), bom)
        .otherwise(F.coalesce(declared, F.lit(DEFAULT_CHARSET)))
    )
    return pages.select(
        key_col,
        bom.alias("bom"),
        declared.alias("declared"),
        effective.alias("effective"),
    )


def sniff_charset_sql(pages_sql: str) -> str:
    """DuckDB twin; ``pages_sql`` SELECTs (doc_id, raw BLOB)."""
    aliases = ", ".join(f"'{a}'" for a in _CP1252_ALIASES)
    return f"""
WITH cpages AS ({pages_sql}),
pfx AS (
  -- DuckDB 1.0 has no BLOB substring/slice: operate on the hex image
  -- (2 hex chars per byte) and unhex the BOM-stripped remainder
  SELECT doc_id, hex(raw) AS hx FROM cpages
),
bomd AS (
  SELECT doc_id, hx,
         CASE WHEN left(hx, 6) = 'EFBBBF' THEN 'utf-8-bom'
              WHEN left(hx, 4) = 'FFFE' THEN 'utf-16le'
              WHEN left(hx, 4) = 'FEFF' THEN 'utf-16be' END AS bom,
         CASE WHEN left(hx, 6) = 'EFBBBF' THEN 7
              WHEN left(hx, 4) IN ('FFFE', 'FEFF') THEN 5
              ELSE 1 END AS body_hex_at
  FROM pfx
),
scanned AS (
  SELECT doc_id, bom,
         decode(unhex(substring(hx, body_hex_at))) AS text
  FROM bomd
),
decl AS (
  SELECT doc_id, bom,
         CASE WHEN regexp_extract(text, '{_META_CHARSET_RE}', 1) <> ''
                THEN regexp_extract(text, '{_META_CHARSET_RE}', 1)
              WHEN regexp_extract(text, '{_META_HTTPEQUIV_RE}', 1) <> ''
                THEN regexp_extract(text, '{_META_HTTPEQUIV_RE}', 1)
         END AS declared_raw
  FROM scanned
),
normed AS (
  SELECT doc_id, bom,
         CASE WHEN lower(declared_raw) IN ({aliases}) THEN 'windows-1252'
              WHEN lower(declared_raw) = 'utf8' THEN 'utf-8'
              ELSE lower(declared_raw) END AS declared
  FROM decl
)
SELECT doc_id, bom, declared,
       CASE WHEN bom = 'utf-8-bom' THEN 'utf-8'
            WHEN bom IS NOT NULL THEN bom
            ELSE coalesce(declared, '{DEFAULT_CHARSET}') END AS effective
FROM normed
"""
