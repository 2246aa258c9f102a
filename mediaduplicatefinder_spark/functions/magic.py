"""Magic-byte content-type sniffing (E109).

Server-reported Content-Type and url extensions lie constantly; the
bytes don't.  This is the reference's extension classifier
(main_cli.cpp:119-139, S2) done the way a crawl pipeline must do it —
from the payload's magic numbers — so media rows route to the right
dedup channel (pixel hashes vs audio vs archive vs text) no matter
what the url claims.  The extension-agreement flag is itself a useful
signal: mislabeled payloads correlate with spam and with the E101
soft-404 family.

Hex-prefix compares on the binary column (the E105 technique), one
map-only projection.  The magic table and the type→extension map are
shared Python literals, so both engines consume identical rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (hex prefix, type); first match wins — order longest-first so the
# RIFF/WAVE pair is probed before shorter generic prefixes
MAGIC_TABLE = (
    ("89504E47", "png"),
    ("47494638", "gif"),
    ("504B0304", "zip"),
    ("25504446", "pdf"),
    ("FFD8FF", "jpeg"),
    ("424D", "bmp"),
    ("1F8B", "gzip"),
)
# RIFF....WAVE needs two windows: bytes 1-4 and 9-12
_RIFF = "52494646"
_WAVE = "57415645"

EXT_MAP = {
    "png": ("png",),
    "jpeg": ("jpg", "jpeg"),
    "gif": ("gif",),
    "bmp": ("bmp",),
    "wav": ("wav",),
    "gzip": ("gz",),
    "pdf": ("pdf",),
    "zip": ("zip", "docx", "xlsx", "pptx"),
}

_EXT_RE = "\\.([a-zA-Z0-9]+)$"


def magic_sniff(
    pages: DataFrame, raw_col: str = "raw", url_col: str = "url"
) -> DataFrame:
    """pages(doc_id, url, raw:binary) -> (doc_id, magic_type,
    url_ext, ext_matches)."""
    hx = F.hex(F.expr(f"substring({raw_col}, 1, 12)"))
    magic = F.when(
        (hx.startswith(_RIFF)) & (F.substring(hx, 17, 8) == _WAVE),
        F.lit("wav"),
    )
    for prefix, name in MAGIC_TABLE:
        magic = magic.when(hx.startswith(prefix), F.lit(name))
    magic = magic.otherwise(F.lit("unknown"))
    ext = F.lower(F.regexp_extract(F.col(url_col), _EXT_RE, 1))
    match = F.lit(False)
    for name, exts in EXT_MAP.items():
        match = match | (
            (F.col("magic_type") == name) & F.col("url_ext").isin(*exts)
        )
    return pages.select(
        "doc_id", magic.alias("magic_type"), ext.alias("url_ext")
    ).select("doc_id", "magic_type", "url_ext", match.alias("ext_matches"))


def magic_sniff_sql(pages_sql: str) -> str:
    """DuckDB twin; ``pages_sql`` SELECTs (doc_id, url, raw BLOB)."""
    whens = "\n".join(
        f"WHEN left(hx, {len(p)}) = '{p}' THEN '{t}'"
        for p, t in MAGIC_TABLE
    )
    match = " OR ".join(
        f"(magic_type = '{name}' AND url_ext IN "
        f"({', '.join(repr(e) for e in exts)}))"
        for name, exts in EXT_MAP.items()
    )
    return f"""
WITH mpages AS ({pages_sql}),
hx8 AS (SELECT doc_id, url, left(hex(raw), 24) AS hx FROM mpages),
typed AS (
  SELECT doc_id,
         CASE WHEN left(hx, 8) = '{_RIFF}'
                   AND substring(hx, 17, 8) = '{_WAVE}' THEN 'wav'
         {whens}
         ELSE 'unknown' END AS magic_type,
         lower(regexp_extract(url, '{_EXT_RE}', 1)) AS url_ext
  FROM hx8
)
SELECT doc_id, magic_type, url_ext, ({match}) AS ext_matches
FROM typed
"""
