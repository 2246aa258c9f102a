"""HTTP response-header extraction (E118).

WARC response records (E38) carry the raw HTTP head in front of the
body; the crawl pipeline's earliest routing decisions read it — status
(non-200s skip extraction; 3xx feed the frontier; 200-with-error-body
is E101's soft-404 case), media type (routes to E109's byte-level
check), declared charset (input to the E105 sniff order), and the
ETag/Last-Modified validators that make recrawls (E110) conditional.

Deterministic subset: header block = everything before the first
CRLF-CRLF; header keys matched case-insensitively line-anchored;
content-type split at ';' with a lowercased media type and a
charset= parameter pull; ETag unquoted.  Payloads without an HTTP
head yield NULL fields and the full payload as body.  One map-only
projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STATUS_RE = "^HTTP/[0-9.]+ ([0-9]{3})"
_HEAD_RE = "(?s)^(.*?)\\r\\n\\r\\n"
_BODY_STRIP_RE = "(?s)^.*?\\r\\n\\r\\n"
_CTYPE_RE = "(?im)^content-type:[ \\t]*([^;\\r\\n]+)"
_CHARSET_RE = "(?i)charset=([a-zA-Z0-9_-]+)"
_ETAG_RE = '(?im)^etag:[ \\t]*"?([^"\\r\\n]*)"?'
_LASTMOD_RE = "(?im)^last-modified:[ \\t]*([^\\r\\n]+)"


def parse_http_headers(
    records: DataFrame, payload_col: str = "payload", key_col: str = "doc_id"
) -> DataFrame:
    """records(doc_id, payload) -> (doc_id, status, content_type,
    charset, etag, last_modified, body_len, is_ok)."""
    p = F.col(payload_col)
    head = F.regexp_extract(p, _HEAD_RE, 1)
    s = F.regexp_extract(p, _STATUS_RE, 1)
    status = F.when(s != "", s.cast("long"))
    ct = F.lower(F.trim(F.regexp_extract(head, _CTYPE_RE, 1)))
    cs = F.lower(F.regexp_extract(head, _CHARSET_RE, 1))
    etag = F.regexp_extract(head, _ETAG_RE, 1)
    lm = F.regexp_extract(head, _LASTMOD_RE, 1)
    body = F.regexp_replace(p, _BODY_STRIP_RE, "")
    nn = lambda c: F.when(c != "", c)  # noqa: E731  '' -> NULL
    return records.select(
        key_col,
        status.alias("status"),
        nn(ct).alias("content_type"),
        nn(cs).alias("charset"),
        nn(etag).alias("etag"),
        nn(lm).alias("last_modified"),
        F.length(body).cast("long").alias("body_len"),
        F.coalesce(status == 200, F.lit(False)).alias("is_ok"),
    )


def parse_http_headers_sql(records_sql: str) -> str:
    """DuckDB twin; ``records_sql`` SELECTs (doc_id, payload)."""
    return f"""
WITH hrec AS ({records_sql}),
parsed AS (
  SELECT doc_id,
         regexp_extract(payload, '{_STATUS_RE}', 1) AS s,
         regexp_extract(payload, '{_HEAD_RE}', 1) AS head,
         regexp_replace(payload, '{_BODY_STRIP_RE}', '') AS body
  FROM hrec
),
fields AS (
  SELECT doc_id,
         CASE WHEN s <> '' THEN s::BIGINT END AS status,
         lower(trim(regexp_extract(head, '{_CTYPE_RE}', 1))) AS ct,
         lower(regexp_extract(head, '{_CHARSET_RE}', 1)) AS cs,
         regexp_extract(head, '{_ETAG_RE}', 1) AS et,
         regexp_extract(head, '{_LASTMOD_RE}', 1) AS lm,
         len(body)::BIGINT AS body_len
  FROM parsed
)
SELECT doc_id, status,
       CASE WHEN ct <> '' THEN ct END AS content_type,
       CASE WHEN cs <> '' THEN cs END AS charset,
       CASE WHEN et <> '' THEN et END AS etag,
       CASE WHEN lm <> '' THEN lm END AS last_modified,
       body_len,
       coalesce(status = 200, FALSE) AS is_ok
FROM fields
"""
