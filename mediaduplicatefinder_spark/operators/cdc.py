"""Content-defined chunking dedup (E74, FastCDC/rsync-family).

The storage-granularity dedup channel: chunk boundaries are chosen by
the CONTENT (cut where a rolling window hash hits a mask), so an
insertion or deletion shifts only the chunks it touches — unlike
fixed n-grams (E69 onion) or fixed windows (E48 packing), the rest of
the document re-aligns and still dedups. This is how crawl-snapshot
storage dedup works (rsync '96, LBFS SOSP '01, FastCDC ATC '16), and
the natural complement to the engine's similarity channels: onion
scores mosaic contamination, CDC quantifies the BYTES a
content-addressed store would save.

Rule set (all integer, both engines):
- normalize like the winnow channel (lowercase alnum — P5-style), so
  chunk identity survives formatting churn;
- window hash = the winnow polynomial 16-gram hash (functions/winnow
  ._kgram_hashes == oracle winnow_horner, parity already pinned by the
  E15 twin); position b (1-based, window END) is a CUT CANDIDATE iff
  hash % MASK_MOD == 0;
- greedy walk with min/max chunk sizes: from consumed prefix s, the
  next boundary is min( first candidate >= s + MIN_SIZE, s + MAX_SIZE,
  L ) — the FastCDC min/max normalization, sequential per document
  (the SQL twin replays it as a linear WITH RECURSIVE walk over a
  precomputed next-candidate table, the E71 pattern);
- chunk identity: first 8 bytes of sha256(chunk) big-endian (stdlib,
  computed INSIDE the chunker so only 16-byte rows ever leave the
  Arrow pass — chunk text never shuffles); the oracle groups by the
  chunk STRING, so agreement doubles as the collision check
  (xxh64-channel precedent);
- an instance is duplicated iff its chunk content occurs in >= 2
  distinct documents (the E69 order-free rule).

Scale shape: chunking is map-only; the document-frequency pass is ONE
hash-keyed window over 16-byte rows; per-doc shrink agg + spine join.
"""

from __future__ import annotations

import hashlib
from bisect import bisect_left
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.winnow import (
    _kgram_hashes,
    normalize_for_winnow,
)

CDC_WINDOW = 16
MASK_MOD = 64  # expected raw chunk ~64 chars before min/max shaping
MIN_SIZE = 32
MAX_SIZE = 256

CHUNK_SCHEMA = "doc_id long, chash long, clen long"


def chunk_offsets(s: str) -> list[tuple[int, int]]:
    """Greedy (start_1based, length) chunk layout of a normalized
    string — the exact walk the SQL twin replays."""
    L = len(s)
    if L == 0:
        return []
    h = _kgram_hashes(s, CDC_WINDOW)
    cand = [i + CDC_WINDOW for i in range(len(h)) if int(h[i]) % MASK_MOD == 0]
    out = []
    s0 = 0
    while s0 < L:
        i = bisect_left(cand, s0 + MIN_SIZE)
        nb = cand[i] if i < len(cand) else L
        e = min(nb, s0 + MAX_SIZE, L)
        out.append((s0 + 1, e - s0))
        s0 = e
    return out


def _chunk_id(chunk: str) -> int:
    v = int.from_bytes(hashlib.sha256(chunk.encode()).digest()[:8], "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def cdc_chunks(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs(doc_id, text) -> exploded (doc_id, chash, clen) chunk rows."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, ls = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                s = normalize_for_winnow(text or "")
                for cs, cl in chunk_offsets(s):
                    ids.append(doc_id)
                    hs.append(_chunk_id(s[cs - 1 : cs - 1 + cl]))
                    ls.append(cl)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chash": pd.Series(hs, dtype="int64"),
                    "clen": pd.Series(ls, dtype="int64"),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(fn, schema=CHUNK_SCHEMA)


def cdc_dedup_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs(doc_id, text) -> (doc_id, n_chunks, n_dup_chunks,
    bytes_total, bytes_dup, dedup_ratio): per-document storage-dedup
    accounting under content-defined chunking."""
    ch = cdc_chunks(docs, text_col)
    per_doc_chunk = ch.groupBy("doc_id", "chash", "clen").agg(
        F.count(F.lit(1)).alias("c")
    )
    ndocs = F.count(F.lit(1)).over(Window.partitionBy("chash"))
    agg = (
        per_doc_chunk.withColumn("ndocs", ndocs)
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_chunks"),
            F.sum(F.when(F.col("ndocs") >= 2, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_dup_chunks"),
            F.sum(F.col("c") * F.col("clen")).cast("long").alias("bytes_total"),
            F.sum(
                F.when(F.col("ndocs") >= 2, F.col("c") * F.col("clen")).otherwise(0)
            )
            .cast("long")
            .alias("bytes_dup"),
        )
    )
    out = docs.select("doc_id").join(agg, "doc_id", "left")
    bt = F.coalesce("bytes_total", F.lit(0).cast("long"))
    bd = F.coalesce("bytes_dup", F.lit(0).cast("long"))
    return out.select(
        "doc_id",
        F.coalesce("n_chunks", F.lit(0).cast("long")).alias("n_chunks"),
        F.coalesce("n_dup_chunks", F.lit(0).cast("long")).alias("n_dup_chunks"),
        bt.alias("bytes_total"),
        bd.alias("bytes_dup"),
        F.when(bt > 0, F.round(bd.cast("double") / bt, 6))
        .otherwise(F.lit(0.0))
        .alias("dedup_ratio"),
    )


def cdc_dedup_stats_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB twin: same normalization + winnow_horner window hash,
    next-candidate table, linear recursive walk, chunk-STRING grouping."""
    from mediaduplicatefinder_spark.oracle.lsh_sql import winnow_horner

    k, mod, mn, mx = CDC_WINDOW, MASK_MOD, MIN_SIZE, MAX_SIZE
    return f"""WITH RECURSIVE cdc_in AS MATERIALIZED ({docs_sql}),
cn AS MATERIALIZED (
  SELECT doc_id,
         lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS s
  FROM cdc_in
),
cand AS (  -- cut candidates: window-END positions whose hash hits the mask
  SELECT doc_id, p + {k - 1} AS b
  FROM (
    SELECT doc_id, p, {winnow_horner(k)} AS hv
    FROM (SELECT doc_id, p, substr(s, p, {k}) AS g
          FROM cn, unnest(range(1, length(s) - {k} + 2)) AS t(p)
          WHERE length(s) >= {k}))
  WHERE hv % {mod} = 0
),
nc AS MATERIALIZED (  -- first candidate >= q, for every position q
  SELECT q.doc_id, q.q, MIN(c.b) AS nb
  FROM (SELECT doc_id, q FROM cn,
              unnest(range(1, length(s) + 1)) AS t(q)
        WHERE length(s) > 0) q
  LEFT JOIN cand c ON c.doc_id = q.doc_id AND c.b >= q.q
  GROUP BY 1, 2
),
wk AS (  -- greedy min/max walk; state = consumed prefix cs0, next end e
  SELECT d.doc_id, 0::BIGINT AS cs0,
         LEAST(COALESCE(n.nb, d.L), {mx}::BIGINT, d.L) AS e, d.L
  FROM (SELECT doc_id, length(s)::BIGINT AS L FROM cn WHERE length(s) > 0) d
  LEFT JOIN nc n ON n.doc_id = d.doc_id AND n.q = {mn}
  UNION ALL
  SELECT w.doc_id, w.e,
         LEAST(COALESCE(n.nb, w.L), w.e + {mx}, w.L), w.L
  FROM wk w
  LEFT JOIN nc n ON n.doc_id = w.doc_id AND n.q = w.e + {mn}
  WHERE w.e < w.L
),
chunks AS MATERIALIZED (
  SELECT w.doc_id, substr(cn.s, (w.cs0 + 1)::INT, (w.e - w.cs0)::INT) AS ck,
         (w.e - w.cs0)::BIGINT AS clen
  FROM wk w JOIN cn USING (doc_id)
),
dc AS (
  SELECT doc_id, ck, clen, COUNT(*) AS c
  FROM chunks GROUP BY 1, 2, 3
),
freq AS (
  SELECT ck, COUNT(*) AS ndocs FROM dc GROUP BY 1
),
per_doc AS (
  SELECT dc.doc_id,
         SUM(dc.c)::BIGINT AS n_chunks,
         SUM(CASE WHEN f.ndocs >= 2 THEN dc.c ELSE 0 END)::BIGINT
           AS n_dup_chunks,
         SUM(dc.c * dc.clen)::BIGINT AS bytes_total,
         SUM(CASE WHEN f.ndocs >= 2 THEN dc.c * dc.clen ELSE 0 END)::BIGINT
           AS bytes_dup
  FROM dc JOIN freq f USING (ck)
  GROUP BY 1
)
SELECT i.doc_id,
       COALESCE(p.n_chunks, 0)::BIGINT AS n_chunks,
       COALESCE(p.n_dup_chunks, 0)::BIGINT AS n_dup_chunks,
       COALESCE(p.bytes_total, 0)::BIGINT AS bytes_total,
       COALESCE(p.bytes_dup, 0)::BIGINT AS bytes_dup,
       CASE WHEN COALESCE(p.bytes_total, 0) > 0
            THEN round(p.bytes_dup::DOUBLE / p.bytes_total, 6)
            ELSE 0.0 END AS dedup_ratio
FROM (SELECT doc_id FROM cdc_in) i
LEFT JOIN per_doc p USING (doc_id)"""
