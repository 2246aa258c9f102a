"""TLSH-style locality-sensitive fuzzy digest (E164; Oliver, Cheng &
Chen 2013, "TLSH — A Locality Sensitive Hash", CTC 2013 — the digest
family abuse/spam/threat-intel sharing ecosystems run at corpus
scale).

Where MinHash sketches SET overlap and SimHash sketches weighted
token votes, TLSH profiles the LOCAL BYTE STRUCTURE: a 5-byte sliding
window emits 6 Pearson-hashed triplets per position into 128 buckets;
the digest quartile-codes the bucket histogram into 2-bit cells. Two
texts with similar local byte statistics — reorderings, small edits,
insertions — produce digests at small distance even when token sets
diverge. It is the structural-similarity member of the signature
family (P1/P2/E3/E15 are pixel/bit/shingle members).

Faithful to the TLSH decision STRUCTURE, with pinned repo-local
constants (digests are deliberately not interchange-compatible —
there is no network access to the reference table, and the oracle
contract needs one source of truth):

* ``PEARSON``: a pinned 256-permutation literal (single source of
  truth; the DuckDB twin embeds the same literal list).
* triplets per position i (0-based, window b[i-4..i]):
  (b[i],b[i-1],b[i-2])@salt2, (b[i],b[i-1],b[i-3])@3,
  (b[i],b[i-2],b[i-3])@5, (b[i],b[i-1],b[i-4])@7,
  (b[i],b[i-2],b[i-4])@11, (b[i],b[i-3],b[i-4])@13 — the spec's
  triplet/salt scheme; bucket = pearson % 128.
* quartiles = 32nd/64th/96th order statistics of the 128 counts
  (integers — exact both engines); cell = 3/2/1/0 by strict >
  comparisons; byte k packs cells 4k..4k+3 little-endian 2-bit,
  emitted as a 64-char lowercase hex body.
* header: ``lvalue`` = count of pinned 1.5^k integer thresholds
  <= length (the spec's log_1.5 capture without cross-engine
  floating logs), ``q1_ratio``/``q2_ratio`` = (q*100/q3) % 16
  integer-division nibbles (0 when q3 = 0).
* input: the engine's normalized text (lowercase alnum+space, the
  tokens_expr class, whitespace collapsed); docs under 50 bytes emit
  no digest (the spec's minimum-length gate).

Scale shape: map-only pandas UDF, numpy table-gather chains per Arrow
batch; 35-byte digests. Pairing rides any banding channel over the
body (or the E164 distance below at candidate grain).
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

# pinned permutation: random.Random(0x7157).shuffle(range(256)) —
# frozen as a literal so the contract cannot drift with the RNG
PEARSON = [
    91, 6, 41, 77, 5, 101, 0, 194, 160, 60, 189, 212, 72, 40, 125, 97,
]


def _build_pearson() -> list[int]:
    import random

    perm = list(range(256))
    random.Random(0x7157).shuffle(perm)
    assert perm[:16] == PEARSON  # drift guard on the frozen prefix
    return perm


PEARSON = _build_pearson()

TRIPLETS = (  # (salt, off1, off2, off3) — offsets back from position i
    (2, 0, 1, 2),
    (3, 0, 1, 3),
    (5, 0, 2, 3),
    (7, 0, 1, 4),
    (11, 0, 2, 4),
    (13, 0, 3, 4),
)
N_BUCKETS = 128
MIN_LEN = 50
MAX_LEN = 4096  # digest window cap (both engines truncate identically)
# 1.5^k integer thresholds for the log-length capture (k = 1..48)
LVALUES = []
_v = 1.0
while len(LVALUES) < 48:
    _v *= 1.5
    LVALUES.append(int(_v))

_NORM_STRIP = re.compile(r"[^a-z0-9 \t\n\r\f]")
_WS = re.compile(r"\s+")


def normalize(text: str) -> str:
    return _WS.sub(" ", _NORM_STRIP.sub("", (text or "").lower())).strip()[
        :MAX_LEN
    ]


def tlsh_digest(text: str) -> tuple[int, int, int, str] | None:
    """-> (lvalue, q1_ratio, q2_ratio, body_hex) or None under MIN_LEN."""
    t = normalize(text)
    n = len(t)
    if n < MIN_LEN:
        return None
    b = np.frombuffer(t.encode("ascii"), dtype=np.uint8).astype(np.int64)
    T = np.asarray(PEARSON, dtype=np.int64)
    counts = np.zeros(N_BUCKETS, dtype=np.int64)
    views = [b[4 - k : n - k] for k in range(5)]  # views[k] = b[i-k]
    for salt, o1, o2, o3 in TRIPLETS:
        h = T[np.bitwise_xor(T[salt], views[o1])]
        h = T[np.bitwise_xor(h, views[o2])]
        h = T[np.bitwise_xor(h, views[o3])]
        np.add.at(counts, h % N_BUCKETS, 1)
    s = np.sort(counts)
    q1, q2, q3 = int(s[31]), int(s[63]), int(s[95])
    cells = np.where(
        counts > q3, 3, np.where(counts > q2, 2, np.where(counts > q1, 1, 0))
    )
    by = cells.reshape(32, 4)
    vals = by[:, 0] | (by[:, 1] << 2) | (by[:, 2] << 4) | (by[:, 3] << 6)
    body = "".join(f"{v:02x}" for v in vals)
    lvalue = int(sum(1 for th in LVALUES if th <= n))
    q1r = (q1 * 100 // q3) % 16 if q3 else 0
    q2r = (q2 * 100 // q3) % 16 if q3 else 0
    return lvalue, q1r, q2r, body


def with_tlsh(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (id, lvalue, q1_ratio, q2_ratio, body); sub-MIN_LEN docs drop."""
    schema = f"{id_col} long, lvalue int, q1_ratio int, q2_ratio int, body string"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (id_col, "lvalue", "q1_ratio", "q2_ratio", "body")}
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                d = tlsh_digest(txt)
                if d is None:
                    continue
                out[id_col].append(int(i))
                out["lvalue"].append(d[0])
                out["q1_ratio"].append(d[1])
                out["q2_ratio"].append(d[2])
                out["body"].append(d[3])
            yield pd.DataFrame(
                {
                    id_col: pd.Series(out[id_col], dtype="int64"),
                    "lvalue": pd.Series(out["lvalue"], dtype="int32"),
                    "q1_ratio": pd.Series(out["q1_ratio"], dtype="int32"),
                    "q2_ratio": pd.Series(out["q2_ratio"], dtype="int32"),
                    "body": pd.Series(out["body"], dtype="object"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(fn, schema=schema)


def tlsh_sql(text_sql: str) -> str:
    """DuckDB twin over a ``(doc_id, text)`` relation: same pinned
    Pearson literal, same triplet/salt scheme, same order-statistic
    quartiles and little-endian 2-bit packing."""
    tl = "[" + ", ".join(str(v) for v in PEARSON) + "]"
    trips = ", ".join(f"({s}, {o1}, {o2}, {o3})" for s, o1, o2, o3 in TRIPLETS)
    lvals = ", ".join(str(v) for v in LVALUES)

    def pearson(prev: str, c: str) -> str:
        return f"list_extract(tl, xor({prev}, {c}) + 1)"

    h = "list_extract(tl, tr.salt + 1)"
    for o in ("tr.o1", "tr.o2", "tr.o3"):
        h = pearson(h, f"ascii(substr(t, (p.i - {o})::INT, 1))")

    return f"""
WITH tdocs AS ({text_sql}),
tnorm AS (
  SELECT doc_id,
         substr(trim(regexp_replace(regexp_replace(lower(text),
                '[^a-z0-9 \\t\\n\\r\\f]', '', 'g'), '\\s+', ' ', 'g')),
                1, {MAX_LEN}) AS t
  FROM tdocs
),
eligible AS (SELECT doc_id, t, len(t) AS n FROM tnorm WHERE len(t) >= {MIN_LEN}),
tbl AS (SELECT {tl} AS tl),
trips(salt, o1, o2, o3) AS (VALUES {trips}),
hits AS (
  SELECT e.doc_id, ({h}) % {N_BUCKETS} AS bucket
  FROM eligible e, tbl,
       LATERAL (SELECT unnest(range(5, e.n + 1)) AS i) p,
       trips tr
),
counts AS (
  SELECT e.doc_id, g.b AS bucket, count(h.bucket)::BIGINT AS c
  FROM eligible e
  CROSS JOIN (SELECT unnest(range({N_BUCKETS})) AS b) g
  LEFT JOIN hits h ON h.doc_id = e.doc_id AND h.bucket = g.b
  GROUP BY 1, 2
),
quarts AS (
  SELECT doc_id,
         max(CASE WHEN rn = 32 THEN c END) AS q1,
         max(CASE WHEN rn = 64 THEN c END) AS q2,
         max(CASE WHEN rn = 96 THEN c END) AS q3
  FROM (SELECT doc_id, c,
               row_number() OVER (PARTITION BY doc_id ORDER BY c) AS rn
        FROM counts)
  GROUP BY 1
),
cells AS (
  SELECT c.doc_id, c.bucket,
         CASE WHEN c.c > q.q3 THEN 3 WHEN c.c > q.q2 THEN 2
              WHEN c.c > q.q1 THEN 1 ELSE 0 END AS cell
  FROM counts c JOIN quarts q USING (doc_id)
),
bytes AS (
  SELECT doc_id, bucket // 4 AS k,
         sum(cell << (2 * (bucket % 4)))::INT AS byte
  FROM cells GROUP BY 1, 2
),
body AS (
  SELECT doc_id, string_agg(printf('%02x', byte), '' ORDER BY k) AS body
  FROM bytes GROUP BY 1
)
SELECT e.doc_id,
       len(list_filter([{lvals}], v -> v <= e.n))::INT AS lvalue,
       (CASE WHEN q.q3 = 0 THEN 0 ELSE (q.q1 * 100 // q.q3) % 16 END)::INT
         AS q1_ratio,
       (CASE WHEN q.q3 = 0 THEN 0 ELSE (q.q2 * 100 // q.q3) % 16 END)::INT
         AS q2_ratio,
       b.body
FROM eligible e JOIN quarts q USING (doc_id) JOIN body b USING (doc_id)
"""
