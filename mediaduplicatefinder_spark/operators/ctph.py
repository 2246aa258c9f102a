"""Context-triggered piecewise hashing — ssdeep-family fuzzy digests
(E187): Kornblum, "Identifying almost identical files using context
triggered piecewise hashing" (DFRWS'06, the ssdeep/spamsum design;
Tridgell's spamsum is the ancestor). Completes the engine's
fuzzy-DIGEST family: TLSH (E-tlsh) is the statistical-profile member,
CTPH is the POSITIONAL member — an edit early in the document changes
only the digest characters whose blocks it touches, because block
boundaries are chosen by content (the CDC principle, E74) rather than
offset.

Digest construction (spec semantics, shared verbatim with the twin):

- normalize like the winnow channel (lowercase alnum — digest
  identity survives formatting churn; documented delta from byte-
  level ssdeep, which fingerprints raw bytes);
- block size b = the smallest 3·2^i with 64·b >= n (spamsum's
  closed-form init; the spec's shrink-retry loop is dropped — a
  deterministic simplification, documented);
- trigger positions: the winnow polynomial 7-gram rolling hash
  (functions/winnow._kgram_hashes == oracle winnow_horner — parity
  already pinned by E15/E74) hits h ≡ b−1 (mod b) at a window end;
- each triggered segment (and the final partial segment) contributes
  ONE character: BASE64[fnv1a64(segment) mod 64]; digest = the
  concatenation, truncated to 64 chars. A second digest at block
  size 2b is emitted for cross-scale comparison (the spec's pair).

Comparison (the relation, scale shape first):

- candidate pairs REQUIRE a common 7-char digest substring — exactly
  ssdeep's common-substring gate, implemented as the inverted-index
  equi-join on (lang, effective-block-size, 7-gram): each doc posts
  its d1 under beff=b and its d2 under beff=2b, so same-b pairs and
  2x-scale pairs fall out of ONE join with no special casing;
- per (pair, beff): dist = levenshtein(d_a, d_b) (built-in in BOTH
  engines — exact integers), sim = (100·(la+lb−dist)) div (la+lb)
  (integer; the spec's weighted-edit rescale simplified to plain
  Levenshtein, documented).

At 10^12 docs the digest pass is map-only (~70 bytes/doc out), the
candidate join is band-shaped (7-gram keys over <= 58 grams/doc), and
scoring touches only gated pairs with <= 64-char strings.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import re

from mediaduplicatefinder_spark.functions.winnow import _kgram_hashes

# ASCII-exact normalization — the SAME class the twin's
# regexp_replace('[^a-zA-Z0-9]') strips. Deliberately NOT
# normalize_for_winnow: str.isalnum() keeps non-ASCII alnum ('¹'),
# which would crash the ASCII FNV and diverge from the twin's
# per-char codepoints (fuzz-caught).
_NON_ALNUM = re.compile(r"[^a-zA-Z0-9]")

_FNV_OFFSET = 14695981039346656037
_FNV_PRIME = 1099511628211
_M64 = 1 << 64


def _fnv_codepoints(s: str) -> int:
    """FNV-1a over CODEPOINTS (== the twin's unicode(char) fold; on
    the ASCII-normalized input codepoints == bytes)."""
    h = _FNV_OFFSET
    for ch in s:
        h = ((h ^ ord(ch)) * _FNV_PRIME) % _M64
    return h

CTPH_WINDOW = 7
B_MIN = 3
DIGEST_LEN = 64
B64 = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
)
_MAX_I = 24


def block_size(n: int) -> int:
    """Smallest 3*2^i with 64*b >= n (spamsum init)."""
    b = B_MIN
    while b * DIGEST_LEN < n:
        b *= 2
    return b


def _digest_at(s: str, hashes, b: int) -> str:
    n = len(s)
    ends = [
        i + CTPH_WINDOW for i, h in enumerate(hashes) if int(h) % b == b - 1
    ]
    if not ends or ends[-1] != n:
        ends.append(n)
    out = []
    prev = 0
    for e in ends:
        if e <= prev:
            continue
        seg = s[prev:e]
        out.append(B64[_fnv_codepoints(seg) % 64])
        prev = e
    return "".join(out)[:DIGEST_LEN]


def ctph_digest(text: str) -> tuple[int, str, str] | None:
    """-> (b, d1, d2) or None for empty normalized text."""
    # strip FIRST, lower second — the twin's exact order (lowering
    # can map non-ASCII INTO ASCII, e.g. U+0130 -> 'i' + U+0307, so
    # the other order diverges)
    s = _NON_ALNUM.sub("", text or "").lower()
    if not s:
        return None
    b = block_size(len(s))
    hashes = _kgram_hashes(s, CTPH_WINDOW)
    return b, _digest_at(s, hashes, b), _digest_at(s, hashes, 2 * b)


def with_ctph(docs: DataFrame) -> DataFrame:
    """docs(doc_id, lang, text) -> (doc_id, lang, bsize, d1, d2)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, langs, bs, d1s, d2s = [], [], [], [], []
            for did, lang, text in zip(
                pdf["doc_id"], pdf["lang"], pdf["text"]
            ):
                r = ctph_digest(text or "")
                if r is None:
                    continue
                ids.append(did)
                langs.append(lang)
                bs.append(r[0])
                d1s.append(r[1])
                d2s.append(r[2])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "lang": langs,
                    "bsize": bs,
                    "d1": d1s,
                    "d2": d2s,
                }
            )

    return docs.select("doc_id", "lang", "text").mapInPandas(
        fn, "doc_id long, lang string, bsize long, d1 string, d2 string"
    )


def ctph_pairs(docs: DataFrame) -> DataFrame:
    """-> (lang, doc_a, doc_b, beff, dist, sim, len_a, len_b): every
    same-lang pair sharing a 7-char digest substring at a compatible
    block scale, scored per channel."""
    # localCheckpoint, not persist: reused below but a bare
    # persist() is never released and pins executor storage for the
    # session lifetime (review r5 — the bitext.py convention).
    digs = with_ctph(docs).localCheckpoint(eager=True)

    def channel(dig_col: str, beff_col):
        d = F.col(dig_col)
        grams = F.transform(
            F.sequence(F.lit(1), F.length(d) - (CTPH_WINDOW - 1)),
            lambda i: d.substr(i, F.lit(CTPH_WINDOW)),
        )
        return (
            digs.filter(F.length(d) >= CTPH_WINDOW)
            .select(
                "doc_id",
                "lang",
                beff_col.alias("beff"),
                d.alias("dig"),
                F.explode(F.array_distinct(grams)).alias("gram"),
            )
        )

    rows = channel("d1", F.col("bsize")).unionByName(
        channel("d2", F.col("bsize") * 2)
    )
    a = rows.select(
        F.col("doc_id").alias("doc_a"),
        "lang",
        "beff",
        F.col("dig").alias("dig_a"),
        "gram",
    )
    b = rows.select(
        F.col("doc_id").alias("doc_b"),
        "lang",
        "beff",
        F.col("dig").alias("dig_b"),
        "gram",
    )
    pairs = (
        a.join(b, ["lang", "beff", "gram"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("lang", "doc_a", "doc_b", "beff", "dig_a", "dig_b")
        .distinct()
    )
    la = F.length("dig_a")
    lb = F.length("dig_b")
    dist = F.levenshtein("dig_a", "dig_b")
    return pairs.select(
        "lang",
        "doc_a",
        "doc_b",
        "beff",
        dist.cast("long").alias("dist"),
        F.floor((100 * (la + lb - dist)) / (la + lb))
        .cast("long")
        .alias("sim"),
        la.cast("long").alias("len_a"),
        lb.cast("long").alias("len_b"),
    )


def ctph_pairs_sql(
    docs_sql: str = "SELECT doc_id, lang, text FROM documents",
) -> str:
    """DuckDB twin: identical normalization, winnow_horner triggers,
    fnv segment chars, block-size CASE ladder, gram join, levenshtein."""
    from mediaduplicatefinder_spark.oracle.lsh_sql import winnow_horner

    _FNV_OFFSET = 14695981039346656037
    _FNV_PRIME = 1099511628211
    M64 = str(1 << 64)

    def fnv(col: str) -> str:
        return (
            f"list_reduce(list_prepend({_FNV_OFFSET}::HUGEINT, "
            f"list_transform(range(1, len({col}) + 1), "
            f"i -> unicode({col}[i])::HUGEINT)), "
            f"(h, c) -> ((xor(h::UBIGINT, c::UBIGINT)::HUGEINT"
            f" * {_FNV_PRIME}) % {M64}))::UBIGINT"
        )

    ladder = "CASE " + " ".join(
        f"WHEN n <= {B_MIN * (1 << i) * DIGEST_LEN} THEN {B_MIN * (1 << i)}"
        for i in range(_MAX_I)
    ) + f" ELSE {B_MIN * (1 << _MAX_I)} END"
    k = CTPH_WINDOW

    def digest_cte(tag: str, bexpr: str) -> str:
        """digest at block size ``bexpr`` (refers to cn.b)."""
        return f"""
ends{tag} AS (
  SELECT doc_id, e FROM (
    SELECT doc_id, p + {k - 1} AS e
    FROM (
      SELECT doc_id, p, {winnow_horner(k)} AS hv, b
      FROM (SELECT doc_id, b, p, substr(s, p, {k}) AS g
            FROM cn, unnest(range(1, length(s) - {k} + 2)) AS t(p)
            WHERE length(s) >= {k}))
    WHERE hv % ({bexpr}) = ({bexpr}) - 1
  )
  UNION
  SELECT doc_id, length(s) AS e FROM cn
),
segs{tag} AS (
  SELECT doc_id, e,
         coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e), 0) AS s0
  FROM ends{tag}
),
dig{tag} AS (
  SELECT c.doc_id,
         substr(string_agg(
           substr('{B64}', ({fnv("substr(c.s, (g.s0 + 1)::INT, (g.e - g.s0)::INT)")} % 64 + 1)::INT, 1),
           '' ORDER BY g.e), 1, {DIGEST_LEN}) AS dig
  FROM segs{tag} g JOIN cn c USING (doc_id)
  WHERE g.e > g.s0
  GROUP BY c.doc_id
)"""

    return f"""
WITH src AS MATERIALIZED ({docs_sql}),
cn AS MATERIALIZED (
  SELECT doc_id, lang, s, ({ladder.replace("n <=", "length(s) <=")}) AS b
  FROM (SELECT doc_id, lang,
               lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS s
        FROM src)
  WHERE length(s) > 0
),
{digest_cte("1", "b")},
{digest_cte("2", "2 * b")},
digs AS MATERIALIZED (
  SELECT c.doc_id, c.lang, c.b AS bsize, d1.dig AS d1, d2.dig AS d2
  FROM cn c
  JOIN dig1 d1 USING (doc_id)
  JOIN dig2 d2 USING (doc_id)
),
chan AS MATERIALIZED (
  SELECT doc_id, lang, beff, dig, substr(dig, p, {k}) AS gram
  FROM (
    SELECT doc_id, lang, bsize AS beff, d1 AS dig FROM digs
    UNION ALL
    SELECT doc_id, lang, 2 * bsize AS beff, d2 AS dig FROM digs
  ), unnest(range(1, length(dig) - {k} + 2)) AS t(p)
  WHERE length(dig) >= {k}
),
prs AS (
  SELECT DISTINCT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.beff, a.dig AS dig_a, b.dig AS dig_b
  FROM chan a JOIN chan b
    ON a.lang = b.lang AND a.beff = b.beff AND a.gram = b.gram
   AND a.doc_id < b.doc_id
)
SELECT lang, doc_a, doc_b, beff,
       levenshtein(dig_a, dig_b)::BIGINT AS dist,
       ((100 * (length(dig_a) + length(dig_b)
                - levenshtein(dig_a, dig_b)))
        // (length(dig_a) + length(dig_b)))::BIGINT AS sim,
       length(dig_a)::BIGINT AS len_a,
       length(dig_b)::BIGINT AS len_b
FROM prs
"""
