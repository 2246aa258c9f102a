"""Character-entropy quality scoring (E76).

Low-entropy documents (keyboard mash, repeated boilerplate, padding)
and ultra-high-entropy ones (base64 blobs, minified bundles, binary
spill) are both classic webtext pre-filter kills — Shannon char
entropy and the top-character concentration are the standard cheap
signals (the gzip-compressibility proxy without running a compressor).
This is a map-only pass: one Arrow batch in, six narrow columns out,
zero shuffle at any scale.

Cross-engine float determinism (the interesting part): Spark's JVM
``log2``/``ln`` differ bit-wise from DuckDB's glibc on ~28% / ~1% of
integer inputs (measured on this machine), so the kernel runs in an
Arrow-batched Python UDF — CPython's ``math.log2`` and DuckDB's
``log2`` both resolve to the same glibc and agree bit-for-bit.  The
per-document sum of ``c * log2(c)`` terms is a LEFT FOLD in sorted
character order on both sides: Python folds sorted ``Counter`` items;
the twin folds ``list_reduce(list(t ORDER BY ch), (a,b) -> a+b)``
(DuckDB's binary UTF-8 sort == codepoint sort for single chars).  With
every operation mirrored, the doubles are bit-identical and need no
rounding on either side.

H = log2(n) - (1/n) * sum_c c*log2(c); empty documents define all
outputs as 0.
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ENTROPY_SCHEMA = (
    "doc_id long, n_chars long, n_distinct long, top_count long, "
    "top_frac double, char_entropy double"
)


def char_entropy_row(text: str | None) -> tuple[int, int, int, float, float]:
    """(n_chars, n_distinct, top_count, top_frac, char_entropy) for one
    document — the exact fold the SQL twin replays."""
    if not text:
        return (0, 0, 0, 0.0, 0.0)
    cnt = Counter(text)
    n = len(text)
    items = sorted(cnt.items())
    s = None
    for _, c in items:
        t = c * math.log2(c)
        s = t if s is None else s + t
    top = max(cnt.values())
    return (n, len(cnt), top, top / n, math.log2(n) - s / n)


def char_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs(doc_id, text) -> per-doc entropy/concentration stats."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [char_entropy_row(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_chars": pd.Series(
                        [r[0] for r in rows], dtype="int64"
                    ),
                    "n_distinct": pd.Series(
                        [r[1] for r in rows], dtype="int64"
                    ),
                    "top_count": pd.Series(
                        [r[2] for r in rows], dtype="int64"
                    ),
                    "top_frac": pd.Series(
                        [r[3] for r in rows], dtype="float64"
                    ),
                    "char_entropy": pd.Series(
                        [r[4] for r in rows], dtype="float64"
                    ),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        fn, schema=ENTROPY_SCHEMA
    )


def char_entropy_sql(docs_sql: str = "SELECT doc_id, text FROM documents") -> str:
    """DuckDB twin: same fold, same glibc log2, bit-identical doubles."""
    return f"""
WITH docs AS ({docs_sql}),
pos AS (
  SELECT doc_id, unnest(range(1, length(text) + 1)) AS f FROM docs
),
chars AS (
  SELECT p.doc_id, substr(d.text, p.f::INT, 1) AS ch
  FROM pos p JOIN docs d USING (doc_id)
),
counts AS (
  SELECT doc_id, ch, count(*)::BIGINT AS c FROM chars GROUP BY doc_id, ch
),
terms AS (SELECT doc_id, ch, c, c * log2(c) AS t FROM counts),
agg AS (
  SELECT doc_id, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_distinct,
         max(c)::BIGINT AS top_count,
         list_reduce(list(t ORDER BY ch), (a, b) -> a + b) AS s
  FROM terms GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n, 0) AS n_chars,
       coalesce(a.n_distinct, 0) AS n_distinct,
       coalesce(a.top_count, 0) AS top_count,
       CASE WHEN a.n IS NULL THEN 0.0 ELSE a.top_count / a.n END
         AS top_frac,
       CASE WHEN a.n IS NULL THEN 0.0 ELSE log2(a.n) - a.s / a.n END
         AS char_entropy
FROM docs d LEFT JOIN agg a USING (doc_id)
"""
