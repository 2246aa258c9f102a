"""Overlapping passage windowing (E81).

Retrieval indexes and long-context training both consume documents as
fixed-size token windows with overlap (RAG chunking; the "split long
docs with stride" rule every pretraining tokenizer pipeline applies
before packing).  This is the complement of E48 sequence packing
(which concatenates SHORT docs): E48 fills budgets, E81 splits
overflow.

Rules (all integer, both engines):
- tokens = whitespace split of trimmed text (the corpus-wide split
  convention);
- window starts at 0, stride ``s`` apart, while ``start < n_tokens``;
- a window is emitted iff it is the first (``start == 0``) or holds at
  least ``min_tail`` tokens — a shorter tail is already covered by the
  previous window's overlap;
- passage text = the ' '-joined token slice, so passage identity is a
  string equality check, not a float.

Map-only: explode over a per-doc computed start sequence; no shuffle.
At 100 TB the explode multiplies rows by ~n/s but each passage carries
only its slice, and the downstream (embedding, indexing) is the cost
center.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PASSAGE_WINDOW = 64
PASSAGE_STRIDE = 48
PASSAGE_MIN_TAIL = 8


def passage_windows(
    docs: DataFrame,
    window: int = PASSAGE_WINDOW,
    stride: int = PASSAGE_STRIDE,
    min_tail: int = PASSAGE_MIN_TAIL,
    text_col: str = "text",
) -> DataFrame:
    """docs(doc_id, text) ->
    (doc_id, passage_id, start_tok, n_tok, passage)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    d = docs.select("doc_id", toks.alias("ts"), n.alias("n")).filter(
        F.col("n") >= 1
    )
    e = d.select(
        "doc_id",
        "ts",
        "n",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.floor((F.col("n") - 1) / stride).cast("int"),
                ),
                lambda m: (m * stride).cast("long"),
            )
        ).alias("start_tok"),
    )
    n_tok = F.least(F.lit(window), F.col("n") - F.col("start_tok"))
    return (
        e.filter(
            (F.col("start_tok") == 0) | (n_tok >= F.lit(min_tail))
        )
        .select(
            "doc_id",
            (F.col("start_tok") / stride).cast("long").alias("passage_id"),
            "start_tok",
            n_tok.cast("long").alias("n_tok"),
            F.concat_ws(
                " ",
                F.slice(
                    F.col("ts"),
                    (F.col("start_tok") + 1).cast("int"),
                    n_tok.cast("int"),
                ),
            ).alias("passage"),
        )
    )


def passage_windows_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
    window: int = PASSAGE_WINDOW,
    stride: int = PASSAGE_STRIDE,
    min_tail: int = PASSAGE_MIN_TAIL,
) -> str:
    return f"""
WITH pdocs AS ({docs_sql}),
tok AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts,
         len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n
  FROM pdocs
),
st AS (
  SELECT doc_id, ts, n,
         unnest(range(0, ((n - 1) // {stride}) + 1)) * {stride} AS start_tok
  FROM tok WHERE n >= 1
)
SELECT doc_id,
       (start_tok // {stride})::BIGINT AS passage_id,
       start_tok::BIGINT AS start_tok,
       least({window}, n - start_tok)::BIGINT AS n_tok,
       array_to_string(
         list_slice(ts, (start_tok + 1)::INT,
                    (start_tok + least({window}, n - start_tok))::INT),
         ' ') AS passage
FROM st
WHERE start_tok = 0 OR least({window}, n - start_tok) >= {min_tail}
"""
