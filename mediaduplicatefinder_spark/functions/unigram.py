"""Unigram-LM subword segmentation — SentencePiece Viterbi inference
(E163; Kudo 2018, arXiv:1804.10959 §3: segment text into the
vocabulary sequence maximizing the sum of piece log-probabilities).

Completes the tokenizer family: BPE merge TRAINING (operators/
bpetrain.py) and greedy wordpiece COUNTING (functions/wordpiece.py)
exist; this is the third canon member — OPTIMAL (not greedy)
segmentation under a scored vocabulary, the inference pass every
SentencePiece-tokenized corpus runs at full scale.

Pinned contract (cross-engine, the cos_table/E162 discipline):

* vocabulary: :func:`unigram_vocab` — integer scores (scaled
  log-probs), single source of truth; the Spark expression embeds it
  as a MAP literal, the DuckDB twin as the same literals.
* text: lowercase alnum+space normalization (the tokens_expr char
  class), whitespace collapsed, trimmed, truncated to ``max_len``
  chars — both engines segment the IDENTICAL string.
* DP: best[i] = max over piece length j = 1..MAX_PIECE of
  best[i-j] + score(text[i-j+1 .. i]); evaluated in ascending j with
  STRICT improvement, so ties prefer the shortest piece — pinned, and
  single-character coverage is complete so best[i] always exists.
* all arithmetic is int64 sums of literal ints — exact in both
  engines; the traceback is a second fold over the finished table.

Spark side is 100% JVM expressions: two ``F.aggregate`` folds
(whole-stage codegen, zero UDF, zero shuffle — map-only; O(len *
MAX_PIECE) lookups per doc). The DuckDB twin mirrors both folds with
``list_reduce`` using the repo's prepend-the-init trick (DuckDB 1.0
list_reduce has no init argument; the FNV port established the
pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_PIECE = 5
SINGLE_SCORE = -100
BONUS = 55  # multi-char piece: -100*len + BONUS*(len-1) — beats singles

_MULTI = (
    "th he in er an re on at en nd ti es or te of it is as ha ng "
    "the and ing ion ent for her ter his tha ver you ith was are "
    "tion ation ther with ment ight ould ough ever hich"
).split()


def unigram_vocab() -> dict[str, int]:
    """piece -> pinned integer score (single source of truth)."""
    vocab = {c: SINGLE_SCORE for c in "abcdefghijklmnopqrstuvwxyz0123456789 "}
    for p in _MULTI:
        vocab[p] = SINGLE_SCORE * len(p) + BONUS * (len(p) - 1)
    return vocab


def with_viterbi(
    df: DataFrame, text_col: str = "text", max_len: int = 240
) -> DataFrame:
    """Adds ``n_pieces``, ``total_score``, ``seg`` ('|'-joined optimal
    piece sequence) computed from the normalized, truncated text."""
    t_expr = F.substring(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.lower(F.col(text_col)), "[^a-z0-9 \\t\\n\\r\\f]", ""
                ),
                "\\s+",
                " ",
            )
        ),
        1,
        max_len,
    )
    vocab = unigram_vocab()
    vmap = F.create_map(*[F.lit(x) for kv in sorted(vocab.items()) for x in kv])

    out = df.withColumn("__ut", t_expr)
    t = F.col("__ut")
    L = F.length(t)

    def step(acc, i):
        best = F.struct(
            (
                F.element_at(acc, i)["s"]
                + F.element_at(vmap, t.substr(i, F.lit(1))).cast("long")
            ).alias("s"),
            F.lit(1).cast("long").alias("j"),
        )
        for j in range(2, MAX_PIECE + 1):
            sc = F.element_at(vmap, t.substr(i - F.lit(j - 1), F.lit(j)))
            cand = F.element_at(acc, i - F.lit(j) + 1)["s"] + sc.cast("long")
            best = F.when(
                (i >= j) & sc.isNotNull() & (cand > best["s"]),
                F.struct(cand.alias("s"), F.lit(j).cast("long").alias("j")),
            ).otherwise(best)
        return F.concat(acc, F.array(best))

    init = F.array(
        F.struct(F.lit(0).cast("long").alias("s"), F.lit(0).cast("long").alias("j"))
    )
    tbl = F.when(L >= 1, F.aggregate(F.sequence(F.lit(1), L), init, step)).otherwise(
        init
    )
    out = out.withColumn("__utbl", tbl)
    tblc = F.col("__utbl")

    def walk(acc, _):
        jcur = F.element_at(tblc, (acc["pos"] + 1).cast("int"))["j"]
        piece = t.substr((acc["pos"] - jcur + 1).cast("int"), jcur.cast("int"))
        return F.when(
            acc["pos"] > 0,
            F.struct(
                (acc["pos"] - jcur).alias("pos"),
                F.concat(acc["seg"], F.array(piece)).alias("seg"),
            ),
        ).otherwise(acc)

    winit = F.struct(
        L.cast("long").alias("pos"),
        F.array().cast("array<string>").alias("seg"),
    )
    walked = F.when(
        L >= 1, F.aggregate(F.sequence(F.lit(1), L), winit, walk)
    ).otherwise(winit)
    seg = F.reverse(walked["seg"])
    return (
        out.withColumn("n_pieces", F.size(seg))
        .withColumn(
            "total_score",
            F.element_at(tblc, (L + 1).cast("int"))["s"].cast("long"),
        )
        .withColumn("seg", F.array_join(seg, "|"))
        .drop("__ut", "__utbl")
    )


def viterbi_sql(text_sql: str, max_len: int = 240) -> str:
    """DuckDB twin: full SELECT computing (doc_id, n_pieces,
    total_score, seg) from a ``(doc_id, text)`` relation given by
    ``text_sql``.

    DuckDB 1.0's ``list_reduce`` cannot carry this DP: an appended
    value that depends on ``acc`` keeps only the LAST append (probed
    in-session; x-dependent appends fold fine). The twin therefore
    mirrors the two folds as state-carrying WITH RECURSIVE CTEs (the
    star-replay pattern): the DP carries the 5-deep best window as
    SCALAR columns b1..b5 (the recurrence's whole lookback) plus the
    backpointer string, and the traceback walks pos -> pos - j
    prepending pieces to a string — scalars and strings accumulate
    fine under recursion. Same vocab literals, same ascending-j
    strict-improvement tie rule as the Spark expression."""
    vocab = unigram_vocab()
    map_lit = (
        "MAP {"
        + ", ".join(f"'{p}': {s}" for p, s in sorted(vocab.items()))
        + "}"
    )
    SENT = -(10**9)  # invalid-lookback sentinel; j=1 is always valid

    def sc(j: int) -> str:
        return f"map_extract({map_lit}, substr(t, (i - {j} + 2)::INT, {j}))[1]"

    s_expr = f"(b1 + {sc(1)})"
    j_expr = "1::BIGINT"
    for j in range(2, MAX_PIECE + 1):
        cond = (
            f"(i + 1 >= {j} AND {sc(j)} IS NOT NULL"
            f" AND (b{j} + {sc(j)}) > {s_expr})"
        )
        s_expr = f"(CASE WHEN {cond} THEN b{j} + {sc(j)} ELSE {s_expr} END)"
        j_expr = f"(CASE WHEN {cond} THEN {j}::BIGINT ELSE {j_expr} END)"

    return f"""
WITH RECURSIVE udocs AS ({text_sql}),
unorm AS (
  SELECT doc_id,
         substr(trim(regexp_replace(regexp_replace(lower(text),
                '[^a-z0-9 \\t\\n\\r\\f]', '', 'g'), '\\s+', ' ', 'g')),
                1, {max_len}) AS t
  FROM udocs
),
dp(doc_id, t, L, i, b1, b2, b3, b4, b5, js) AS (
  SELECT doc_id, t, len(t), 0::BIGINT,
         0::BIGINT, {SENT}::BIGINT, {SENT}::BIGINT, {SENT}::BIGINT,
         {SENT}::BIGINT, ''
  FROM unorm
  UNION ALL
  SELECT doc_id, t, L, i + 1,
         {s_expr}, b1, b2, b3, b4,
         js || CASE WHEN i = 0 THEN '' ELSE ',' END || {j_expr}::VARCHAR
  FROM dp WHERE i < L
),
done AS (
  SELECT doc_id, t, L, b1 AS total, string_split(js, ',') AS jl
  FROM dp WHERE i = L
),
walk(doc_id, t, L, total, jl, pos, seg) AS (
  SELECT doc_id, t, L, total, jl, L::BIGINT, ''
  FROM done
  UNION ALL
  SELECT doc_id, t, L, total, jl,
         pos - jl[pos::INT]::BIGINT,
         substr(t, (pos - jl[pos::INT]::BIGINT + 1)::INT, jl[pos::INT]::INT)
           || CASE WHEN seg = '' THEN '' ELSE '|' END || seg
  FROM walk WHERE pos > 0
)
SELECT doc_id,
       CASE WHEN seg = '' THEN 0
            ELSE len(string_split(seg, '|')) END::INT AS n_pieces,
       total::BIGINT AS total_score,
       seg
FROM walk WHERE pos = 0
"""
