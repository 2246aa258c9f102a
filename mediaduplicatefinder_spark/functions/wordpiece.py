"""Greedy maximal-munch subword tokenization (E71, WordPiece-style).

Training pipelines budget and pack by TOKENS OF THE ACTUAL TOKENIZER,
not whitespace words — the engine's E12 whitespace/BPE-regex counters
approximate, this operator counts exactly: per word (lowercased
whitespace token), repeatedly take the LONGEST vocabulary entry that
prefixes the remainder (WordPiece's left-to-right maximal munch, Wu et
al. 2016 / Devlin et al. 2018 greedy variant without the ## marker);
a character not starting any vocab entry is consumed as one UNK.

The vocabulary is an engine constant (letters+digits as single-char
units plus frequent English sub-units), shared verbatim with the SQL
twin. The twin proves a genuinely ITERATIVE per-character algorithm
against DuckDB: match lengths for every (word, position) are a flat
relational join (substr(w, p, len(tok)) = tok), and the munch chain is
a linear WITH RECURSIVE walk over that table — one deterministic path
per word, terminal state pos > len(word).

Scale shape: map-only mapInPandas (the tokenizer loop is the published
"tokenization is the CPU-bound stage" reality — O(chars * max_len)
per doc, zero data motion); the per-doc aggregate shrinks to four
counters before anything shuffles (nothing does).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# engine constant, shared with the SQL twin; longest entry bounds the
# munch probe. Letters+digits as singles mean UNK only on non-alnum.
VOCAB: tuple[str, ...] = tuple(
    sorted(
        {
            *"abcdefghijklmnopqrstuvwxyz0123456789",
            "the", "ing", "tion", "ation", "ment", "ness", "able",
            "ible", "ous", "ive", "ure", "est", "ess", "ate", "ity",
            "and", "for", "with", "was", "you", "pre", "pro", "con",
            "com", "dis", "sub", "ex", "un", "re", "in", "on", "at",
            "an", "ar", "as", "en", "ent", "er", "ed", "es", "he",
            "ion", "is", "it", "le", "ly", "nd", "of", "or", "ou",
            "st", "te", "ter", "th", "ti", "to", "ve", "ver",
        }
    )
)
MAX_TOKEN_LEN = max(len(v) for v in VOCAB)

TOKENS_SCHEMA = (
    "doc_id long, n_words long, n_subwords long, n_unk long,"
    " tokens_per_word double"
)


def munch_word(word: str, vocab: frozenset[str] | None = None) -> tuple[int, int]:
    """(n_subwords, n_unk) for one lowercased word — the exact rule the
    SQL twin replays."""
    v = vocab if vocab is not None else _VOCAB_SET
    pos, n_tok, n_unk = 0, 0, 0
    n = len(word)
    while pos < n:
        ml = 0
        for l in range(min(MAX_TOKEN_LEN, n - pos), 0, -1):
            if word[pos : pos + l] in v:
                ml = l
                break
        if ml == 0:
            n_unk += 1
            ml = 1
        n_tok += 1
        pos += ml
    return n_tok, n_unk


_VOCAB_SET = frozenset(VOCAB)


def wordpiece_token_stats(docs: DataFrame) -> DataFrame:
    """docs(doc_id, text) -> (doc_id, n_words, n_subwords, n_unk,
    tokens_per_word): exact greedy-subword counts per document."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            nw, ns, nu = [], [], []
            for text in pdf["text"]:
                words = [w for w in (text or "").strip().lower().split()]
                t = u = 0
                for w in words:
                    wt, wu = munch_word(w)
                    t += wt
                    u += wu
                nw.append(len(words))
                ns.append(t)
                nu.append(u)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_words": pd.Series(nw, dtype="int64"),
                    "n_subwords": pd.Series(ns, dtype="int64"),
                    "n_unk": pd.Series(nu, dtype="int64"),
                }
            )
            out["tokens_per_word"] = (
                (out["n_subwords"] / out["n_words"]).where(out["n_words"] > 0, 0.0)
            ).round(6)
            yield out

    return docs.select("doc_id", "text").mapInPandas(fn, schema=TOKENS_SCHEMA)


def wordpiece_token_stats_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """Recursive-CTE DuckDB twin of the same maximal munch.

    NOTE python str.split() vs the engine's other twins: split() with
    no argument drops ALL whitespace runs including leading/trailing,
    which list_filter(string_split_regex(...), x -> x <> '') mirrors
    exactly."""
    vocab_vals = ", ".join(f"('{v}')" for v in VOCAB)
    return f"""WITH RECURSIVE wp_in AS MATERIALIZED ({docs_sql}),
vocab(tok) AS (VALUES {vocab_vals}),
words AS (
  SELECT doc_id, wi, w, len(w) AS wl
  FROM (
    SELECT doc_id,
           generate_subscripts(ws, 1) AS wi,
           unnest(ws) AS w
    FROM (SELECT doc_id,
                 list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                             x -> x <> '') AS ws
          FROM wp_in))
),
mlen AS MATERIALIZED (
  SELECT p.doc_id, p.wi, p.p,
         COALESCE(MAX(length(v.tok)), 0) AS ml
  FROM (SELECT doc_id, wi, w, unnest(generate_series(1, wl)) AS p
        FROM words) p
  LEFT JOIN vocab v ON substr(p.w, p.p, length(v.tok)) = v.tok
  GROUP BY 1, 2, 3
),
st AS (
  SELECT doc_id, wi, wl, 1 AS pos, 0 AS n_tok, 0 AS n_unk FROM words
  UNION ALL
  SELECT st.doc_id, st.wi, st.wl,
         st.pos + GREATEST(m.ml, 1),
         st.n_tok + 1,
         st.n_unk + CASE WHEN m.ml = 0 THEN 1 ELSE 0 END
  FROM st JOIN mlen m
    ON m.doc_id = st.doc_id AND m.wi = st.wi AND m.p = st.pos
  WHERE st.pos <= st.wl
),
terminal AS (
  SELECT doc_id, wi, n_tok, n_unk FROM st WHERE pos > wl
),
per_doc AS (
  SELECT doc_id, COUNT(*)::BIGINT AS n_words,
         SUM(n_tok)::BIGINT AS n_subwords,
         SUM(n_unk)::BIGINT AS n_unk
  FROM terminal GROUP BY 1
)
SELECT i.doc_id,
       COALESCE(p.n_words, 0)::BIGINT AS n_words,
       COALESCE(p.n_subwords, 0)::BIGINT AS n_subwords,
       COALESCE(p.n_unk, 0)::BIGINT AS n_unk,
       CASE WHEN COALESCE(p.n_words, 0) > 0
            THEN round(p.n_subwords::DOUBLE / p.n_words, 6)
            ELSE 0.0 END AS tokens_per_word
FROM (SELECT DISTINCT doc_id FROM wp_in) i
LEFT JOIN per_doc p USING (doc_id)"""
