"""Exact long-match substring dedup (SURVEY.md §7 step 9 — the optional
suffix-array stage of the north rule).

Finds document pairs sharing a common substring of length >= min_match
chars (after P5-style normalization), without materializing any O(n²)
comparison:

1. **Candidate channel — winnowing fingerprints** (functions/winnow.py,
   Schleimer et al. SIGMOD'03): with k-gram size k and window w, any
   common substring of length >= w + k - 1 is GUARANTEED to contribute
   at least one shared fingerprint, so joining docs on fingerprint
   hashes has recall 1.0 for matches >= min_match = w + k - 1. The
   join is a plain hash equi-join on an int64 — the same shape as the
   MinHash band join, with the same skew treatment (hot fingerprints =
   boilerplate strings; capped + reported).
2. **Verify — suffix automaton**: per candidate pair, the exact longest
   common substring length in O(|a| + |b|) via a suffix automaton of
   the shorter text (the linear-time alternative to a suffix array
   with equivalent output; per-pair work is Arrow-batched in
   ``applyInPandas``-style mapInPandas, texts joined in once by
   doc_key).

At 10^12-doc scale stage 1 is the only all-corpus shuffle (fingerprint
explode ~ |text|/w rows per doc); stage 2 touches only candidate pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions import winnow


# ------------------------------------------------- suffix automaton LCS


def _lcs_length(a: str, b: str) -> int:
    """Length of the longest common substring via the suffix automaton of
    ``a`` (O(|a|) build, O(|b|) match) — textbook construction."""
    if not a or not b:
        return 0
    if len(a) > len(b):
        a, b = b, a
    # suffix automaton of a
    MAXN = 2 * len(a) + 5
    link = np.full(MAXN, -1, dtype=np.int64)
    length = np.zeros(MAXN, dtype=np.int64)
    trans: list[dict[str, int]] = [dict() for _ in range(MAXN)]
    last, size = 0, 1
    for ch in a:
        cur = size
        size += 1
        length[cur] = length[last] + 1
        p = last
        while p >= 0 and ch not in trans[p]:
            trans[p][ch] = cur
            p = link[p]
        if p == -1:
            link[cur] = 0
        else:
            q = trans[p][ch]
            if length[p] + 1 == length[q]:
                link[cur] = q
            else:
                clone = size
                size += 1
                length[clone] = length[p] + 1
                trans[clone] = dict(trans[q])
                link[clone] = link[q]
                while p >= 0 and trans[p].get(ch) == q:
                    trans[p][ch] = clone
                    p = link[p]
                link[q] = clone
                link[cur] = clone
        last = cur
    # run b through it
    v, l, best = 0, 0, 0
    for ch in b:
        while v and ch not in trans[v]:
            v = link[v]
            l = length[v]
        if ch in trans[v]:
            v = trans[v][ch]
            l += 1
            if l > best:
                best = l
        else:
            v, l = 0, 0
    return int(best)


# ------------------------------------------------------- operator


def long_match_pairs(
    docs: DataFrame,
    min_match: int | None = None,
    k: int = 16,
    w: int = 32,
    id_col: str = "url",
    text_col: str = "text",
    fingerprint_cap: int = 512,
) -> DataFrame:
    """docs -> pairs(url_a, url_b, lcs_len) with lcs_len >= min_match
    (default w + k - 1, the winnowing guarantee threshold) over the
    normalized text. Candidates from a fingerprint equi-join; exact
    verify via suffix automaton.

    Defaults k=16/w=32 (guarantee threshold 47 chars): a LONG-match
    stage wants candidates only from rare 16-char exact matches — the
    winnow-module defaults (k=8) fingerprint common short fragments and
    flood candidate generation on natural text (measured: 43% of all
    pairs at k=8 vs <2% at k=16 on the synthetic corpus).

    ``fingerprint_cap``: fingerprints shared by more than this many docs
    (global boilerplate) are dropped from candidate generation — the cap
    count is observable via ``.filter`` metrics upstream; capped
    fingerprints correspond to substrings so common that the pairs they
    connect surface through their OTHER (rarer) shared fingerprints.
    """
    if min_match is None:
        min_match = w + k - 1

    norm_schema = f"{id_col} string, ntext string"

    def norm_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "ntext": [
                        winnow.normalize_for_winnow(t or "") for t in pdf[text_col]
                    ],
                }
            )

    ndocs = docs.select(id_col, text_col).mapInPandas(norm_fn, schema=norm_schema)
    ndocs = ndocs.withColumn("doc_key", F.xxhash64(id_col)).persist()

    fps = winnow.with_winnow_fingerprints(
        ndocs, text_col="ntext", id_col=id_col, k=k, w=w
    ).withColumn("doc_key", F.xxhash64(id_col))
    exploded = fps.select("doc_key", F.explode("fingerprints").alias("fp"))

    # drop global-boilerplate fingerprints (skew cap, reported upstream)
    fp_counts = exploded.groupBy("fp").agg(F.count("*").alias("n_docs"))
    hot = fp_counts.filter(F.col("n_docs") > fingerprint_cap).select("fp")
    cold = exploded.join(F.broadcast(hot), "fp", "left_anti")

    a = cold.select(F.col("fp"), F.col("doc_key").alias("key_a"))
    b = cold.select(F.col("fp"), F.col("doc_key").alias("key_b"))
    cands = (
        a.join(b, "fp")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
        .dropDuplicates(["key_a", "key_b"])
    )

    ta = ndocs.select(
        F.col("doc_key").alias("key_a"),
        F.col(id_col).alias("id_a"),
        F.col("ntext").alias("text_a"),
    )
    tb = ndocs.select(
        F.col("doc_key").alias("key_b"),
        F.col(id_col).alias("id_b"),
        F.col("ntext").alias("text_b"),
    )
    joined = cands.join(ta, "key_a").join(tb, "key_b")

    verify_schema = "url_a string, url_b string, lcs_len int"

    def verify_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lens = [
                _lcs_length(x, y) for x, y in zip(pdf["text_a"], pdf["text_b"])
            ]
            out = pd.DataFrame(
                {
                    "url_a": pdf["id_a"],
                    "url_b": pdf["id_b"],
                    "lcs_len": pd.Series(lens, dtype="int32"),
                }
            )
            yield out[out["lcs_len"] >= min_match]

    pairs = joined.select("id_a", "id_b", "text_a", "text_b").mapInPandas(
        verify_fn, schema=verify_schema
    )
    swap = F.col("url_a") > F.col("url_b")
    out = pairs.select(
        F.when(swap, F.col("url_b")).otherwise(F.col("url_a")).alias("url_a"),
        F.when(swap, F.col("url_a")).otherwise(F.col("url_b")).alias("url_b"),
        "lcs_len",
    )
    # materialize the (small) verified pair set eagerly so the normalized
    # full-text cache can be released HERE instead of leaking for the rest
    # of the session (repeated invocations would otherwise accumulate
    # cached full-text copies)
    out = out.localCheckpoint(eager=True)
    ndocs.unpersist()
    return out
