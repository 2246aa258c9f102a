"""Pairwise similarity UDFs beyond Jaccard (P8, P9, P11, P12, P13).

All Arrow-batched pandas UDFs (no per-row Python at the Spark
boundary); scoring loops are per-pair numpy over short strings —
the same "batch the boundary" structure the reference uses for its
office subprocess (main_cli.cpp:86-118), minus the IPC.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.types import DoubleType

from mediaduplicatefinder_spark.oracle import textsim

# ---------------- P8: char-bag string similarity ----------------


def _charbag_sim(s1: str, s2: str) -> float:
    return textsim.string_similarity(s1, s2)


@F.pandas_udf(DoubleType())
def charbag_sim_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """P8 (main_cli.cpp:341-357): lowercase; equal -> 1.0; containment ->
    0.8; else 2*sum_c cnt1(c)*cnt2(c)/(len1+len2) (can exceed 1.0 —
    reproduced as-is for parity)."""
    return pd.Series(
        [_charbag_sim(x or "", y or "") for x, y in zip(a, b)], dtype="float64"
    )


# ---------------- P11: pair-local TF-IDF cosine ----------------
# The reference fits sklearn TfidfVectorizer on JUST the two documents
# (office_comparer_batch.py:140-151) — deliberately NOT corpus-global.
# sklearn is not in this container; this is a from-scratch numpy
# re-implementation of the default TfidfVectorizer semantics for n=2:
#   tokens: r"(?u)\b\w\w+\b" lowercased; tf = raw counts;
#   idf = ln((n+1)/(df+1)) + 1 (smooth); rows l2-normalized;
#   cosine = dot of the two normalized vectors.

_SKLEARN_TOKEN = re.compile(r"(?u)\b\w\w+\b")


def pair_tfidf_cosine(text1: str, text2: str) -> float:
    """TF-IDF cosine of a 2-doc corpus, sklearn-default semantics
    (office_comparer_batch.py:140-151). Empty vocab or zero vector -> 0."""
    t1 = _SKLEARN_TOKEN.findall((text1 or "").lower())
    t2 = _SKLEARN_TOKEN.findall((text2 or "").lower())
    if not t1 or not t2:
        return 0.0
    c1, c2 = Counter(t1), Counter(t2)
    vocab = sorted(set(c1) | set(c2))
    n = 2
    num = 0.0
    sq1 = 0.0
    sq2 = 0.0
    for w in vocab:
        df = (w in c1) + (w in c2)
        idf = math.log((n + 1) / (df + 1)) + 1.0
        v1 = c1.get(w, 0) * idf
        v2 = c2.get(w, 0) * idf
        num += v1 * v2
        sq1 += v1 * v1
        sq2 += v2 * v2
    if sq1 == 0.0 or sq2 == 0.0:
        return 0.0
    return num / math.sqrt(sq1 * sq2)


@F.pandas_udf(DoubleType())
def tfidf_cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [pair_tfidf_cosine(x, y) for x, y in zip(a, b)], dtype="float64"
    )


# SE4 variant (VERDICT r2 item 3): tokenize each doc ONCE into a compact
# sorted (terms, counts) representation; pairs then carry ~distinct-token
# arrays instead of raw text, and the per-pair scorer is a two-pointer
# merge that replays pair_tfidf_cosine's sorted-vocab accumulation order
# bit-for-bit (same floats in the same sequence — the existing SQL
# oracle stays valid unchanged).

# explicit DataType (NOT a DDL string): module-level pandas_udf schemas
# parse lazily via the active SparkContext, which python WORKERS lack —
# a DDL string here crashes any task that imports this module remotely
TERM_COUNTS_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("tcounts", T.ArrayType(T.IntegerType())),
    ]
)


@F.pandas_udf(TERM_COUNTS_SCHEMA)
def term_counts_udf(texts: pd.Series) -> pd.DataFrame:
    """text -> (sorted distinct tokens, raw counts) — the per-doc half of
    the pair-local TF-IDF, computed once per doc (SE4; the reference's
    own batching insight, office_comparer_batch.py:157-167)."""
    terms_col, counts_col = [], []
    for t in texts:
        c = Counter(_SKLEARN_TOKEN.findall((t or "").lower()))
        ts = sorted(c)
        terms_col.append(ts)
        counts_col.append([c[w] for w in ts])
    return pd.DataFrame({"terms": terms_col, "tcounts": counts_col})


_IDF1 = math.log(3.0 / 2.0) + 1.0  # df=1 (term on one side);  df=2 -> 1.0


def tfidf_cosine_from_counts(ta, ca, tb, cb) -> float:
    """pair_tfidf_cosine over precomputed sorted (terms, counts): a
    sorted two-pointer merge accumulates num/sq1/sq2 per term in vocab
    order — bit-identical to the text-based UDF (num += 0.0 for
    one-sided terms is an exact float identity, so skipping it is too).
    """
    na, nb = len(ta), len(tb)
    if na == 0 or nb == 0:
        return 0.0
    i = j = 0
    num = sq1 = sq2 = 0.0
    while i < na or j < nb:
        if j >= nb or (i < na and ta[i] < tb[j]):
            v1 = ca[i] * _IDF1
            sq1 += v1 * v1
            i += 1
        elif i >= na or tb[j] < ta[i]:
            v2 = cb[j] * _IDF1
            sq2 += v2 * v2
            j += 1
        else:
            v1 = float(ca[i])  # idf = ln(3/3)+1 = 1.0 exactly
            v2 = float(cb[j])
            num += v1 * v2
            sq1 += v1 * v1
            sq2 += v2 * v2
            i += 1
            j += 1
    if sq1 == 0.0 or sq2 == 0.0:
        return 0.0
    return num / math.sqrt(sq1 * sq2)


@F.pandas_udf(DoubleType())
def tfidf_counts_cosine_udf(
    ta: pd.Series, ca: pd.Series, tb: pd.Series, cb: pd.Series
) -> pd.Series:
    return pd.Series(
        [
            tfidf_cosine_from_counts(list(w), list(x), list(y), list(z))
            for w, x, y, z in zip(ta, ca, tb, cb)
        ],
        dtype="float64",
    )


# ---------------- P12: positional line-match ratio ----------------
# Webtext analog of the Excel cell-match (office_comparer_batch.py:56-125):
# split both texts into non-empty lines; compare the overlapping region
# positionally; ratio = matches / compared; no overlap -> 0.


def positional_line_match(text1: str, text2: str) -> float:
    l1 = [x for x in (text1 or "").split("\n") if x != ""]
    l2 = [x for x in (text2 or "").split("\n") if x != ""]
    n = min(len(l1), len(l2))
    if n == 0:
        return 0.0
    matches = sum(1 for i in range(n) if l1[i] == l2[i])
    return matches / n


@F.pandas_udf(DoubleType())
def line_match_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        [positional_line_match(x, y) for x, y in zip(a, b)], dtype="float64"
    )


# ---------------- P13: batch-failure fallback ----------------
# The reference's office path falls back to name rules when the Python
# batch comparer fails a pair (main_cli.cpp:122-145, 654-671): word/ppt
# -> name-sim > 0.7; excel -> size-ratio > 0.8 AND name-sim > 0.7 with
# score = mean. Spark shape: compute the fallback columns once and
# coalesce — a failed/NULL primary score never drops the pair.


def with_fallback_score(
    pairs,
    primary_col: str = "batch_score",
    name_sim_col: str = "name_sim",
    size_ratio_col=None,
    name_threshold: float = 0.7,
    size_threshold: float = 0.8,
):
    """pairs + nullable primary score -> (score, similar, used_fallback).

    When ``size_ratio_col`` is given the excel-style fallback applies
    (ratio AND name gates, score = mean); otherwise the word/ppt rule
    (name gate, score = name-sim). The primary decision, where present,
    is primary > 0.6/0.7 per the office thresholds — the caller passes
    its own decision column if it differs; here the fallback semantics
    are the contract (main_cli.cpp:654-671)."""
    p = F.col(primary_col)
    ns = F.col(name_sim_col)
    if size_ratio_col is not None:
        sr = F.col(size_ratio_col)
        fb_similar = (sr > size_threshold) & (ns > name_threshold)
        fb_score = (sr + ns) / 2.0
    else:
        fb_similar = ns > name_threshold
        fb_score = ns
    used_fb = p.isNull()
    return pairs.select(
        "*",
        F.coalesce(p, fb_score).alias("score"),
        F.when(used_fb, fb_similar).otherwise(p > 0.6).alias("similar"),
        used_fb.alias("used_fallback"),
    )


# ---------------- P9/P13 column-level rules ----------------


def audio_similar_exprs(stem_a, stem_b):
    """P9 (main_cli.cpp:245-257) as column logic + P8 UDF fallback:
    returns (similar, score) columns."""
    sa, sb = F.lower(stem_a), F.lower(stem_b)
    name_sim = charbag_sim_udf(sa, sb)
    score = (
        F.when(sa == sb, F.lit(1.0))
        .when(
            (F.concat(sa, F.lit("1")) == sb)
            | (F.concat(sb, F.lit("1")) == sa)
            | (F.concat(sa, F.lit("2")) == sb)
            | (F.concat(sb, F.lit("2")) == sa),
            F.lit(0.95),
        )
        .otherwise(name_sim)
    )
    # equal -> 1.0 and suffix -> 0.95 both clear the same strict > 0.9
    # gate the fallback uses (main_cli.cpp:256), so one predicate covers all
    return score > 0.9, score
