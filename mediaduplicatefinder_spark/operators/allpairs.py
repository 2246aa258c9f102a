"""Exact all-pairs generation via triangle blocking (VERDICT r1 items
2 & 7 — replaces the 32x-replicating salted join and the name-pair
crossJoins).

The O(n^2) pair space of each group (e.g. a language) is tiled into
B*(B+1)/2 triangle blocks by a deterministic salt s(id) in [0, B):
block (i, j) with i <= j owns exactly the pairs {(a, b) : {s(a), s(b)}
= {i, j}}. Every pair lands in exactly one block, every doc is
replicated to exactly B blocks (its row + column of the triangle), and
parallelism grows QUADRATICALLY in B — so B=8 yields 36 balanced tasks
per group at only 8x replication, where the naive salted broadcast
needed 32x replication for 32-way parallelism. No CartesianProduct
node ever appears in the plan; skew is bounded by construction (each
block is ~(2n/B)^2 work regardless of group sizes).

Two entry points:

- ``blocked_pairs``      generic: emits pair rows with payload columns
                          (used by the name-pair queries, P8/P9/P10)
- ``blocked_jaccard_pairs`` specialized: token-set Jaccard over sorted
                          int64 hash arrays, computed per block with an
                          inverted-index gram matrix (vectorized numpy;
                          NO per-pair Python) and thresholded before
                          anything leaves the task.

The gram kernel: for block sides I, J with token lists T(d), the
intersection-count matrix C[d_i, d_j] = |T(d_i) & T(d_j)| is a sparse
matrix product (docs x tokens)(tokens x docs), evaluated by sorting
each side's (token, doc) postings, locating common tokens with one
searchsorted per side, and expanding posting-list products into a
bincount — work proportional to sum_t cnt_I(t)*cnt_J(t) (the true
join size), chunked to bound memory. Jaccard then falls out densely:
J = C / (|A| + |B| - C).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _with_blocks(df: DataFrame, id_col: str, n_blocks: int) -> DataFrame:
    """Adds __salt plus one exploded (bi, bj) row per triangle block the
    id participates in (B rows per input row, (s,s) deduped)."""
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    blocks = F.array_distinct(
        F.array(
            *[
                F.struct(
                    F.least(salt, F.lit(t)).alias("bi"),
                    F.greatest(salt, F.lit(t)).alias("bj"),
                )
                for t in range(n_blocks)
            ]
        )
    )
    return (
        df.withColumn("__salt", salt)
        .withColumn("__b", F.explode(blocks))
        .withColumn("bi", F.col("__b.bi"))
        .withColumn("bj", F.col("__b.bj"))
        .drop("__b")
    )


def _sides(pdf: pd.DataFrame, id_col: str):
    """Split a block's rows into its two salt sides, each sorted by id
    (the sort makes same-block triu emission canonical id_a < id_b)."""
    bi = int(pdf["bi"].iat[0])
    bj = int(pdf["bj"].iat[0])
    side_i = pdf[pdf["__salt"] == bi].sort_values(id_col)
    if bi == bj:
        return side_i, side_i, True
    return side_i, pdf[pdf["__salt"] == bj].sort_values(id_col), False


def blocked_pairs(
    df: DataFrame,
    id_col: str,
    group_cols: Sequence[str] = (),
    payload_cols: Sequence[str] = (),
    n_blocks: int = 8,
) -> DataFrame:
    """All unordered pairs within each group, exactly once, canonical
    ``<id>_a < <id>_b``, payload columns emitted as ``<col>_a``/
    ``<col>_b``. One groupBy shuffle on (group, block); pair expansion
    is map-side numpy — no CartesianProduct, no B-side broadcast."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    out_fields = (
        [T.StructField(c, fields[c]) for c in group_cols]
        + [
            T.StructField(f"{id_col}_a", fields[id_col]),
            T.StructField(f"{id_col}_b", fields[id_col]),
        ]
        + [
            T.StructField(f"{c}_{s}", fields[c])
            for c in payload_cols
            for s in ("a", "b")
        ]
    )
    schema = T.StructType(out_fields)
    gcols = list(group_cols)
    pcols = list(payload_cols)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        side_i, side_j, same = _sides(pdf, id_col)
        ni, nj = len(side_i), len(side_j)
        if same:
            ia, jb = np.triu_indices(ni, 1)
        else:
            if ni == 0 or nj == 0:
                return pd.DataFrame({f.name: pd.Series(dtype=object) for f in out_fields})
            ia = np.repeat(np.arange(ni), nj)
            jb = np.tile(np.arange(nj), ni)
        a = side_i.iloc[ia].reset_index(drop=True)
        b = side_j.iloc[jb].reset_index(drop=True)
        swap = (a[id_col] > b[id_col]).to_numpy()
        out = {}
        for c in gcols:
            out[c] = a[c]
        out[f"{id_col}_a"] = a[id_col].where(~swap, b[id_col])
        out[f"{id_col}_b"] = b[id_col].where(~swap, a[id_col])
        for c in pcols:
            out[f"{c}_a"] = a[c].where(~swap, b[c])
            out[f"{c}_b"] = b[c].where(~swap, a[c])
        return pd.DataFrame(out)

    blocked = _with_blocks(df, id_col, n_blocks)
    return blocked.groupBy(*gcols, "bi", "bj").applyInPandas(fn, schema=schema)


def _gather_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Concatenated [s, s+1, ..., s+c-1] for each (s, c) range."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = counts.cumsum()
    offsets = np.repeat(starts - np.concatenate(([0], ends[:-1])), counts)
    return np.arange(total, dtype=np.int64) + offsets


def _postings(tokens: list) -> tuple[np.ndarray, np.ndarray]:
    """(sorted token values, doc index per posting) for one side."""
    if not tokens:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    vals = np.concatenate([np.asarray(t, dtype=np.int64) for t in tokens])
    docs = np.repeat(
        np.arange(len(tokens), dtype=np.int64),
        np.fromiter((len(t) for t in tokens), dtype=np.int64, count=len(tokens)),
    )
    order = np.argsort(vals, kind="stable")
    return vals[order], docs[order]


def intersect_count_matrix(
    tok_i: list, tok_j: list, chunk_products: int = 4_000_000
) -> np.ndarray:
    """Dense |A & B| count matrix between two lists of DISTINCT-value
    int64 token arrays — the sparse gram product, fully vectorized.

    Work and transient memory are proportional to the posting-product
    size sum_t cnt_i(t)*cnt_j(t); chunking over common tokens bounds
    each expansion to ``chunk_products`` elements.
    """
    ni, nj = len(tok_i), len(tok_j)
    C = np.zeros(ni * nj, dtype=np.int64)
    vi, di = _postings(tok_i)
    vj, dj = _postings(tok_j)
    if len(vi) == 0 or len(vj) == 0:
        return C.reshape(ni, nj)
    common = np.intersect1d(vi, vj)  # unique values present on both sides
    if len(common) == 0:
        return C.reshape(ni, nj)
    li = np.searchsorted(vi, common, side="left")
    ri = np.searchsorted(vi, common, side="right")
    lj = np.searchsorted(vj, common, side="left")
    rj = np.searchsorted(vj, common, side="right")
    cnt_i = ri - li
    cnt_j = rj - lj
    products = cnt_i * cnt_j
    cum = products.cumsum()
    start = 0
    base = 0
    while start < len(common):
        end = int(np.searchsorted(cum, base + chunk_products, side="left")) + 1
        end = min(max(end, start + 1), len(common))
        s = slice(start, end)
        # postings of side i for this chunk's tokens, each repeated by the
        # matching side-j posting count; side j tiled per side-i posting
        a_doc = np.repeat(
            di[_gather_ranges(li[s], cnt_i[s])], np.repeat(cnt_j[s], cnt_i[s])
        )
        b_doc = dj[_gather_ranges(np.repeat(lj[s], cnt_i[s]), np.repeat(cnt_j[s], cnt_i[s]))]
        C += np.bincount(a_doc * nj + b_doc, minlength=ni * nj)
        base = int(cum[end - 1])
        start = end
    return C.reshape(ni, nj)


def blocked_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    group_cols: Sequence[str] = (),
    threshold: float = 0.6,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact token-set Jaccard over ALL same-group pairs (the O(n^2)
    oracle twin of the LSH path), thresholded map-side.

    ``tokens_col`` must hold each doc's DISTINCT int64 token hashes;
    Jaccard over the hash sets equals Jaccard over the token sets up to
    64-bit collisions (P ~ |A||B|/2^64 per pair — immaterial).
    Emits (group_cols..., <id>_a, <id>_b, jaccard) with jaccard >
    threshold; the division is exact-int-to-double, bit-identical to
    the SQL oracle's.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    out_fields = (
        [
            T.StructField(f"{id_col}_a", fields[id_col]),
            T.StructField(f"{id_col}_b", fields[id_col]),
        ]
        + [T.StructField(c, fields[c]) for c in group_cols]
        + [T.StructField("jaccard", T.DoubleType())]
    )
    schema = T.StructType(out_fields)
    gcols = list(group_cols)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        side_i, side_j, same = _sides(pdf, id_col)
        ni, nj = len(side_i), len(side_j)
        empty = {
            f.name: pd.Series(dtype="float64" if f.name == "jaccard" else object)
            for f in out_fields
        }
        if ni == 0 or nj == 0:
            return pd.DataFrame(empty)
        tok_i = list(side_i[tokens_col])
        tok_j = tok_i if same else list(side_j[tokens_col])
        C = intersect_count_matrix(tok_i, tok_j)
        len_i = np.fromiter((len(t) for t in tok_i), np.int64, ni)
        len_j = len_i if same else np.fromiter((len(t) for t in tok_j), np.int64, nj)
        union = len_i[:, None] + len_j[None, :] - C
        with np.errstate(divide="ignore", invalid="ignore"):
            J = np.where(union > 0, C / union, 0.0)
        mask = J > threshold
        if same:
            mask &= np.triu(np.ones((ni, ni), dtype=bool), k=1)
        ia, jb = np.nonzero(mask)
        if len(ia) == 0:
            return pd.DataFrame(empty)
        ids_i = side_i[id_col].to_numpy()
        ids_j = ids_i if same else side_j[id_col].to_numpy()
        id_a, id_b = ids_i[ia], ids_j[jb]
        swap = id_a > id_b  # cross blocks: sides are salt classes, not id order
        out = {
            f"{id_col}_a": np.where(swap, id_b, id_a),
            f"{id_col}_b": np.where(swap, id_a, id_b),
        }
        for c in gcols:
            out[c] = side_i[c].to_numpy()[ia]
        out["jaccard"] = J[ia, jb]
        return pd.DataFrame(out)

    blocked = _with_blocks(df, id_col, n_blocks)
    return blocked.groupBy(*gcols, "bi", "bj").applyInPandas(fn, schema=schema)

def blocked_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    group_cols: Sequence[str] = (),
    threshold: float = 0.95,
    n_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine over float-vector columns (the O(n^2)
    oracle twin of embeddings.embedding_dup_pairs_lsh), triangle-blocked
    like the Jaccard kernel — no crossJoin, no CartesianProduct node,
    B*(B+1)/2 balanced tasks per group.

    Bit-parity contract with the SQL oracle (oracle/lsh_sql.py
    _cosine_sql): per-pair dot products and per-vector norms accumulate
    SEQUENTIALLY over dimensions (a rank-1-update loop, vectorized
    across the pair grid) — the same left fold as Spark's
    ``F.aggregate(zip_with(...))`` and DuckDB's ``list_dot_product``
    (proven bit-identical, 0/200 adversarial probes; see
    embeddings.with_hyperplane_simhash). The kernel emits RAW doubles
    prefiltered with 1e-6 slack; the exact round-to-6dp + threshold
    predicate is applied by Spark expressions so rounding semantics stay
    byte-identical to the unblocked implementation.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    out_fields = (
        [T.StructField(c, fields[c]) for c in group_cols]
        + [
            T.StructField(f"{id_col}_a", fields[id_col]),
            T.StructField(f"{id_col}_b", fields[id_col]),
        ]
        + [T.StructField("__cos_raw", T.DoubleType())]
    )
    schema = T.StructType(out_fields)
    gcols = list(group_cols)

    def _mat(side: pd.DataFrame) -> np.ndarray:
        # Arrow hands vectors over at storage precision (float32 arrays
        # for array<float> columns); widening to float64 here is exact —
        # the same values the JVM path's cast(x as double) produces.
        return np.array([np.asarray(v, dtype=np.float64) for v in side[vec_col]])

    def _norms(mat: np.ndarray) -> np.ndarray:
        acc = np.zeros(len(mat))
        for d in range(mat.shape[1]):  # sequential fold, == list_dot_product
            acc += mat[:, d] * mat[:, d]
        return np.sqrt(acc)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        side_i, side_j, same = _sides(pdf, id_col)
        ni, nj = len(side_i), len(side_j)
        empty = {
            f.name: pd.Series(dtype="float64" if f.name == "__cos_raw" else object)
            for f in out_fields
        }
        if ni == 0 or nj == 0:
            return pd.DataFrame(empty)
        mat_i = _mat(side_i)
        mat_j = mat_i if same else _mat(side_j)
        G = np.zeros((ni, nj))
        for d in range(mat_i.shape[1]):  # rank-1 updates: left fold per pair
            G += mat_i[:, d : d + 1] * mat_j[:, d][None, :]
        n_i = _norms(mat_i)
        n_j = n_i if same else _norms(mat_j)
        denom = n_i[:, None] * n_j[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            C = np.where(denom > 0, G / denom, 0.0)
        mask = C >= threshold - 1e-6  # slack; exact predicate runs in Spark
        if same:
            mask &= np.triu(np.ones((ni, ni), dtype=bool), k=1)
        ia, jb = np.nonzero(mask)
        if len(ia) == 0:
            return pd.DataFrame(empty)
        ids_i = side_i[id_col].to_numpy()
        ids_j = ids_i if same else side_j[id_col].to_numpy()
        id_a, id_b = ids_i[ia], ids_j[jb]
        swap = id_a > id_b
        out = {
            f"{id_col}_a": np.where(swap, id_b, id_a),
            f"{id_col}_b": np.where(swap, id_a, id_b),
        }
        for c in gcols:
            out[c] = side_i[c].to_numpy()[ia]
        out["__cos_raw"] = C[ia, jb]
        return pd.DataFrame(out)

    blocked = _with_blocks(df, id_col, n_blocks)
    pairs = blocked.groupBy(*gcols, "bi", "bj").applyInPandas(fn, schema=schema)
    return (
        pairs.withColumn("cosine", F.round(F.col("__cos_raw"), 6))
        .filter(F.col("cosine") >= threshold)
        .drop("__cos_raw")
    )
