"""Tests for the training-pipeline extensions: embedding similarity
search / near-dup (operators/embeddings.py), multimodal binary plumbing
(operators/multimodal.py), and winnowing fingerprints
(functions/winnow.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators import embeddings as emb_ops
from mediaduplicatefinder_spark.operators import multimodal as mm
from mediaduplicatefinder_spark.functions import winnow


# ---------------------------------------------------------------- fixtures


def make_clustered_vectors(n_clusters=40, per_cluster=3, dim=32, seed=7):
    """Clusters of near-parallel vectors (cosine ~0.99 within cluster,
    ~N(0, 1/sqrt(dim)) across) + planted pair ground truth."""
    rng = np.random.RandomState(seed)
    rows = []
    vec_id = 0
    truth_pairs = set()
    for c in range(n_clusters):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        members = []
        for _ in range(per_cluster):
            v = base + 0.02 * rng.standard_normal(dim)  # cosine ~0.98 in-cluster
            rows.append((vec_id, [float(x) for x in v], c))
            members.append(vec_id)
            vec_id += 1
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                truth_pairs.add((members[i], members[j]))
    return pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]), truth_pairs


@pytest.fixture(scope="module")
def clustered(spark):
    pdf, truth = make_clustered_vectors()
    df = spark.createDataFrame(pdf).persist()
    df.count()
    return df, truth


# ---------------------------------------------------------------- embeddings


def test_cosine_expr_matches_numpy(spark):
    a = [1.0, 2.0, 3.0]
    b = [-1.0, 0.5, 2.0]
    expect = round(float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6)
    df = spark.createDataFrame([(a, b)], "a array<float>, b array<float>")
    got = df.select(emb_ops.cosine_expr(F.col("a"), F.col("b")).alias("c")).first().c
    assert got == pytest.approx(expect, abs=2e-6)


def test_cosine_zero_norm_is_zero(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a array<float>, b array<float>"
    )
    assert df.select(emb_ops.cosine_expr(F.col("a"), F.col("b")).alias("c")).first().c == 0.0


def test_exact_dup_pairs_find_planted_clusters(clustered):
    df, truth = clustered
    got = {
        (r.vec_a, r.vec_b)
        for r in emb_ops.embedding_dup_pairs_exact(df, threshold=0.9).collect()
    }
    assert truth <= got  # all planted pairs found
    # noise pairs at cosine >= 0.9 are essentially impossible at dim=32
    assert len(got - truth) == 0


def test_blocked_cosine_bit_parity_with_crossjoin_expr(clustered):
    """The r3 triangle-blocked exact path must be BIT-identical (ids and
    round-6 cosines) to the r2 crossJoin + JVM cosine_expr formulation
    it replaced — including a planted zero-norm vector."""
    df, _ = clustered
    zero = df.sparkSession.createDataFrame(
        [(99_999, [0.0] * 32, -1)], df.schema
    )
    full = df.unionByName(zero)
    got = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in emb_ops.embedding_dup_pairs_exact(full, threshold=0.2).collect()
    }
    a = full.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va"))
    b = full.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb"))
    ref = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            emb_ops.cosine_expr(F.col("va"), F.col("vb")).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.2)
        .collect()
    }
    assert got == ref


def test_lsh_dup_pairs_recall(clustered):
    df, truth = clustered
    got = {
        (r.vec_a, r.vec_b)
        for r in emb_ops.embedding_dup_pairs_lsh(df, threshold=0.9, band_bits=8).collect()
    }
    assert got <= {
        (r.vec_a, r.vec_b)
        for r in emb_ops.embedding_dup_pairs_exact(df, threshold=0.9).collect()
    }  # verify stage keeps LSH precision exact
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall:.3f} < 0.9"


def test_lsh_partition_invariance(clustered):
    df, _ = clustered
    a = sorted(
        (r.vec_a, r.vec_b, r.cosine)
        for r in emb_ops.embedding_dup_pairs_lsh(df.repartition(1), threshold=0.9, band_bits=8).collect()
    )
    b = sorted(
        (r.vec_a, r.vec_b, r.cosine)
        for r in emb_ops.embedding_dup_pairs_lsh(df.repartition(7), threshold=0.9, band_bits=8).collect()
    )
    assert a == b


def test_brute_topk_self_cluster(clustered):
    df, _ = clustered
    queries = df.filter(F.col("vec_id") % 10 == 0)
    topk = emb_ops.cosine_topk(df, queries, k=2).collect()
    by_q = {}
    for r in topk:
        by_q.setdefault(r.query_id, []).append(r.vec_id)
    labels = {r.vec_id: r.label for r in df.collect()}
    for q, neigh in by_q.items():
        # top-2 neighbors of a cluster member are its 2 cluster siblings
        assert {labels[v] for v in neigh} == {labels[q]}


def test_ann_topk_recall_vs_brute(clustered):
    df, _ = clustered
    queries = df.filter(F.col("vec_id") % 10 == 0)
    brute = {
        (r.query_id, r.vec_id)
        for r in emb_ops.cosine_topk(df, queries, k=2).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in emb_ops.ann_lsh_topk(df, queries, k=2, band_bits=8).collect()
    }
    recall = len(brute & approx) / len(brute)
    assert recall >= 0.8, f"ANN recall@2 {recall:.3f} < 0.8"


# ---------------------------------------------------------------- multimodal


def test_media_roundtrip(spark):
    from mediaduplicatefinder_spark.datagen.media import generate_media

    pdf = generate_media(60, seed=3)
    media = spark.createDataFrame(pdf[["media_id", "payload"]])
    meta = {r.media_id: r for r in mm.decode_media_meta(media).collect()}
    assert len(meta) == 60
    for _, row in pdf.iterrows():
        m = meta[row.media_id]
        assert m.valid
        assert m.kind == row.kind
        assert m.payload_bytes == len(row.payload) - mm.HEADER_LEN


def test_media_malformed_tolerance(spark):
    media = spark.createDataFrame(
        [(1, b"not-a-media-file"), (2, None), (3, b"")],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in mm.decode_media_meta(media).collect()}
    assert all(not rows[i].valid for i in (1, 2, 3))


def test_decode_real_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm._decode_real(b"anything")


def test_frame_sample_indices(spark):
    from mediaduplicatefinder_spark.datagen.media import generate_media

    pdf = generate_media(80, seed=5)
    media = spark.createDataFrame(pdf[["media_id", "payload"]])
    meta = mm.decode_media_meta(media)
    frames = mm.frame_sample(meta, every=7).collect()
    nf = {r.media_id: r.n_frames for r in meta.filter("kind='video'").collect()}
    by_m = {}
    for r in frames:
        by_m.setdefault(r.media_id, []).append(r.frame_idx)
    assert set(by_m) == {m for m, n in nf.items() if n > 0}
    for m, idxs in by_m.items():
        assert sorted(idxs) == list(range(0, nf[m], 7))


def test_features_deterministic_and_near_for_dups(spark):
    from mediaduplicatefinder_spark.datagen.media import generate_media

    pdf = generate_media(120, seed=11)
    media = spark.createDataFrame(pdf[["media_id", "payload"]])
    f1 = {r.media_id: np.array(r.features) for r in mm.extract_features(media).collect()}
    f2 = {
        r.media_id: np.array(r.features)
        for r in mm.extract_features(media.repartition(5)).collect()
    }
    for k in f1:
        assert np.array_equal(f1[k], f2[k])  # partition-invariant
    # planted near-dup payloads (1% byte flips) → near-identical histograms
    groups = pdf[pdf.dup_class > 0].groupby("dup_class")["media_id"].apply(list)
    checked = 0
    for ids in groups:
        if len(ids) == 2:
            a, b = f1[ids[0]], f1[ids[1]]
            cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
            assert cos > 0.99
            checked += 1
    assert checked > 0


def test_resize_plan(spark):
    media = spark.createDataFrame(
        [
            (1, mm.pack_media(0, 1024, 512, 1, b"x" * 10)),
            (2, mm.pack_media(0, 100, 50, 1, b"x" * 10)),
        ],
        "media_id long, payload binary",
    )
    plan = {r.media_id: r for r in mm.resize_plan(mm.decode_media_meta(media), 256).collect()}
    assert (plan[1].target_w, plan[1].target_h) == (256, 128)
    assert (plan[2].target_w, plan[2].target_h) == (100, 50)


# ---------------------------------------------------------------- winnowing


def test_winnow_shared_substring_guarantee():
    base = "the quick brown fox jumps over the lazy dog repeatedly and often"
    a = winnow.normalize_for_winnow("PREFIX-A " + base + " SUFFIX-A")
    b = winnow.normalize_for_winnow("other-prefix " + base + " unrelated-tail")
    fa = set(winnow.winnow_fingerprints(a).tolist())
    fb = set(winnow.winnow_fingerprints(b).tolist())
    # shared substring length >= w + k - 1 ⟹ >= 1 common fingerprint
    assert fa & fb


def test_winnow_disjoint_texts_share_nothing():
    fa = set(winnow.winnow_fingerprints("abcdefghijklmnopqrstuvwxyz" * 3).tolist())
    fb = set(winnow.winnow_fingerprints("0123456789" * 10).tolist())
    assert not (fa & fb)


def test_winnow_empty_and_short():
    assert winnow.winnow_fingerprints("").tolist() == []
    assert winnow.winnow_fingerprints("abc").tolist() == []  # < k chars
    out = winnow.winnow_fingerprints("abcdefgh")  # exactly one k-gram
    assert len(out) == 1


def test_winnow_spark_matches_oracle(spark, tiny_pages_df):
    docs = tiny_pages_df.select("url", "text").limit(40)
    got = {
        r.url: sorted(r.fingerprints)
        for r in winnow.with_winnow_fingerprints(docs).collect()
    }
    for r in docs.collect():
        expect = winnow.winnow_fingerprints(
            winnow.normalize_for_winnow(r.text or "")
        ).tolist()
        assert got[r.url] == expect


def test_embedding_lsh_bucket_cap_chains_hot_buckets(spark):
    """ADVICE r1: a hot (band, bh) bucket (many identical embeddings)
    must expand as a chain, not O(n^2), and the cap must be reported."""
    from mediaduplicatefinder_spark.operators.embeddings import (
        embedding_dup_pairs_lsh,
    )

    n_hot = 40
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(n_hot)]
    rows += [(100 + i, [float(i + 1), -2.0, 0.5, 3.0]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs, metrics = embedding_dup_pairs_lsh(
        emb, threshold=0.99, bucket_cap=8, with_metrics=True
    )
    m = metrics.collect()[0]
    assert m.capped_buckets >= 1 and m.max_bucket == n_hot
    got = {(r.vec_a, r.vec_b) for r in pairs.collect()}
    hot_pairs = {p for p in got if p[0] < n_hot and p[1] < n_hot}
    # chain mode: exactly the adjacent-id pairs of the hot bucket
    assert hot_pairs == {(i, i + 1) for i in range(n_hot - 1)}

    # uncapped: the same bucket yields all C(n,2) pairs
    pairs_full = embedding_dup_pairs_lsh(emb, threshold=0.99, bucket_cap=10_000)
    full = {
        (r.vec_a, r.vec_b)
        for r in pairs_full.collect()
        if r.vec_a < n_hot and r.vec_b < n_hot
    }
    assert len(full) == n_hot * (n_hot - 1) // 2


# ---------------- faithful pixel aHash/dHash (P1/P2/P4) ----------------


def _port_sample(src, dst, i):
    # independent pure-python port of main_cli.cpp:167-175 (float32 math)
    import numpy as np

    return int(np.float32(i) * (np.float32(src) / np.float32(dst)))


def _port_ahash(img):
    h, w = img.shape
    vals = [
        int(img[_port_sample(h, 8, y), _port_sample(w, 8, x)])
        for y in range(8)
        for x in range(8)
    ]
    avg = sum(vals) / 64.0
    out = 0
    for v in vals:
        out = (out << 1) | (1 if v > avg else 0)
    return out


def _port_dhash(img):
    h, w = img.shape
    grid = [
        [int(img[_port_sample(h, 8, y), _port_sample(w, 9, x)]) for x in range(9)]
        for y in range(8)
    ]
    out = 0
    for y in range(8):
        for x in range(8):
            out = (out << 1) | (1 if grid[y][x] > grid[y][x + 1] else 0)
    return out


def test_pixel_hashes_bit_exact_vs_port():
    import numpy as np

    from mediaduplicatefinder_spark.operators.multimodal import ahash64, dhash64

    rng = np.random.RandomState(9)
    for _ in range(40):
        h = int(rng.randint(8, 90))
        w = int(rng.randint(9, 90))
        img = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
        assert ahash64(img) == _port_ahash(img)
        assert dhash64(img) == _port_dhash(img)
    # constant image: all bits 0 for both hashes (val > avg strict)
    flat = np.full((30, 30), 128, dtype=np.uint8)
    assert ahash64(flat) == 0 and dhash64(flat) == 0


def test_media_dup_pairs_find_planted_image_dups(spark):
    import numpy as np

    from mediaduplicatefinder_spark.datagen.media import generate_media
    from mediaduplicatefinder_spark.operators.multimodal import (
        HEADER_LEN,
        ahash64,
        dhash64,
        gray_from_body,
        media_dup_pairs,
    )

    pdf = generate_media(300, seed=42)
    media = spark.createDataFrame(pdf[["media_id", "payload"]])
    got = {(r.media_a, r.media_b) for r in media_dup_pairs(media).collect()}

    # oracle: brute-force reference decision over all image pairs
    imgs = pdf[pdf.kind == "image"]
    hashes = {}
    for r in imgs.itertuples():
        g = gray_from_body(bytes(r.payload)[HEADER_LEN:])
        if g is not None:
            a, d = ahash64(g), dhash64(g)
            if a and d:
                hashes[r.media_id] = (a, d)
    ids = sorted(hashes)
    want = set()
    for i, ia in enumerate(ids):
        for ib in ids[i + 1 :]:
            dd = bin(hashes[ia][1] ^ hashes[ib][1]).count("1")
            ad = bin(hashes[ia][0] ^ hashes[ib][0]).count("1")
            if (dd + ad) / 2.0 <= 15:
                want.add((ia, ib))
    # every planted same-class image pair must be found, and LSH recall
    # vs the brute-force decision must be total on this corpus
    planted = {
        (min(a, b), max(a, b))
        for c, grp in imgs[imgs.dup_class > 0].groupby("dup_class")["media_id"]
        for a in grp
        for b in grp
        if a < b
    }
    assert planted & want <= got
    assert got == want


def test_media_dup_pairs_caps_hot_buckets(spark, tmp_path):
    """VERDICT r2 item 1: a constant-image hot bucket (identical pixel
    hashes -> one (band, bh) cell holding the whole shard) must expand
    CHAIN+STAR, not O(n^2); the cap is reported, co-membership is
    preserved, and the SQL oracle reproduces the capped pair set
    bit-for-bit."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mediaduplicatefinder_spark.datagen.media import generate_media
    from mediaduplicatefinder_spark.operators.multimodal import (
        media_dup_pairs,
        pack_media,
    )
    from mediaduplicatefinder_spark.oracle import lsh_sql

    n_hot = 30
    rng = np.random.RandomState(3)
    body = rng.randint(0, 256, size=400).astype(np.uint8).tobytes()
    hot = pd.DataFrame(
        {
            "media_id": np.arange(n_hot, dtype=np.int64),
            "payload": [pack_media(0, 20, 20, 1, body)] * n_hot,
        }
    )
    cold = generate_media(40, seed=5)[["media_id", "payload"]]
    cold["media_id"] += 1000
    pdf = pd.concat([hot, cold], ignore_index=True)

    media = spark.createDataFrame(pdf)
    cap = 8
    pairs, metrics = media_dup_pairs(media, bucket_cap=cap, with_metrics=True)
    m = metrics.collect()[0]
    assert m.capped_buckets >= 1 and m.max_bucket == n_hot
    got = {(r.media_a, r.media_b) for r in pairs.collect()}
    hot_pairs = {p for p in got if p[0] < n_hot and p[1] < n_hot}
    # chain+star over media_id order: (i,i+1) plus (0,j) for j >= 2 —
    # O(n) pairs, component stays connected in one CC round
    want_hot = {(i, i + 1) for i in range(n_hot - 1)} | {
        (0, j) for j in range(2, n_hot)
    }
    assert hot_pairs == want_hot

    # the SQL oracle's chain branch reproduces the same pair set
    path = str(tmp_path / "media_hot.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    con = duckdb.connect()
    sql = lsh_sql.media_dup_pairs_sql(path=path, bucket_cap=cap)
    oracle = {
        (int(a), int(b))
        for a, b in con.execute(sql).df()[["media_a", "media_b"]].values
    }
    assert got == oracle


def test_media_dup_pairs_plan_has_no_band_self_join(spark):
    """The candidate stage is one groupBy + map-side expansion — no band
    self-join (the r2 uncapped-join bug class) and no cartesian node."""
    from mediaduplicatefinder_spark.datagen.media import generate_media
    from mediaduplicatefinder_spark.operators.multimodal import media_dup_pairs

    pdf = generate_media(50, seed=11)[["media_id", "payload"]]
    media = spark.createDataFrame(pdf)
    p = media_dup_pairs(media)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p
    # the only join left is the image-kind left-semi gate
    import re

    joins = re.findall(r"Join (\w+)", p)
    assert all(j == "LeftSemi" for j in joins), joins
