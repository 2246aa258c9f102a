"""E90 multi-channel dup-evidence fusion (operators/fusion.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.fusion import fuse_pair_channels


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_fusion_flags_and_counts(spark):
    ngram = _df(
        spark,
        [(1, 2, 0.8), (3, 4, 0.5)],
        "doc_a long, doc_b long, ngram_jaccard double",
    )
    cont = _df(
        spark,
        [(2, 1, 0.9, 1.0), (5, 6, 0.7, 0.6)],  # reversed pair order
        "doc_a long, doc_b long, cont_a double, cont_b double",
    )
    snm = _df(
        spark,
        [(1, 2, 20), (7, 8, 15)],
        "doc_a long, doc_b long, common_prefix long",
    )
    got = {
        (r.doc_a, r.doc_b): r
        for r in fuse_pair_channels(ngram, cont, snm).collect()
    }
    assert len(got) == 4
    r12 = got[(1, 2)]
    assert (r12.in_ngram, r12.in_cont, r12.in_snm) == (True, True, True)
    assert r12.n_channels == 3
    assert r12.cont_max == 1.0  # normalized despite reversed input order
    assert r12.snm_prefix == 20
    assert got[(3, 4)].n_channels == 1 and got[(3, 4)].in_ngram
    assert got[(5, 6)].n_channels == 1 and got[(5, 6)].in_cont
    assert got[(7, 8)].n_channels == 1 and got[(7, 8)].in_snm


def test_duplicate_channel_rows_collapse(spark):
    ngram = _df(
        spark,
        [(1, 2, 0.5), (2, 1, 0.6)],  # same pair twice, both orders
        "doc_a long, doc_b long, ngram_jaccard double",
    )
    empty_c = _df(
        spark, [], "doc_a long, doc_b long, cont_a double, cont_b double"
    )
    empty_s = _df(spark, [], "doc_a long, doc_b long, common_prefix long")
    rows = fuse_pair_channels(ngram, empty_c, empty_s).collect()
    assert len(rows) == 1
    assert rows[0].ngram_jaccard == 0.6  # max wins
    assert rows[0].n_channels == 1
