"""E64 hashed-feature linear quality classifier
(functions/classifier.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.classifier import (
    HASH_BUCKETS,
    quality_classifier,
)


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in quality_classifier(df).collect()}


def _weight(spark, word):
    key = f"ft:{word:<13.13}"
    return (
        spark.range(1)
        .select(
            (F.pmod(F.xxhash64(F.lit(key)), F.lit(HASH_BUCKETS)) - 1024)
            .alias("w")
        )
        .collect()[0]
        .w
    )


def test_score_is_sum_of_word_weights(spark):
    out = _run(spark, ["alpha beta alpha"])
    r = out[0]
    wa, wb = _weight(spark, "alpha"), _weight(spark, "beta")
    assert r.n_words == 3
    assert r.score_int == 2 * wa + wb
    assert abs(r.score - (2 * wa + wb) / (3 * 1024.0)) < 1e-9
    assert r.keep == (r.score_int >= 0)


def test_tokenization_lowercase_ascii_runs(spark):
    # case-folding and punctuation splits: "Al-pha!" -> [al, pha]
    a = _run(spark, ["Al-pha!"])[0]
    b = _run(spark, ["al pha"])[0]
    assert (a.n_words, a.score_int) == (2, b.score_int)


def test_truncation_buckets_collide(spark):
    # the hashing trick: words sharing a 13-char prefix share a bucket
    w1 = "abcdefghijklmNOPE".lower()
    w2 = "abcdefghijklmYEP".lower()
    out = _run(spark, [w1, w2])
    assert out[0].score_int == out[1].score_int


def test_empty_and_nonascii_only(spark):
    out = _run(spark, ["", "   ", "!!!", "你好世界"])
    for r in out.values():
        assert r.n_words == 0 and r.score_int == 0
        assert r.score == 0.0 and r.keep  # 0 >= 0: neutral docs keep


def test_map_only_plan(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        quality_classifier(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # no shuffle: pure projection


def test_trained_weights_score_parity(spark):
    """Round-5 VERDICT item 6: the deployment mode — trained (term ->
    int) coefficients — must produce the hand-computed score with the
    identical shape/gate, OOV words weighing 0."""
    from mediaduplicatefinder_spark.functions.classifier import (
        quality_classifier_sql,
    )

    w = {"good": 300, "great": 500, "bad": -400, "terrible": -900}
    texts = [
        "good good great",          # 300+300+500 = 1100, n=3
        "bad terrible good",        # -400-900+300 = -1000, n=3
        "unknown words only",       # OOV -> 0, keep (>= 0)
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in quality_classifier(df, weights=w).collect()}
    assert (out[0].score_int, out[0].n_words, out[0].keep) == (1100, 3, True)
    assert abs(out[0].score - 1100 / (3 * 1024.0)) < 1e-9
    assert (out[1].score_int, out[1].keep) == (-1000, False)
    assert (out[2].score_int, out[2].score, out[2].keep) == (0, 0.0, True)
    assert (out[3].n_words, out[3].score, out[3].keep) == (0, 0.0, True)

    # DuckDB twin parity on the same fixture
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW qdocs AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") AS v(doc_id, text)"
    )
    sql = quality_classifier_sql("SELECT doc_id, text FROM qdocs", weights=w)
    twin = {
        int(r[0]): r
        for r in con.sql(sql).fetchall()
    }
    for i in range(4):
        r = out[i]
        assert twin[i][1] == r.n_words
        assert twin[i][2] == r.score_int
        assert abs(float(twin[i][3]) - r.score) < 1e-9
        assert bool(twin[i][4]) == r.keep


def test_trained_mode_stays_map_only(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = quality_classifier(
        df, weights={"a": 1}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: map literal, not a join
