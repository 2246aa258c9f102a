"""Gopher-style repetition metrics + event window rates (E12 family)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.textstats import (
    gopher_rules,
    repetition_metrics,
)


def _metrics(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    return {r.doc_id: r for r in repetition_metrics(df).collect()}


def test_repetitive_doc_fails_quality(spark):
    m = _metrics(spark, ["a b a b a b"])[0]
    # bigrams: "a b","b a","a b","b a","a b" -> 5 total, 2 distinct, top 3
    assert m.n_bigrams == 5
    assert m.rep_bigram_frac == round(1 - 2 / 5, 6)
    assert m.top_bigram_frac == round(3 / 5, 6)
    assert not m.quality_ok


def test_distinct_doc_passes_quality(spark):
    words = " ".join(f"w{i}" for i in range(12))
    m = _metrics(spark, [words])[0]
    assert m.n_bigrams == 11
    assert m.rep_bigram_frac == 0.0
    assert m.top_bigram_frac == round(1 / 11, 6)
    assert m.quality_ok


def test_degenerate_docs(spark):
    got = _metrics(spark, ["", "solo", "  two   words  "])
    for i in (0, 1):  # <2 tokens -> no bigrams -> fails quality
        assert got[i].n_bigrams == 0
        assert got[i].rep_bigram_frac == 0.0
        assert got[i].top_bigram_frac == 0.0
        assert not got[i].quality_ok
    # irregular whitespace tokenizes to exactly 2 tokens -> 1 bigram
    assert got[2].n_bigrams == 1
    assert got[2].top_bigram_frac == 1.0


def test_short_all_distinct_doc_still_fails(spark):
    # Gopher's 0.18 top-2-gram bound rejects very short docs by
    # construction: 1/n_bigrams > 0.18 whenever n_bigrams < 6
    m = _metrics(spark, ["one two three four five"])[0]
    assert m.n_bigrams == 4
    assert not m.quality_ok


def test_event_window_rates_tiny(spark, tmp_path):
    import __spark_entry__ as entrymod

    rows = [
        # two events in the same 5-min window, one hot (k>50)
        (0, datetime(2024, 1, 1, 0, 0, 30), 1, "click", 1.10, '{"k": 60}'),
        (1, datetime(2024, 1, 1, 0, 4, 59), 2, "click", 2.20, '{"k": 10}'),
        # next window, same user twice -> n_users == 1
        (2, datetime(2024, 1, 1, 0, 5, 0), 3, "view", 0.50, '{"k": 99}'),
        (3, datetime(2024, 1, 1, 0, 9, 59), 3, "view", 0.25, '{"k": 51}'),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id: long, ts: timestamp, user_id: long, event_type: string,"
        " value: double, props: string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        (r.window_start, r.event_type): r
        for r in entrymod._q_event_window_rates(spark, str(tmp_path)).collect()
    }
    # naive datetimes above are interpreted in the session tz (UTC,
    # session.py); epoch computed tz-aware so the test doesn't depend
    # on the host's local zone
    base = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp())
    click = out[(base, "click")]
    assert click.n_events == 2 and click.n_users == 2 and click.n_hot == 1
    assert float(click.sum_value) == 3.30
    view = out[(base + 300, "view")]
    assert view.n_events == 2 and view.n_users == 1 and view.n_hot == 2
    assert float(view.sum_value) == 0.75
    assert len(out) == 2


# ---------------------------------------------------------- gopher rules


def _gopher(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    return {r.doc_id: r for r in gopher_rules(df).collect()}


def test_gopher_good_doc_passes_all(spark):
    text = " ".join(["the", "of"] + [f"word{i}" for i in range(58)])
    m = _gopher(spark, [text])[0]
    assert m.n_words == 60 and m.n_stopwords == 2
    for rule in (
        "ok_word_count", "ok_mean_word_len", "ok_symbol_ratio",
        "ok_bullet", "ok_ellipsis", "ok_alpha", "ok_stopwords",
    ):
        assert getattr(m, rule), rule
    assert m.gopher_ok


def test_gopher_word_count_boundary(spark):
    at_50 = " ".join(["the", "of"] + [f"word{i}" for i in range(48)])
    at_49 = " ".join(["the", "of"] + [f"word{i}" for i in range(47)])
    got = _gopher(spark, [at_50, at_49])
    assert got[0].ok_word_count and got[0].gopher_ok
    assert not got[1].ok_word_count and not got[1].gopher_ok


def test_gopher_mean_word_len_boundaries(spark):
    # inclusive [3, 10]: exactly 3.0 and exactly 10.0 pass
    got = _gopher(
        spark,
        [
            " ".join(["abc"] * 50),          # mean 3.0 -> ok
            " ".join(["ab"] * 50),           # mean 2.0 -> fail
            " ".join(["abcdefghij"] * 50),   # mean 10.0 -> ok
            " ".join(["abcdefghijk"] * 50),  # mean 11.0 -> fail
        ],
    )
    assert got[0].ok_mean_word_len and got[2].ok_mean_word_len
    assert not got[1].ok_mean_word_len and not got[3].ok_mean_word_len


def test_gopher_symbol_ratio_boundary(spark):
    # 10 hashes / 100 words = exactly 0.1 -> ok; one more hash fails
    base = [f"w{i}" for i in range(90)]
    ok = " ".join(base + ["#"] * 10)
    bad = " ".join(base + ["#"] * 11)
    dots = " ".join([f"w{i}" for i in range(9)] + ["..."])  # 1/10 ok
    dots5 = "w1 ....."  # 5 dots = ONE non-overlapping '...' occurrence
    got = _gopher(spark, [ok, bad, dots, dots5])
    assert got[0].n_hash == 10 and got[0].ok_symbol_ratio
    assert not got[1].ok_symbol_ratio
    assert got[2].n_ellipsis_sym == 1 and got[2].ok_symbol_ratio
    assert got[3].n_ellipsis_sym == 1


def test_gopher_line_rules(spark):
    bullets_ok = "\n".join(["intro line"] + [f"- item {i}" for i in range(9)])
    bullets_bad = "\n".join([f"* item {i}" for i in range(10)])
    unicode_bullet = "• dot item\nplain"
    ell_ok = "\n".join([f"line {i}" for i in range(7)] + ["a...", "b...", "c…"])
    ell_bad = "\n".join(
        [f"line {i}" for i in range(6)] + ["a...", "b...", "c...", "d... "]
    )
    got = _gopher(spark, [bullets_ok, bullets_bad, unicode_bullet, ell_ok, ell_bad])
    assert got[0].n_bullet_lines == 9 and got[0].ok_bullet  # 9/10 = 90% ok
    assert got[1].n_bullet_lines == 10 and not got[1].ok_bullet
    assert got[2].n_bullet_lines == 1
    assert got[3].n_ellipsis_lines == 3 and got[3].ok_ellipsis  # 30% ok
    # trailing space is rtrimmed before the endswith test
    assert got[4].n_ellipsis_lines == 4 and not got[4].ok_ellipsis


def test_gopher_alpha_and_stopword_rules(spark):
    alpha_ok = " ".join(["a1"] * 8 + ["123", "456"])   # 8/10 = 80% ok
    alpha_bad = " ".join(["a1"] * 7 + ["123"] * 3)     # 70% fail
    stop_dup = "the the the"   # one DISTINCT stopword -> fail
    stop_two = "the of"        # two distinct -> ok
    got = _gopher(spark, [alpha_ok, alpha_bad, stop_dup, stop_two])
    assert got[0].n_alpha_words == 8 and got[0].ok_alpha
    assert not got[1].ok_alpha
    assert got[2].n_stopwords == 1 and not got[2].ok_stopwords
    assert got[3].n_stopwords == 2 and got[3].ok_stopwords


def test_gopher_query_matches_oracle_inline(spark, tmp_path):
    """Direct Spark-vs-DuckDB parity probe on a small planted corpus
    (the injection CASE chain makes every modulus branch fire)."""
    import duckdb
    import __spark_entry__ as entrymod

    texts = [
        (i, " ".join(["the", "of", "and"] + [f"tok{j}" for j in range(i % 70)]))
        for i in range(120)
    ]
    df = spark.createDataFrame(texts, "doc_id: long, text: string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    sdf = (
        entrymod._q_gopher_quality(spark, str(tmp_path))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    odf = (
        con.sql(entrymod.oracle_sql()["gopher_quality"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert sorted(sdf.columns) == sorted(odf.columns)
    for c in sorted(sdf.columns):
        assert list(sdf[c]) == list(odf[c]), c


def _dupseg(spark, texts):
    from mediaduplicatefinder_spark.functions.textstats import (
        dup_segment_metrics,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    return {
        (r.doc_id, r.granularity): r
        for r in dup_segment_metrics(df).collect()
    }


def test_dup_segments_lines_and_paras(spark):
    # 4 lines ("ab" twice), 2 paragraphs (distinct)
    got = _dupseg(spark, ["ab\ncd\n\nab\nxyz"])
    ln = got[(0, "line")]
    assert ln.n_segments == 4 and ln.n_dup_segments == 1
    assert ln.n_chars == 2 + 2 + 2 + 3 and ln.n_dup_chars == 2
    assert ln.dup_frac == 0.25 and ln.ok_dup
    assert not ln.ok_dup_chars  # 5*2 = 10 > 9 chars
    pa = got[(0, "para")]
    assert pa.n_segments == 2 and pa.n_dup_segments == 0
    assert pa.ok_dup and pa.ok_dup_chars


def test_dup_segments_thresholds_exact(spark):
    # 10 lines, 3 dups: 10*3 <= 3*10 -> ok_dup at the boundary
    text = "\n".join(["s0", "s1", "s2", "s3", "s4", "s5", "s6"] + ["s0"] * 3)
    ln = _dupseg(spark, [text])[(0, "line")]
    assert ln.n_segments == 10 and ln.n_dup_segments == 3
    assert ln.ok_dup
    # one more dup tips it over
    ln2 = _dupseg(spark, [text + "\ns1"])[(0, "line")]
    assert ln2.n_dup_segments == 4 and not ln2.ok_dup


def test_dup_segments_empty_doc_keeps_rows(spark):
    got = _dupseg(spark, ["", "\n\n\n"])
    for i in (0, 1):
        for g in ("line", "para"):
            r = got[(i, g)]
            assert r.n_segments == 0 and r.n_chars == 0
            assert r.dup_frac == 0.0 and r.ok_dup and r.ok_dup_chars


def test_script_mix_classes(spark):
    from mediaduplicatefinder_spark.functions.textstats import script_mix

    rows = [
        (1, "plain latin text here"),
        (2, "привет мир"),
        (3, "mixed латиница and latin but mostly latin text wins here"),
        (4, "你好世界 こんにちは"),
        (5, "12345 67890"),
        (6, ""),
        (7, "?!... ---"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r.doc_id: r for r in script_mix(df).collect()}
    assert got[1].main_script == "latin" and got[1].n_latin > 0
    assert got[2].main_script == "cyrillic"
    assert got[3].main_script == "latin" and got[3].n_cyrillic > 0
    assert got[4].main_script == "cjk"
    assert got[5].main_script == "digit"
    assert got[6].main_script == "none" and got[6].n_chars == 0
    assert got[7].main_script == "none"  # punctuation is no script
    # counts partition sanity: script counts never exceed total chars
    for r in got.values():
        assert r.n_latin + r.n_cyrillic + r.n_cjk <= r.n_chars


def test_script_mix_math_signs_not_latin(spark):
    from mediaduplicatefinder_spark.functions.textstats import script_mix

    # U+00D7 × and U+00F7 ÷ sit inside the Latin-1 block but are math
    # symbols; the neighbors À (U+00C0) / ø (U+00F8) are real letters
    df = spark.createDataFrame(
        [(1, "×÷"), (2, "ÀÖØöø")],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: r for r in script_mix(df).collect()}
    assert got[1].n_latin == 0 and got[1].main_script == "none"
    assert got[2].n_latin == 5 and got[2].main_script == "latin"


def test_script_mix_tie_break(spark):
    from mediaduplicatefinder_spark.functions.textstats import script_mix

    # equal latin and cyrillic mass: the fixed class order (latin
    # first) must win deterministically
    df = spark.createDataFrame(
        [(1, "abc где")], "doc_id: long, text: string"
    )
    r = script_mix(df).collect()[0]
    assert r.n_latin == 3 and r.n_cyrillic == 3
    assert r.main_script == "latin"
