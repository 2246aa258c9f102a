"""Gopher-style repetition metrics + event window rates (E12 family)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.textstats import repetition_metrics


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
