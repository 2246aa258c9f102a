"""Structured Streaming ingestion tests (streaming/ingest.py): stateful
cross-batch exact dedup parity with the batch pipeline, and windowed
lang rates."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest


def _write_batch(spark, rows, out_dir, fname):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us", tz="UTC")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        f"{out_dir}/{fname}",
    )


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2025, 1, 1, 12, minute, tzinfo=dt.timezone.utc)


@pytest.fixture
def staged_dirs(tmp_path):
    inp = tmp_path / "in"
    out = tmp_path / "out"
    ck1 = tmp_path / "ck_dedup"
    ck2 = tmp_path / "ck_rates"
    inp.mkdir()
    return str(inp), str(out), str(ck1), str(ck2)


def test_streaming_exact_dedup_across_batches(spark, staged_dirs):
    from mediaduplicatefinder_spark.streaming import ingest

    inp, out, ck, _ = staged_dirs
    # batch 1: two distinct texts, one internal dup
    _write_batch(
        spark,
        [
            ("u://1", _ts(0), b"", "alpha beta gamma", "en"),
            ("u://2", _ts(1), b"", "alpha beta gamma", "en"),
            ("u://3", _ts(2), b"", "delta epsilon", "en"),
        ],
        inp,
        "b1.parquet",
    )
    stream = ingest.read_pages_stream(spark, inp)
    q = ingest.run_to_parquet(ingest.streaming_exact_dedup(stream), out, ck)
    q.awaitTermination()
    got1 = {r.url for r in spark.read.parquet(out).collect()}
    assert len(got1) == 2  # one survivor per distinct text

    # batch 2: replays one old text (must be suppressed by STATE), adds one new
    _write_batch(
        spark,
        [
            ("u://4", _ts(3), b"", "alpha beta gamma", "en"),
            ("u://5", _ts(4), b"", "zeta eta theta", "de"),
        ],
        inp,
        "b2.parquet",
    )
    # RESTART the query from the checkpoint (new query object, same state)
    stream2 = ingest.read_pages_stream(spark, inp)
    q2 = ingest.run_to_parquet(ingest.streaming_exact_dedup(stream2), out, ck)
    q2.awaitTermination()
    got2 = {r.url for r in spark.read.parquet(out).collect()}
    assert "u://4" not in got2  # cross-batch duplicate suppressed by state
    assert "u://5" in got2  # new text admitted
    assert len(got2) == 3  # total distinct texts across both batches


def test_streaming_lang_rates_windows(spark, staged_dirs):
    from mediaduplicatefinder_spark.streaming import ingest

    inp, _, _, ck = staged_dirs
    _write_batch(
        spark,
        [
            ("u://1", _ts(0), b"", "a", "en"),
            ("u://2", _ts(0), b"", "b", "en"),
            ("u://3", _ts(0), b"", "c", "de"),
            ("u://4", _ts(5), b"", "d", "en"),
        ],
        inp,
        "b1.parquet",
    )
    stream = ingest.read_pages_stream(spark, inp)
    # complete mode: append would hold back windows the watermark has not
    # closed yet (correct for an unbounded stream; a drained availableNow
    # run wants every window)
    q = ingest.run_to_memory(
        ingest.streaming_lang_rates(stream), "rates_t", ck, "complete"
    )
    q.awaitTermination()
    rows = {
        (r.window_start.minute, r.lang): r.n_pages
        for r in spark.sql("SELECT * FROM rates_t").collect()
    }
    assert rows[(0, "en")] == 2
    assert rows[(0, "de")] == 1
    assert rows[(5, "en")] == 1


def test_streaming_late_data_dropped_past_watermark(spark, staged_dirs):
    """Watermark semantics (the late-data contract): a row older than
    the committed watermark must NOT re-open its window — the closed
    window's count excludes it, and append mode never re-emits the
    window. Two runs against one checkpoint so the watermark persists
    (run 1's max event time 12:10 - 2 min watermark = 12:08 >> the
    12:00 window end)."""
    from mediaduplicatefinder_spark.streaming import ingest

    inp, out, _, ck = staged_dirs
    _write_batch(
        spark,
        [
            ("u://1", _ts(0), b"", "a", "en"),
            ("u://2", _ts(0), b"", "b", "en"),
            ("u://3", _ts(10), b"", "c", "en"),
        ],
        inp,
        "b1.parquet",
    )
    q = ingest.run_to_parquet(
        ingest.streaming_lang_rates(ingest.read_pages_stream(spark, inp)),
        out,
        ck,
    )
    q.awaitTermination()

    # run 2: one LATE row into the already-closed 12:00 window plus an
    # on-time row that advances the watermark further
    _write_batch(
        spark,
        [
            ("u://9", _ts(0) + dt.timedelta(seconds=30), b"", "late", "en"),
            ("u://5", _ts(11), b"", "d", "en"),
        ],
        inp,
        "b2.parquet",
    )
    q2 = ingest.run_to_parquet(
        ingest.streaming_lang_rates(ingest.read_pages_stream(spark, inp)),
        out,
        ck,
    )
    q2.awaitTermination()

    got = spark.read.parquet(out).collect()
    w0 = [r for r in got if r.window_start.minute == 0]
    # exactly one emission of the 12:00 window, late row excluded
    assert len(w0) == 1
    assert w0[0].lang == "en" and w0[0].n_pages == 2
