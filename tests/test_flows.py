"""Composed crawl_to_training flow (flows.py): stage-boundary
invariants over a hand-built crawl where every stage has known work —
multiple snapshots per canonical identity, furniture lines, shared
paragraphs, near-dup texts — fed through REAL WARC segment bytes."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.flows import crawl_to_training
from mediaduplicatefinder_spark.operators.warc import build_warc_bytes

BODY = (
    "the quick brown fox jumps over the lazy dog and keeps running far "
    "beyond the hills tonight with great joy and very little rest"
)
NEAR = BODY.replace("great joy", "enormous joy")
OTHER = (
    "completely different content about cooking pasta with tomato sauce "
    "basil leaves parmesan cheese and a pinch of salt for the evening"
)
SHARED_PARA = "this exact paragraph appears in several documents verbatim"
FURNITURE = "\nAdvertisement\n12,345"
# contiguous 11-word run of BODY + contiguous 8-word run of OTHER + a
# unique tail: 11 of its 19 5-grams (0.579 > 1/2) already exist in
# other keepers, while its word-set jaccard to BODY (0.344) and OTHER
# (0.303) stays far under the 0.6 SIMILAR gate — the mosaic document
# only the onion stage can flag
MOSAIC = (
    "the quick brown fox jumps over the lazy dog and keeps "
    "completely different content about cooking pasta with tomato "
    "zebra quantum violet marshmallow"
)


def _pages():
    """(url, ts, text, lang) rows; identities and expectations:

    - id A (two spellings, two snapshots): winner ts=200, text=BODY
    - id B: NEAR (near-dup of A's winner) + a shared paragraph
    - id C: OTHER + the same shared paragraph (dropped at para stage)
    - id D: furniture-only doc -> line cleanup drops it (keep_doc false)
    - id E: MOSAIC stitched from A+C fragments -> unclustered keeper,
      flagged only by the onion stage (onion_kept false, not selected)
    """
    return [
        ("https://a.example.org/x", 100, OTHER + "\nold snapshot", "en"),
        ("HTTPS://A.example.org/x?utm_source=z", 200, BODY, "en"),
        ("https://b.example.org/y", 300, NEAR + "\n" + SHARED_PARA, "en"),
        ("https://c.example.org/z", 400, OTHER + "\n" + SHARED_PARA, "en"),
        ("https://d.example.org/w", 500, "tiny" + FURNITURE * 30, "en"),
        ("https://e.example.org/m", 600, MOSAIC, "en"),
    ]


@pytest.fixture(scope="module")
def flow_out(spark):
    rows = _pages()

    def seg(pdf: pd.DataFrame) -> pd.DataFrame:
        recs = [
            {
                "type": "response",
                "url": u,
                "ts": dt.datetime.utcfromtimestamp(int(t)),
                "body": ("<html><body>" + txt + "</body></html>").encode(),
            }
            for u, t, txt in zip(pdf["url"], pdf["ts"], pdf["text"])
        ]
        return pd.DataFrame(
            {"segment_id": ["s0"], "data": [build_warc_bytes(recs)]}
        )

    pages = spark.createDataFrame(
        rows, "url string, ts long, text string, lang string"
    )
    segments = (
        pages.withColumn("__seg", F.lit(0))
        .groupBy("__seg")
        .applyInPandas(seg, "segment_id string, data binary")
    )
    page_langs = pages.select(
        "url", F.timestamp_seconds("ts").alias("warc_ts"), "lang"
    )
    out = crawl_to_training(segments, page_langs, pct=80)
    return {r.canon_url: r for r in out.collect()}


def test_snapshot_stage(flow_out):
    got = flow_out
    # 5 canonical identities (A collapses two spellings)
    assert len(got) == 5
    a = got["https://a.example.org/x"]
    assert a.n_snapshots == 2 and a.winner_ts == 200


def test_line_cleanup_stage(flow_out):
    d = flow_out["https://d.example.org/w"]
    assert not d.keep_doc
    # dropped docs carry sentinels and never reach later stages
    assert d.n_paras_dropped == -1 and d.dup_kind == "none"
    assert not d.is_keeper and not d.selected and d.offset == -1
    assert all(flow_out[k].keep_doc for k in flow_out if k != d.canon_url)


def test_paragraph_dedup_stage(flow_out):
    b = flow_out["https://b.example.org/y"]
    c = flow_out["https://c.example.org/z"]
    # the shared paragraph survives in B (smaller key) and drops in C
    assert b.n_paras_dropped == 0
    assert c.n_paras_dropped == 1


def test_near_dup_stage(flow_out):
    a = flow_out["https://a.example.org/x"]
    b = flow_out["https://b.example.org/y"]
    # A's winner and B are near-dups: one keeper, one flagged member
    assert {a.dup_kind, b.dup_kind} == {"SIMILAR"}
    assert a.is_keeper != b.is_keeper
    # C is unclustered: keeper by default
    assert flow_out["https://c.example.org/z"].is_keeper


def test_onion_stage(flow_out):
    e = flow_out["https://e.example.org/m"]
    # the mosaic is NOT a near-dup of anything (jaccard far below the
    # 0.6 gate) so it reaches the onion stage as an unclustered keeper…
    assert e.dup_kind == "none" and e.is_keeper
    # …where the cross-doc duplicated-gram ratio flags it
    assert e.onion_dup_frac > 0.5 and not e.onion_kept
    assert not e.selected and e.n_tokens == -1
    # surviving keepers pass the gate with a real (low) ratio
    keepers = [r for r in flow_out.values() if r.is_keeper and r.canon_url != e.canon_url]
    assert keepers and all(k.onion_kept and 0.0 <= k.onion_dup_frac <= 0.5 for k in keepers)
    # docs that never reach the gate carry the sentinels
    for r in flow_out.values():
        if not r.is_keeper:
            assert r.onion_dup_frac == -1.0 and not r.onion_kept


def test_selection_and_packing(flow_out):
    sel = [r for r in flow_out.values() if r.selected]
    # selected is a subset of onion-kept dedup keepers that passed
    # line cleanup
    assert sel and all(r.is_keeper and r.keep_doc and r.onion_kept for r in sel)
    # packing offsets tile the stream: sorted by doc key, each offset
    # equals the previous offset + previous cost (n_tokens + 1)
    sel.sort(key=lambda r: r.canon_url)
    acc = 0
    for r in sorted(sel, key=lambda r: r.offset):
        assert r.offset == acc
        acc += r.n_tokens + 1
        assert r.seq_start >= 0 and r.seq_end >= r.seq_start
    unsel = [r for r in flow_out.values() if not r.selected]
    assert all(r.n_tokens == -1 and r.offset == -1 for r in unsel)
