"""E150 training funnel: exact numbers vs a hand-built stage matrix,
monotone attrition, ppm arithmetic, and partition invariance. (The
DuckDB value twin — the funnel aggregated over the full chained
crawl_to_training oracle — runs in the correctness gate at sf0.01.)"""

from __future__ import annotations

import pytest

from mediaduplicatefinder_spark.flows import FUNNEL_PPM, training_funnel


@pytest.fixture(scope="module")
def ct(spark):
    # (canon_url, n_snapshots, keep_doc, is_keeper, onion_kept,
    #  selected, n_tokens) — 6 winners from 11 snapshots; one dropped
    # at each stage; 3 survive selection with 10+20+30 tokens
    rows = [
        ("u1", 3, True, True, True, True, 10),
        ("u2", 2, True, True, True, True, 20),
        ("u3", 1, True, True, True, True, 30),
        ("u4", 2, True, True, False, False, -1),   # onion drop
        ("u5", 1, True, False, False, False, -1),  # dedup loser
        ("u6", 2, False, False, False, False, -1), # line-cleanup drop
    ]
    return spark.createDataFrame(
        rows,
        "canon_url string, n_snapshots long, keep_doc boolean, "
        "is_keeper boolean, onion_kept boolean, selected boolean, "
        "n_tokens long",
    )


def test_funnel_numbers(spark, ct):
    got = {r["stage"]: r for r in training_funnel(ct).collect()}
    n = {s: got[s]["n"] for s in got}
    assert n == {
        "snapshots": 11,
        "snapshot_winners": 6,
        "line_cleanup": 5,
        "dedup_keepers": 4,
        "onion_kept": 3,
        "selected": 3,
        "selected_tokens": 60,
    }
    assert got["snapshots"]["retained_ppm"] is None
    assert got["snapshot_winners"]["retained_ppm"] == 6 * FUNNEL_PPM // 11
    assert got["line_cleanup"]["retained_ppm"] == 5 * FUNNEL_PPM // 6
    assert got["selected"]["retained_ppm"] == FUNNEL_PPM  # 3 of 3
    assert got["selected_tokens"]["unit"] == "tokens"
    assert got["selected_tokens"]["retained_ppm"] is None


def test_monotone_attrition(spark, ct):
    rows = sorted(
        (r for r in training_funnel(ct).collect() if r["unit"] == "docs"),
        key=lambda r: r["stage_ord"],
    )
    for a, b in zip(rows, rows[1:]):
        assert b["n"] <= a["n"]
        if a["n"] > 0:
            assert 0 <= b["retained_ppm"] <= FUNNEL_PPM


def test_partition_invariance(spark, ct):
    a = training_funnel(ct).collect()
    b = training_funnel(ct.repartition(4)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
