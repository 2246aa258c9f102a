"""B-cubed agreement (operators/agreement.py E199) vs hand-computed
values (the classic 5-item example) and its formal properties."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.agreement import bcubed_agreement


def _part(spark, assign):
    return spark.createDataFrame(
        list(assign.items()), "item long, cluster string"
    )


GOLD = {1: "A1", 2: "A1", 3: "A1", 4: "A2", 5: "A2"}
CAND = {1: "B1", 2: "B1", 3: "B2", 4: "B2", 5: "B3"}


def test_hand_computed_example(spark):
    r = bcubed_agreement(_part(spark, GOLD), _part(spark, CAND)).collect()[0]
    assert r["n_items"] == 5
    # sum_prec = 4/2 + 2/2 + 1/1 = 4; sum_rec = 5/3 + 2/2 = 8/3
    assert r["sp_scaled"] == 4_000_000_000
    assert r["sr_scaled"] == 2_666_666_666  # floor(5e9/3) + 1e9
    assert abs(r["bcubed_precision"] - 0.8) < 1e-9
    assert abs(r["bcubed_recall"] - 0.533333333) < 1e-9
    assert abs(r["bcubed_f1"] - 0.64) < 1e-6


def test_swap_transposes_precision_recall(spark):
    fwd = bcubed_agreement(
        _part(spark, GOLD), _part(spark, CAND)
    ).collect()[0]
    rev = bcubed_agreement(
        _part(spark, CAND), _part(spark, GOLD)
    ).collect()[0]
    assert fwd["bcubed_precision"] == rev["bcubed_recall"]
    assert fwd["bcubed_recall"] == rev["bcubed_precision"]
    assert fwd["bcubed_f1"] == rev["bcubed_f1"]


def test_identical_partitions_score_one(spark):
    r = bcubed_agreement(_part(spark, GOLD), _part(spark, GOLD)).collect()[0]
    assert r["bcubed_precision"] == 1.0
    assert r["bcubed_recall"] == 1.0
    assert r["bcubed_f1"] == 1.0


def test_purity_hand_computed(spark):
    from mediaduplicatefinder_spark.operators.agreement import (
        purity_agreement,
    )

    r = purity_agreement(
        _part(spark, GOLD), _part(spark, CAND)
    ).collect()[0]
    # purity: B1 max 2, B2 max 1, B3 max 1 -> 4/5; inverse: A1 max 2,
    # A2 max 1 -> 3/5
    assert r["purity_num"] == 4 and r["inverse_num"] == 3
    assert abs(r["purity"] - 0.8) < 1e-9
    assert abs(r["inverse_purity"] - 0.6) < 1e-9
    # F = 2*0.8*0.6/1.4
    assert abs(r["purity_f1"] - (2 * 4 * 3) / (7 * 5)) < 1e-9


def test_purity_singleton_blindspot(spark):
    # the documented blind spot: all-singleton candidates get purity 1
    from mediaduplicatefinder_spark.operators.agreement import (
        purity_agreement,
    )

    cand = {i: f"S{i}" for i in GOLD}
    r = purity_agreement(
        _part(spark, GOLD), _part(spark, cand)
    ).collect()[0]
    assert r["purity"] == 1.0
    assert abs(r["inverse_purity"] - 0.4) < 1e-9


def test_all_singletons_candidate(spark):
    # singletons: precision 1 (each candidate cluster pure), recall =
    # avg 1/|gold cluster| = (3*(1/3) + 2*(1/2))/5 = 2/5
    cand = {i: f"S{i}" for i in GOLD}
    r = bcubed_agreement(_part(spark, GOLD), _part(spark, cand)).collect()[0]
    assert r["bcubed_precision"] == 1.0
    assert abs(r["bcubed_recall"] - 0.4) < 1e-9
