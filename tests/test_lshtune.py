"""LSH (bands, rows) S-curve optimizer (functions/lshtune.py)."""

from __future__ import annotations

import pytest

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.functions.lshtune import (
    LshPlan,
    candidate_probability,
    tune_lsh,
)


def test_s_curve_basics():
    # monotone in s; b=1,r=1 is the identity line
    assert candidate_probability(0.3, 1, 1) == pytest.approx(0.3)
    ps = [candidate_probability(s / 10, 8, 4) for s in range(11)]
    assert all(a <= b + 1e-12 for a, b in zip(ps, ps[1:]))
    assert ps[0] == 0.0 and ps[-1] == pytest.approx(1.0)


def test_threshold_tracks_inflection():
    # the classic rule of thumb: the S-curve midpoint ~ (1/b)^(1/r);
    # the tuned plan's midpoint must land near the requested threshold
    for t in (0.4, 0.6, 0.8):
        plan = tune_lsh(t, n_perm=128)
        mid = (1.0 / plan.bands) ** (1.0 / plan.rows)
        assert abs(mid - t) < 0.15, (t, plan)


def test_budget_respected_and_errors_balanced():
    plan = tune_lsh(0.6, n_perm=64)
    assert plan.bands * plan.rows <= 64
    assert plan.fp_mass >= 0 and plan.fn_mass >= 0
    # weighting FP harder must not increase FP mass
    strict = tune_lsh(0.6, n_perm=64, fp_weight=0.9, fn_weight=0.1)
    assert strict.fp_mass <= plan.fp_mass + 1e-12


def test_engine_config_is_recall_biased_and_near_fn_optimal():
    """The shipped (32, 4) banding is deliberately RECALL-biased — the
    north rule demands dup-pair recall >= 0.99, so the hand-chosen
    config trades candidate volume (FP mass, paid once in the verify
    stage) for a near-zero miss rate. Pins: (1) the S-curve midpoint
    sits well BELOW the 0.6 gate, (2) FN mass is tiny in absolute
    terms, (3) under an fn-heavy objective the optimizer confirms the
    shipped plan is within 3x of the achievable FN mass."""
    cfg = DEFAULT_CONFIG
    n_perm = cfg.minhash_bands * cfg.minhash_rows
    from mediaduplicatefinder_spark.functions.lshtune import _integral

    mid = (1.0 / cfg.minhash_bands) ** (1.0 / cfg.minhash_rows)
    assert mid < cfg.jaccard_threshold - 0.1  # curve shifted left

    fn = _integral(
        cfg.jaccard_threshold, 1.0, 200,
        lambda s: 1 - candidate_probability(s, cfg.minhash_bands, cfg.minhash_rows),
    )
    assert fn < 0.001  # near-zero miss mass above the gate

    best = tune_lsh(
        cfg.jaccard_threshold, n_perm=n_perm, fp_weight=0.02, fn_weight=0.98
    )
    assert fn <= 3 * max(best.fn_mass, 1e-6), (fn, best)


def test_validation():
    with pytest.raises(ValueError):
        tune_lsh(0.0, 16)
    with pytest.raises(ValueError):
        tune_lsh(0.5, 1)
