"""MinHash-LSH parameter tuning (the (bands, rows) S-curve optimizer).

Given a similarity threshold t and a signature budget of n_perm
MinHash values, pick the banding (b, r) with b*r <= n_perm that
minimizes weighted false-positive + false-negative probability mass
around the threshold — the standard optimizer LSH libraries run at
index-build time (Leskovec/Rajaraman/Ullman, Mining of Massive
Datasets ch. 3: P[candidate | s] = 1 - (1 - s^r)^b).

The engine's shipped config (config.py minhash_bands/minhash_rows) was
hand-chosen for the reference's 0.6 gate; this utility makes the
choice reproducible and lets a deployment re-derive (b, r) for a
different gate or permutation budget. Pure driver-side math — nothing
distributed — so it is pytest-verified rather than oracle-gated.
"""

from __future__ import annotations

from dataclasses import dataclass


def candidate_probability(s: float, b: int, r: int) -> float:
    """P[some band collides] = 1 - (1 - s^r)^b for Jaccard s."""
    return 1.0 - (1.0 - s**r) ** b


@dataclass(frozen=True)
class LshPlan:
    bands: int
    rows: int
    fp_mass: float  # integral of P below the threshold (false positives)
    fn_mass: float  # integral of (1 - P) above it (false negatives)


def tune_lsh(
    threshold: float,
    n_perm: int,
    fp_weight: float = 0.5,
    fn_weight: float = 0.5,
    grid: int = 200,
) -> LshPlan:
    """Search every (b, r) with b*r <= n_perm; score by trapezoidal
    integrals of the S-curve's error mass on [0, t] and [t, 1]."""
    if not (0.0 < threshold < 1.0):
        raise ValueError("threshold must be in (0, 1)")
    if n_perm < 2:
        raise ValueError("n_perm must be >= 2")
    best: LshPlan | None = None
    best_score = float("inf")
    for b in range(1, n_perm + 1):
        r_max = n_perm // b
        for r in range(1, r_max + 1):
            fp = _integral(0.0, threshold, grid, lambda s: candidate_probability(s, b, r))
            fn = _integral(
                threshold, 1.0, grid, lambda s: 1.0 - candidate_probability(s, b, r)
            )
            score = fp_weight * fp + fn_weight * fn
            if score < best_score - 1e-15:
                best_score = score
                best = LshPlan(bands=b, rows=r, fp_mass=fp, fn_mass=fn)
    assert best is not None
    return best


def _integral(lo: float, hi: float, grid: int, fn) -> float:
    if hi <= lo:
        return 0.0
    h = (hi - lo) / grid
    total = 0.5 * (fn(lo) + fn(hi))
    for i in range(1, grid):
        total += fn(lo + i * h)
    return total * h
