"""UniMax budget allocation (operators/unimax.py, Chung et al.
ICLR'23): closed window form vs the paper's sequential greedy, both
branches, integer exactness."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mediaduplicatefinder_spark.operators.unimax import unimax_budgets


def _greedy(counts, budget, epochs_cap):
    """The paper's sequential greedy in its deterministic integer form:
    capped languages take E*n; from the first uniform language on, the
    share is fixed at floor(remaining / remaining_langs)."""
    order = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    out, remaining, left = {}, budget, len(order)
    share = None
    for lang, n in order:
        cap = epochs_cap * n
        if share is None and cap * left <= remaining:
            out[lang] = cap
            remaining -= cap
            left -= 1
        else:
            if share is None:
                share = remaining // left
            out[lang] = share
    return out


def _run(spark, counts, budget_num, budget_den, epochs_cap):
    df = spark.createDataFrame(
        list(counts.items()), "lang string, n_tokens long"
    )
    rows = unimax_budgets(
        df, budget_num=budget_num, budget_den=budget_den,
        epochs_cap=epochs_cap,
    ).collect()
    return {r["lang"]: r for r in rows}


def test_both_branches_hand_trace(spark):
    # total=1000, budget=1650, E=2: a(50)->100, b(100)->200, c(250)->500,
    # then d(600): cap 1200 > 850 remaining -> share 850
    counts = {"a": 50, "b": 100, "c": 250, "d": 600}
    got = _run(spark, counts, 165, 100, 2)
    assert {k: v["budget_tokens"] for k, v in got.items()} == {
        "a": 100, "b": 200, "c": 500, "d": 850,
    }
    assert got["a"]["capped"] and not got["d"]["capped"]
    assert got["d"]["epochs"] == round(850 / 600, 6)
    assert [got[k]["alloc_rank"] for k in ("a", "b", "c", "d")] == [
        1, 2, 3, 4,
    ]


def test_all_capped_leaves_budget_unspent(spark):
    # huge budget: everyone takes exactly E*n, no division by zero
    counts = {"a": 10, "b": 20}
    got = _run(spark, counts, 1000, 100, 3)  # budget = 300 >= 90
    assert {k: v["budget_tokens"] for k, v in got.items()} == {
        "a": 30, "b": 60,
    }
    assert all(v["capped"] for v in got.values())


def test_uniform_from_first_language(spark):
    # tight budget: even the smallest language exceeds its fair share
    counts = {"a": 100, "b": 100, "c": 100}
    got = _run(spark, counts, 50, 100, 2)  # budget = 150, caps 200 each
    assert {k: v["budget_tokens"] for k, v in got.items()} == {
        "a": 50, "b": 50, "c": 50,
    }
    assert not any(v["capped"] for v in got.values())


@settings(max_examples=20, deadline=None)
@given(
    ns=st.lists(st.integers(1, 10_000), min_size=1, max_size=8),
    budget_num=st.integers(10, 400),
    epochs_cap=st.integers(1, 4),
)
def test_closed_form_equals_sequential_greedy(
    spark, ns, budget_num, epochs_cap
):
    counts = {f"l{i:02d}": n for i, n in enumerate(ns)}
    budget = (sum(ns) * budget_num) // 100
    want = _greedy(counts, budget, epochs_cap)
    got = _run(spark, counts, budget_num, 100, epochs_cap)
    assert {k: v["budget_tokens"] for k, v in got.items()} == want
