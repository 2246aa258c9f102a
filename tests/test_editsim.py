"""E122 edit-distance pair audit (functions/editsim.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.editsim import edit_pair_stats


def _run(spark, rows, **kw):
    df = spark.createDataFrame(
        rows, "pair_id long, text_a string, text_b string"
    )
    return {r.pair_id: r for r in edit_pair_stats(df, **kw).collect()}


def test_known_distances(spark):
    got = _run(
        spark,
        [
            (1, "kitten", "sitting"),  # the textbook 3
            (2, "same", "same"),
            (3, "abc", ""),
            (4, "", ""),
        ],
    )
    assert got[1].edit_dist == 3
    assert got[1].sim6 == round(1 - 3 / 7, 6)
    assert got[2].edit_dist == 0 and got[2].sim6 == 1.0
    assert got[3].edit_dist == 3 and got[3].sim6 == 0.0
    assert got[4].edit_dist == 0 and got[4].sim6 == 0.0  # empty-pair rule


def test_cap_window(spark):
    # differences beyond the cap are invisible to the audit
    a = "x" * 300
    b = "x" * 256 + "y" * 44
    got = _run(spark, [(1, a, b)], cap=256)
    assert got[1].edit_dist == 0
    assert got[1].len_a == 256 and got[1].len_b == 256
    got2 = _run(spark, [(1, a, b)], cap=300)
    assert got2[1].edit_dist == 44
