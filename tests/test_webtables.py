"""HTML table extraction (functions/htmltables.py) and the positional
web-table cell-match (operators/webtables.py) vs the reference
semantics (office_comparer_batch.py:56-125)."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.htmltables import extract_tables
from mediaduplicatefinder_spark.operators.webtables import (
    webtable_match_pairs,
)


def test_extract_basic_positions():
    html = "<table><tr><td>a</td><th>b</th></tr><tr><td>c</td></tr></table>"
    assert extract_tables(html) == [
        (1, 1, 1, "a"),
        (1, 1, 2, "b"),
        (1, 2, 1, "c"),
    ]


def test_empty_row_dropped_without_consuming_index():
    html = (
        "<table><tr><td>a</td></tr>"
        "<tr><td></td><td>  </td></tr>"
        "<tr><td>b</td></tr></table>"
    )
    assert extract_tables(html) == [(1, 1, 1, "a"), (1, 2, 1, "b")]


def test_empty_cell_in_surviving_row_keeps_position():
    html = "<table><tr><td>a</td><td></td><td>c</td></tr></table>"
    assert extract_tables(html) == [
        (1, 1, 1, "a"),
        (1, 1, 2, ""),
        (1, 1, 3, "c"),
    ]


def test_nested_table_gets_own_index_no_text_leak():
    html = (
        "<table><tr><td>outer"
        "<table><tr><td>inner</td></tr></table>"
        "</td><td>after</td></tr></table>"
    )
    got = extract_tables(html)
    # inner table is table 2; outer cell text is only its own data
    assert (2, 1, 1, "inner") in got
    outer = [t for t in got if t[0] == 1]
    assert outer == [(1, 1, 1, "outer"), (1, 1, 2, "after")]


def test_whitespace_normalized_and_entities():
    html = "<table><tr><td> a&amp;b \n c </td></tr></table>"
    assert extract_tables(html) == [(1, 1, 1, "a&b c")]


def test_unclosed_cells_tolerated():
    # td/tr never closed — the next opener flushes, like real crawl html
    html = "<table><tr><td>a<td>b<tr><td>c</table>"
    assert extract_tables(html) == [
        (1, 1, 1, "a"),
        (1, 1, 2, "b"),
        (1, 2, 1, "c"),
    ]


def test_no_tables_and_garbage():
    assert extract_tables("<p>hello</p>") == []
    assert extract_tables("") == []
    assert extract_tables("<table><tr><td>x") == [(1, 1, 1, "x")]


def _cells_df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, table_idx int, row int, col int, value string"
    )


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "url_a string, url_b string")


def test_match_per_row_min_cols_and_both_empty(spark):
    # a: row1 has 3 cells, row2 has 2; b: row1 has 2 cells, row2 has 3.
    # overlap: row1 cols 1-2, row2 cols 1-2 -> compared=4;
    # matches: (1,1) equal, (1,2) both '', (2,1) equal; (2,2) differs
    cells = _cells_df(
        spark,
        [
            ("a", 1, 1, 1, "x"), ("a", 1, 1, 2, ""), ("a", 1, 1, 3, "z"),
            ("a", 1, 2, 1, "p"), ("a", 1, 2, 2, "q"),
            ("b", 1, 1, 1, "x"), ("b", 1, 1, 2, ""),
            ("b", 1, 2, 1, "p"), ("b", 1, 2, 2, "DIFF"), ("b", 1, 2, 3, "t"),
        ],
    )
    out = webtable_match_pairs(cells, _pairs_df(spark, [("a", "b")])).collect()
    r = out[0]
    assert r["n_common_tables"] == 1
    assert abs(r["score"] - 3 / 4) < 1e-12
    assert bool(r["similar"]) is True


def test_match_mean_over_common_tables_only(spark):
    # table 1 identical (score 1.0); table 2 only in a; table 3 scores 0
    cells = _cells_df(
        spark,
        [
            ("a", 1, 1, 1, "s"), ("b", 1, 1, 1, "s"),
            ("a", 2, 1, 1, "only-a"),
            ("a", 3, 1, 1, "u"), ("b", 3, 1, 1, "v"),
        ],
    )
    out = webtable_match_pairs(cells, _pairs_df(spark, [("a", "b")])).collect()
    r = out[0]
    assert r["n_common_tables"] == 2
    assert abs(r["score"] - 0.5) < 1e-12
    assert bool(r["similar"]) is False


def test_no_common_tables_scores_zero(spark):
    cells = _cells_df(
        spark, [("a", 1, 1, 1, "x"), ("b", 2, 1, 1, "x")]
    )
    out = webtable_match_pairs(cells, _pairs_df(spark, [("a", "b")])).collect()
    r = out[0]
    assert r["n_common_tables"] == 0 and r["score"] == 0.0
    assert bool(r["similar"]) is False


def test_spark_extraction_roundtrip(spark):
    df = spark.createDataFrame(
        [("u1", "<table><tr><td>a</td><td></td></tr></table>")],
        "url string, html string",
    )
    from mediaduplicatefinder_spark.functions.htmltables import (
        html_table_cells,
    )

    got = sorted(
        map(tuple, html_table_cells(df).collect())
    )
    assert got == [("u1", 1, 1, 1, "a"), ("u1", 1, 1, 2, "")]
