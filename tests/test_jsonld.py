"""E137 JSON-LD extraction (functions/jsonld.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.jsonld import jsonld_meta

BLOCK = '<script type="application/ld+json">%s</script>'


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, html string")


def test_fields_and_order(spark):
    html = (
        "<html>"
        + BLOCK % '{"@type":"Article","headline":"A","datePublished":"2026-01-02"}'
        + "<p>body</p>"
        + BLOCK % '{"@type":"Product","headline":"B"}'
        + "</html>"
    )
    rows = sorted(
        jsonld_meta(_pages(spark, [(1, html)])).collect(),
        key=lambda r: r.block_idx,
    )
    assert [(r.block_idx, r.jtype, r.headline, r.date_published, r.valid)
            for r in rows] == [
        (0, "Article", "A", "2026-01-02", True),
        (1, "Product", "B", None, True),
    ]


def test_malformed_block_is_invalid_row(spark):
    html = BLOCK % '{"@type":"Article"' + BLOCK % '{"@type":"Org"}'
    rows = sorted(
        jsonld_meta(_pages(spark, [(1, html)])).collect(),
        key=lambda r: r.block_idx,
    )
    assert rows[0].valid is False and rows[0].jtype is None
    assert rows[1].valid is True and rows[1].jtype == "Org"


def test_no_blocks_no_rows(spark):
    assert jsonld_meta(
        _pages(spark, [(1, "<html><body>x</body></html>")])
    ).count() == 0


def test_multiline_json_and_body_decoys(spark):
    html = (
        BLOCK % '{\n  "@type": "Article",\n  "headline": "ML"\n}'
        + '<script>var x = "application/ld+json";</script>'
        + '<p>{"@type":"Fake"}</p>'
    )
    rows = jsonld_meta(_pages(spark, [(1, html)])).collect()
    assert len(rows) == 1
    assert rows[0].headline == "ML" and rows[0].valid


def test_nested_json_fields_null_not_error(spark):
    html = BLOCK % '{"@type":"Article","author":{"name":"N"}}'
    [r] = jsonld_meta(_pages(spark, [(1, html)])).collect()
    assert r.headline is None and r.valid
