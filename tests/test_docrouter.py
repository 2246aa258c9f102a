"""E134 content-sniffed document dispatch (operators/docrouter.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.docrouter import (
    route_document,
    route_documents,
)
from mediaduplicatefinder_spark.operators.office import (
    make_docx,
    make_pptx,
    make_xlsx,
)
from mediaduplicatefinder_spark.operators.pdf import make_pdf


def test_routes_by_content_not_extension():
    assert route_document(make_pdf(["x"])) == ("pdf", "x")
    assert route_document(make_docx(["hello"])) == ("docx", "hello")
    assert route_document(make_pptx([["hi"]])) == ("pptx", "hi")
    kind, text = route_document(make_xlsx({"s": [["1"]]}))
    assert kind == "xlsx" and text is None


def test_unknown_and_empty():
    assert route_document(b"GIF89a...") == ("unknown", None)
    assert route_document(b"") == ("unknown", None)
    assert route_document(None) == ("unknown", None)
    # zip that is not OOXML
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a.txt", "x")
    assert route_document(buf.getvalue()) == ("unknown", None)


def test_truncated_payloads_degrade():
    assert route_document(make_docx(["x"])[:40]) == ("unknown", None)
    kind, text = route_document(make_pdf(["x"])[:60])
    assert kind == "pdf"  # magic said pdf; broken body -> empty/None text


def test_spark_mixed_batch(spark):
    rows = [
        (1, make_docx(["a"])),
        (2, make_pptx([["b"]])),
        (3, make_pdf(["c"])),
        (4, b"%!PS not handled"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in route_documents(df).collect()}
    assert (got[1].doc_kind, got[1].text) == ("docx", "a")
    assert (got[2].doc_kind, got[2].text) == ("pptx", "b")
    assert (got[3].doc_kind, got[3].text) == ("pdf", "c")
    assert got[4].doc_kind == "unknown" and not got[4].valid
