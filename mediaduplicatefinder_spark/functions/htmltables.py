"""HTML <table> extraction to a positional cell relation (E196) — the
webtext twin of the xlsx loader (operators/office.py, porting
office_comparer_batch.py:27-54's load_excel_fast semantics to the
format crawled pages actually carry).

The reference compares spreadsheets positionally (P12,
office_comparer_batch.py:56-125); crawled pages carry the same
payload shape as ``<table>`` markup (product grids, stats boxes,
scraped spreadsheets re-rendered by CMSes).  Extracting tables to a
``(url, table_idx, row, col, value)`` relation makes that comparison
RELATIONAL — the cell-match ratio becomes joins and aggregates over
the cells table (operators/webtables.py), no pairwise text parsing.

Parser: stdlib ``html.parser.HTMLParser`` (the office.py convention —
no external deps), tolerant by construction:

- ``<td>`` and ``<th>`` both count as cells; positions are 1-based
  (row within table, cell sequence within row) — the xlsx loader's
  coordinate convention;
- rows whose every cell is empty after whitespace-stripping are
  DROPPED, exactly like the reference's all-``None`` row drop
  (office_comparer_batch.py:44-46; dropped rows do NOT consume a row
  index, matching how the loaded row list collapses after removal);
  empty cells INSIDE a surviving row are kept as ``''`` positions —
  the reference keeps ``None`` cells inside rows and counts
  both-``None`` as a positional match (compare_sheets_fast:115-117),
  so the position must exist in the relation;
- nested tables get their own ``table_idx`` (document order of the
  opening tag); inner-table text never leaks into the outer cell
  (the cell buffer stack suspends while the inner table is open);
- ``colspan``/``rowspan`` are IGNORED (cells take the next sequence
  position) — documented divergence from visual layout, irrelevant
  to the positional-equality use;
- malformed markup degrades per-page to zero rows, never a task
  failure (the S1 corrupt-row tolerance).

Spark shape: one ``mapInPandas`` Arrow pass over (url, html) — the
binary/html column never shuffles; only the extracted cells (short
strings) do.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame


class _TableParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.cells: list[tuple[int, int, int, str]] = []
        self._next_idx = 0
        # stack of [table_idx, row_count_emitted, current_row_cells,
        # in_cell, cell_buf]
        self._stack: list[list] = []

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self._next_idx += 1
            self._stack.append([self._next_idx, 0, [], False, []])
        elif tag == "tr" and self._stack:
            self._flush_row()
        elif tag in ("td", "th") and self._stack:
            top = self._stack[-1]
            if top[3]:
                self._end_cell()
            self._stack[-1][3] = True
            self._stack[-1][4] = []

    def handle_endtag(self, tag):
        if tag in ("td", "th") and self._stack and self._stack[-1][3]:
            self._end_cell()
        elif tag == "tr" and self._stack:
            self._flush_row()
        elif tag == "table" and self._stack:
            self._flush_row()
            self._stack.pop()

    def handle_data(self, data):
        if self._stack and self._stack[-1][3]:
            self._stack[-1][4].append(data)

    def _end_cell(self):
        top = self._stack[-1]
        top[2].append(" ".join("".join(top[4]).split()))
        top[3] = False
        top[4] = []

    def _flush_row(self):
        top = self._stack[-1]
        if top[3]:
            self._end_cell()
        if top[2] and any(c for c in top[2]):
            top[1] += 1
            for ci, val in enumerate(top[2], start=1):
                self.cells.append((top[0], top[1], ci, val))
        top[2] = []


def extract_tables(html: str) -> list[tuple[int, int, int, str]]:
    """html -> [(table_idx, row, col, value)], 1-based positions,
    empty cells and all-empty rows dropped; [] on any parse error."""
    try:
        p = _TableParser()
        p.feed(html or "")
        p.close()
        while p._stack:  # tables left open at EOF: flush pending rows
            p._flush_row()
            p._stack.pop()
        return p.cells
    except Exception:
        return []


def html_table_cells(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages(url, html) -> cells(url, table_idx, row, col, value)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tis, rows, cols, vals = [], [], [], [], []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                if isinstance(html, (bytes, bytearray)):
                    html = html.decode("utf-8", errors="replace")
                for ti, r, c, v in extract_tables(html):
                    urls.append(url)
                    tis.append(ti)
                    rows.append(r)
                    cols.append(c)
                    vals.append(v)
            yield pd.DataFrame(
                {
                    "url": pd.Series(urls, dtype=object),
                    "table_idx": pd.Series(tis, dtype="int32"),
                    "row": pd.Series(rows, dtype="int32"),
                    "col": pd.Series(cols, dtype="int32"),
                    "value": pd.Series(vals, dtype=object),
                }
            )

    return pages.select(url_col, html_col).mapInPandas(
        gen,
        "url string, table_idx int, row int, col int, value string",
    )
