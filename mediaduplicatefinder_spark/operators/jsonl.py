"""JSONL record parsing with a corrupt-record channel (E145): crawl
derivatives ship as JSON-lines (CDX index lines, WET/WAT metadata,
vendor dumps) and at 10^12 records some lines ARE garbage — truncated
flushes, interleaved writers, encoding accidents. The loader contract
every published pipeline needs is Spark's PERMISSIVE read lifted to an
explicit relation: parse what parses, NEVER throw, and route the rest
to a flagged channel with the raw line preserved for forensics (the
``_corrupt_record`` semantics of ``spark.read.json``, reproduced over
an in-plan string column so any source — a parquet column, a WARC
payload, a Kafka value — gets the same tolerance).

Shape: one ``from_json`` per line (JVM Jackson, map-only, no UDF) with
``columnNameOfCorruptRecord`` appended to the schema — the REAL
PERMISSIVE channel: malformed lines land in that field (Spark 4's
from_json returns an all-null struct, NOT a null struct, for malformed
input, so ``struct IS NULL`` alone under-detects; empty/NULL lines are
the only null-struct case and are corrupt too). Fields project out of
the struct, NULL on the corrupt channel. Nothing shuffles.

Cross-engine contract: validity is "the whole line parses as a JSON
object" — the jsonld.py (E137) dialect rule: both engines agree on
well-formed objects and on structurally-broken lines (truncation,
unbalanced braces); exotic dialect edges (NaN literals, trailing
commas) are out of contract and documented there.

Reference tie-in: the reference's per-file tolerance branch
(duplicate_gui.py:841-856 — a file that fails to load becomes an
invalid row, never an exception) applied to the record-stream case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

JSONL_SCHEMA = "url string, lang string, n bigint"


def parse_jsonl(
    lines: DataFrame, line_col: str = "line", schema: str = JSONL_SCHEMA
) -> DataFrame:
    """Input rows + (parsed fields..., corrupt): PERMISSIVE JSONL
    parse — corrupt lines keep their raw line and NULL fields."""
    parsed = F.from_json(
        F.col(line_col),
        schema + ", _crpt string",
        {"columnNameOfCorruptRecord": "_crpt"},
    )
    with_p = lines.withColumn("_p", parsed)
    field_names = [f.strip().split()[0] for f in schema.split(",")]
    corrupt = F.col("_p").isNull() | F.col("_p")["_crpt"].isNotNull()
    cols = [
        F.when(~corrupt, F.col("_p")[f]).alias(f) for f in field_names
    ]
    return with_p.select(
        *lines.columns,
        *cols,
        corrupt.alias("corrupt"),
    ).drop("_p")
