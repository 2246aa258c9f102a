"""E30 PII redaction: planted spans, boundary cases, and direct
Spark-vs-DuckDB match-span parity on adversarial strings."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.redact import (
    pii_counts,
    redact_pii,
    redact_sql,
)

CASES = [
    "mail me at jane.doe+x@sub.example.org today",
    "server 192.168.0.1 and 8.8.8.8 up",
    "call +4915123456789 now",
    "x10.5.0.1 is not an ip boundary",  # no \b before the 1
    "user@1.2.3.4 host has no alpha tld",  # email must NOT match
    "+123456789012345678 overruns fifteen digits",
    "nothing to scrub here",
    "",
    "a@b.co +1234567 1.2.3.4 all three",
]


def _spark_out(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "i long, t string")
    cnts = pii_counts(F.col("t"))
    return (
        df.select(
            "i",
            *[c.alias(n) for n, c in cnts.items()],
            redact_pii(F.col("t")).alias("red"),
        )
        .orderBy("i")
        .collect()
    )


def test_redaction_semantics(spark):
    rows = {r.i: r for r in _spark_out(spark)}
    assert rows[0].red == "mail me at [EMAIL] today" and rows[0].n_email == 1
    assert rows[1].red == "server [IP] and [IP] up" and rows[1].n_ipv4 == 2
    assert rows[2].red == "call [PHONE] now" and rows[2].n_phone == 1
    assert rows[3].n_ipv4 == 0 and rows[3].red == CASES[3]
    # email regex requires an alphabetic TLD; the IP inside still matches
    assert rows[4].n_email == 0 and rows[4].n_ipv4 == 1
    assert rows[4].red == "user@[IP] host has no alpha tld"
    # greedy {7,15} takes exactly 15 digits in both engines
    assert rows[5].n_phone == 1 and rows[5].red == "[PHONE]678 overruns fifteen digits"
    assert rows[6].red == CASES[6] and rows[7].red == ""
    assert (rows[8].n_email, rows[8].n_phone, rows[8].n_ipv4) == (1, 1, 1)


def test_cross_engine_parity(spark):
    got = [
        (r.n_email, r.n_ipv4, r.n_phone, r.red) for r in _spark_out(spark)
    ]
    red, cnts = redact_sql("t")
    con = duckdb.connect()
    con.execute("CREATE TABLE c(i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?, ?)", list(enumerate(CASES)))
    ref = con.sql(
        f"SELECT {cnts['n_email']}, {cnts['n_ipv4']}, {cnts['n_phone']},"
        f" {red} FROM c ORDER BY i"
    ).fetchall()
    assert got == [tuple(r) for r in ref]
