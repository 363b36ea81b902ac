"""PII redaction (pipeline/pii.py) and sliding-window chunking
(pipeline/chunking.py): pattern behavior on crafted strings, the window
rule's edge cases, and cross-engine parity — the Spark expressions and
their DuckDB sql_* twins must agree byte-for-byte on the same inputs
(the property the driver's oracle hash-compare relies on).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ncagg_spark.pipeline.chunking import (
    chunk_documents,
    chunk_starts,
    sql_chunk_starts,
)
from ncagg_spark.pipeline.pii import (
    PII_PATTERNS,
    pii_counts,
    redact_pii,
    sql_pii_counts,
    sql_redact_pii,
)

SAMPLES = [
    "mail me at jane.doe+spam@sub.example.co.uk today",
    "server at 192.168.1.254 and 10.0.0.7 rebooted",
    "ssn 123-45-6789 on file",
    "card 4111 1111 1111 1111 or 4111-1111-1111-1111 or 4111111111111111",
    "call +1 (303) 555-0142 or 303-555-0142 or 303.555.0142",
    "no pii here, just v1.2.3 and build 20240115 and 1234567",
    "order #99123 456-7890 is not a phone",
    "mixed: a@b.io at 8.8.8.8 phone 212 555 0199 ssn 987-65-4321",
    "",
]


def test_redact_each_kind(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "i int, t string")
    out = {
        r["i"]: r["red"]
        for r in df.select("i", redact_pii("t").alias("red")).collect()
    }
    assert out[0] == "mail me at <EMAIL> today"
    assert out[1] == "server at <IP> and <IP> rebooted"
    assert out[2] == "ssn <SSN> on file"
    assert out[3] == "card <CC> or <CC> or <CC>"
    assert out[4] == "call <PHONE> or <PHONE> or <PHONE>"
    # version strings, date-like and short digit runs survive
    assert out[5] == "no pii here, just v1.2.3 and build 20240115 and 1234567"
    # the tail of a longer digit run is NOT a phone (no leading \b match)
    assert out[6] == "order #99123 456-7890 is not a phone"
    assert out[7] == "mixed: <EMAIL> at <IP> phone <PHONE> ssn <SSN>"
    assert out[8] == ""


def test_counts_match_redaction_kinds(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "t string")
    counts = pii_counts("t")
    agg = df.agg(
        *[F.sum(counts[k]).alias(k) for k in ("email", "ip", "ssn", "cc", "phone")]
    ).collect()[0]
    assert (agg["email"], agg["ip"], agg["ssn"], agg["cc"], agg["phone"]) == (
        2,
        3,
        2,
        3,
        4,
    )


def test_redact_sql_parity(spark):
    """Spark and the DuckDB twin produce identical redactions + counts."""
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "i bigint, t string")
    cnt = pii_counts("t")
    spark_rows = {
        r["i"]: (r["red"], *[r[k] for k in ("email", "ip", "ssn", "cc", "phone")])
        for r in df.select(
            "i",
            redact_pii("t").alias("red"),
            *[cnt[k].alias(k) for k in ("email", "ip", "ssn", "cc", "phone")],
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{s}')" for i, s in enumerate(SAMPLES))
        + ") AS v(i, t)"
    )
    n = sql_pii_counts("t")
    duck_rows = {
        row[0]: tuple(row[1:])
        for row in con.execute(
            f"SELECT i, {sql_redact_pii('t')}, {n['email']}, {n['ip']}, "
            f"{n['ssn']}, {n['cc']}, {n['phone']} FROM t"
        ).fetchall()
    }
    assert spark_rows == duck_rows


def _tok_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )


def test_chunk_window_rule(spark):
    # 10 tokens, size 8, overlap 4 -> step 4; last start = 4 (4+8 >= 10)
    text = " ".join(f"w{i}" for i in range(10))
    out = chunk_documents(
        _tok_df(spark, [text]), size=8, overlap=4
    ).collect()
    assert [(r["chunk_idx"], r["chunk_start"], r["chunk_tokens"]) for r in out] == [
        (0, 0, 8),
        (1, 4, 6),
    ]
    assert out[0]["chunk_text"].split() == [f"w{i}" for i in range(8)]
    assert out[1]["chunk_text"].split() == [f"w{i}" for i in range(4, 10)]


@pytest.mark.parametrize("n", [0, 1, 7, 8, 9, 64, 65])
def test_chunk_coverage_and_overlap(spark, n):
    size, overlap = 8, 3
    text = " ".join(f"w{i}" for i in range(n))
    rows = sorted(
        chunk_documents(_tok_df(spark, [text]), size=size, overlap=overlap).collect(),
        key=lambda r: r["chunk_start"],
    )
    # short docs: exactly one chunk
    if n <= size:
        assert len(rows) == 1 and rows[0]["chunk_tokens"] == n
        return
    # every token covered, consecutive chunks overlap by exactly `overlap`
    covered = set()
    for r in rows:
        covered.update(range(r["chunk_start"], r["chunk_start"] + r["chunk_tokens"]))
    assert covered == set(range(n))
    for a, b in zip(rows, rows[1:]):
        assert b["chunk_start"] - a["chunk_start"] == size - overlap
    # no chunk is a strict suffix of the previous one
    last = rows[-1]
    assert last["chunk_start"] + size >= n
    assert rows[-2]["chunk_start"] + size < n


def test_chunk_sql_parity(spark):
    texts = [
        " ".join(f"w{i}" for i in range(n)) for n in (0, 3, 8, 9, 20, 41)
    ]
    spark_rows = sorted(
        tuple(r)
        for r in chunk_documents(_tok_df(spark, texts), size=8, overlap=3)
        .select("doc_id", "chunk_start", "chunk_tokens", "chunk_text")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") AS v(doc_id, text)"
    )
    from ncagg_spark.pipeline.text import sql_tokenize

    toks = sql_tokenize("text")  # the REAL DuckDB twin the oracle uses
    duck_rows = sorted(
        con.execute(
            f"""
            WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
            s AS (SELECT doc_id, toks,
                         unnest({sql_chunk_starts('len(toks)', 8, 3)}) AS cs
                  FROM t)
            SELECT doc_id, cs,
                   coalesce(len(list_slice(toks, cs + 1, cs + 8)), 0),
                   coalesce(array_to_string(list_slice(toks, cs + 1, cs + 8), ' '), '')
            FROM s
            """
        ).fetchall()
    )
    assert spark_rows == duck_rows


def test_chunk_starts_validation(spark):
    # the spark fixture guarantees an active context for F.lit
    with pytest.raises(ValueError):
        chunk_starts(F.lit(10), 8, 8)
    with pytest.raises(ValueError):
        chunk_starts(F.lit(10), 8, -1)
