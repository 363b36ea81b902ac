"""Span-level duplicate detection (pipeline/spans.py): maximal shared
substring recovery, boilerplate capping, and DuckDB parity.
"""

from __future__ import annotations

import duckdb
import pytest

from ncagg_spark.pipeline.spans import (
    duplicate_span_pairs,
    duplicate_spans,
    sql_duplicate_spans,
)

PASSAGE = "the quick brown fox jumps over the lazy dog again and again"


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_maximal_span_recovered(spark):
    # doc0 and doc1 share the 12-token PASSAGE at different offsets
    texts = [
        "alpha beta " + PASSAGE + " gamma",
        "one two three four " + PASSAGE,
        "completely different words entirely here now",
    ]
    out = duplicate_spans(_docs(spark, texts), k=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (0, 1)
    assert r["a_start"] == 2 and r["b_start"] == 4
    assert r["length"] == 12  # the full shared passage, merged maximally


def test_disjoint_spans_stay_separate(spark):
    shared1 = "red orange yellow green blue indigo violet ultraviolet"
    shared2 = "north south east west up down left right"
    texts = [
        shared1 + " xxx " + shared2,
        shared1 + " yyy zzz " + shared2,
    ]
    out = duplicate_spans(_docs(spark, texts), k=8).collect()
    assert len(out) == 2
    assert sorted(r["length"] for r in out) == [8, 8]


def test_no_false_pairs_below_k(spark):
    texts = [
        "a b c d e f g h",
        "a b c d x y z w",  # only 4 shared leading tokens < k=8
    ]
    assert duplicate_spans(_docs(spark, texts), k=8).count() == 0


def test_boilerplate_cap_drops_ubiquitous_hash(spark):
    texts = [PASSAGE] * 5  # every doc identical
    pairs = duplicate_span_pairs(
        _docs(spark, texts), k=8, max_occurrences_per_hash=3
    )
    assert pairs.count() == 0  # hash occurs 5 > 3 times: capped out
    pairs2 = duplicate_span_pairs(
        _docs(spark, texts), k=8, max_occurrences_per_hash=10
    )
    assert pairs2.count() > 0


def test_duckdb_parity(spark):
    texts = [
        "alpha beta " + PASSAGE + " gamma",
        "one two three four " + PASSAGE,
        PASSAGE + " trailing content words here",
        "completely unrelated text with different tokens",
    ]
    spark_rows = sorted(
        (r["id_a"], r["id_b"], r["a_start"], r["b_start"], r["length"])
        for r in duplicate_spans(_docs(spark, texts), k=8).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") AS v(doc_id, text)"
    )
    duck_rows = sorted(
        tuple(int(x) for x in row)
        for row in con.execute(sql_duplicate_spans(8)).fetchall()
    )
    assert spark_rows == duck_rows
    assert len(spark_rows) == 3  # all three passage-sharing pairs
