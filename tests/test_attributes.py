"""Attribute-strategy registry over the file manifest — mirrors the
reference's test_attribute_strategies.py (mock sequences, each strategy in
isolation) plus the finalize semantics (None/blank skipped, constant
disagreement raises).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ncagg_spark.plans.attributes import STRATEGIES, reduce_attributes
from ncagg_spark.plans.manifest import FILE_COL, FILE_ORDER_COL, build_manifest


@pytest.fixture()
def manifest(spark):
    rows = [
        # (file, order, title, mission, count_attr, fsum)
        ("b.parquet", 2, None, "GOES", 5, 1.5),
        ("a.parquet", 1, "first-title", "GOES", 7, 2.5),
        ("c.parquet", 3, "last-title", "GOES", 11, 3.0),
    ]
    return spark.createDataFrame(
        rows,
        f"{FILE_COL} string, {FILE_ORDER_COL} int, title string, "
        "mission string, count_attr int, fsum double",
    )


def test_first_skips_nulls_in_file_order(manifest):
    out = reduce_attributes(manifest, {"title": "first"})
    # file order 1 has 'first-title'; if order-1 were null we'd take order 2
    assert out["title"] == "first-title"


def test_first_nonnull_semantics(spark):
    rows = [("f1", 1, None), ("f2", 2, "from-second")]
    m = spark.createDataFrame(
        rows, f"{FILE_COL} string, {FILE_ORDER_COL} int, title string"
    )
    assert reduce_attributes(m, {"title": "first"})["title"] == "from-second"


def test_last(manifest):
    assert reduce_attributes(manifest, {"title": "last"})["title"] == "last-title"


def test_sums_and_count(manifest):
    out = reduce_attributes(
        manifest,
        {"count_attr": "int_sum", "fsum": "float_sum", "n": "input_count"},
    )
    assert out["count_attr"] == 23
    assert out["fsum"] == pytest.approx(7.0)
    assert out["n"] == 3


def test_unique_list_order_preserving_split(spark):
    rows = [("f1", 1, "alpha, beta"), ("f2", 2, "beta, gamma"), ("f3", 3, "alpha")]
    m = spark.createDataFrame(
        rows, f"{FILE_COL} string, {FILE_ORDER_COL} int, inst string"
    )
    out = reduce_attributes(m, {"inst": "unique_list"})
    assert out["inst"] == "alpha, beta, gamma"


def test_constant_agreement_and_disagreement(manifest):
    assert reduce_attributes(manifest, {"mission": "constant"})["mission"] == "GOES"
    bad = manifest.withColumn(
        "mission", F.when(F.col(FILE_ORDER_COL) == 2, "OTHER").otherwise("GOES")
    )
    with pytest.raises(AssertionError):
        reduce_attributes(bad, {"mission": "constant"})


def test_static_remove_filename_version(manifest):
    out = reduce_attributes(
        manifest,
        {
            "lit": "static",
            "gone": "remove",
            "fname": "filename",
            "ver": "ncagg_version",
        },
        ctx={"static_value": "v42", "output_path": "/out/day.parquet"},
    )
    assert out["lit"] == "v42"
    assert "gone" not in out
    assert out["fname"] == "day.parquet"
    assert out["ver"]


def test_first_last_input_by_file_order(manifest):
    out = reduce_attributes(
        manifest, {"fi": "first_input", "li": "last_input"}
    )
    assert out["fi"] == "a.parquet"
    assert out["li"] == "c.parquet"


def test_blank_values_skipped(spark):
    rows = [("f1", 1, "")]
    m = spark.createDataFrame(
        rows, f"{FILE_COL} string, {FILE_ORDER_COL} int, title string"
    )
    assert "title" not in reduce_attributes(m, {"title": "first"})


def test_unknown_strategy_raises(manifest):
    with pytest.raises(KeyError):
        reduce_attributes(manifest, {"x": "no_such_strategy"})


def test_registry_covers_reference_inventory():
    # A1-A16 in SURVEY.md §2.5
    expected = {
        "first", "last", "unique_list", "int_sum", "float_sum", "constant",
        "static", "date_created", "time_coverage_start", "time_coverage_end",
        "filename", "remove", "first_input", "last_input", "input_count",
        "ncagg_version",
    }
    assert expected <= set(STRATEGIES)


def test_build_manifest_orders_by_index_start(spark):
    rows = [
        (200.0, "late.parquet"),
        (100.0, "early.parquet"),
        (150.0, "mid.parquet"),
    ]
    df = spark.createDataFrame(rows, "ts double, src string")
    m = build_manifest(df, "ts", file_col="src").orderBy(FILE_ORDER_COL).collect()
    assert [r[FILE_COL] for r in m] == [
        "early.parquet", "mid.parquet", "late.parquet"
    ]
    assert [r["row_count"] for r in m] == [1, 1, 1]
