"""Multi-grain flatten operators — reference multi-unlim-dim semantics
(test/generic/test_multi_unlim_dims.py, test_flatten_index_by.py — the
latter @expectedFailure in the reference, implemented here).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ncagg_spark.operators.flatten import (
    block_diagonal_union,
    flatten_by_index,
    flatten_overlay,
)


def test_block_diagonal_union_null_padding(spark):
    a = spark.createDataFrame([(1, 10.0)], "k long, a double")
    b = spark.createDataFrame([(2, 20.0)], "k long, b double")
    out = block_diagonal_union([a, b]).orderBy("k").collect()
    assert [r["a"] for r in out] == [10.0, None]
    assert [r["b"] for r in out] == [None, 20.0]


def test_flatten_overlay_first_file_wins(spark):
    f1 = spark.createDataFrame([(1.0, 10.0), (2.0, 20.0)], "t double, v double")
    f2 = spark.createDataFrame(
        [(100.0, 99.0), (200.0, 88.0), (300.0, 77.0)], "t double, v double"
    )
    out = (
        flatten_overlay([f1, f2], order_by="t").orderBy("pos").collect()
    )
    assert len(out) == 3  # longest input defines the dim size
    # positions 0,1: first file wins; position 2 only in second file
    assert [r["v"] for r in out] == [10.0, 20.0, 77.0]
    assert [r["t"] for r in out] == [1.0, 2.0, 300.0]


def test_flatten_overlay_fills_holes_from_later_files(spark):
    f1 = spark.createDataFrame([(1.0, None), (2.0, 20.0)], "t double, v double")
    f2 = spark.createDataFrame([(1.5, 11.0), (2.5, 22.0)], "t double, v double")
    out = flatten_overlay([f1, f2], order_by="t").orderBy("pos").collect()
    # position 0: f1's v is null -> f2's 11.0 shows through
    assert [r["v"] for r in out] == [11.0, 20.0]


def test_flatten_by_index_outer_join_on_label(spark):
    # the reference's unimplemented case: label arrays differ across files
    f1 = spark.createDataFrame(
        [("alpha", 1.0), ("beta", 2.0)], "label string, x double"
    )
    f2 = spark.createDataFrame(
        [("beta", 20.0), ("gamma", 30.0)], "label string, y double"
    )
    out = {r["label"]: r for r in flatten_by_index([f1, f2], "label").collect()}
    assert set(out) == {"alpha", "beta", "gamma"}
    assert out["alpha"]["x"] == 1.0 and out["alpha"]["y"] is None
    assert out["beta"]["x"] == 2.0 and out["beta"]["y"] == 20.0
    assert out["gamma"]["x"] is None and out["gamma"]["y"] == 30.0


def test_flatten_by_index_coalesces_shared_columns(spark):
    f1 = spark.createDataFrame([("a", 1.0)], "label string, v double")
    f2 = spark.createDataFrame([("a", 99.0), ("b", 2.0)], "label string, v double")
    out = {r["label"]: r["v"] for r in flatten_by_index([f1, f2], "label").collect()}
    assert out == {"a": 1.0, "b": 2.0}  # first input wins on overlap


def test_global_position_dense_and_partition_parallel(spark):
    from ncagg_spark.operators.flatten import global_position

    # shuffled multi-partition input: positions must be the dense rank of
    # the key with no single-task global sort
    df = (
        spark.range(0, 5000, 1, 8)
        .select((F.col("id") * 2654435761 % 5000).alias("k"))
        .distinct()
        .repartition(8)
    )
    got = global_position(df, "k").orderBy("k").collect()
    assert [r["pos"] for r in got] == list(range(len(got)))
    ks = [r["k"] for r in got]
    assert ks == sorted(ks)
