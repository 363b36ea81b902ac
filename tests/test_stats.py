"""Exact distributed quantiles (pipeline/stats.py): value equality with
a sorted-list reference at the DuckDB quantile_disc rank convention,
and the scale pin — no corpus-sized sort or single-partition exchange
in the plan."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from ncagg_spark.pipeline.stats import exact_quantiles


def _ref(values, q):
    s = sorted(values)
    return s[max(1, math.ceil(q * len(s))) - 1]


QS = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]


def test_matches_sorted_reference(spark):
    rng = random.Random(7)
    vals = [rng.randint(-1_000_000, 1_000_000) for _ in range(5000)]
    vals += [vals[0]] * 50  # heavy ties
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {
        r["q"]: r["value"]
        for r in exact_quantiles(df, "x", QS, n_bins=64).collect()
    }
    assert got == {q: _ref(vals, q) for q in QS}


def test_tiny_and_skewed(spark):
    vals = [5, 5, 5, 5, 7]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {
        r["q"]: r["value"]
        for r in exact_quantiles(df, "x", [0.5, 0.8, 0.81]).collect()
    }
    assert got == {0.5: 5, 0.8: 5, 0.81: 7}


def test_nulls_and_empty(spark):
    df = spark.createDataFrame([(None,), (3,)], "x long")
    assert exact_quantiles(df, "x", [0.5]).collect()[0]["value"] == 3
    empty = spark.createDataFrame([], "x long")
    assert exact_quantiles(empty, "x", [0.5]).count() == 0


def test_extreme_magnitudes_exact(spark):
    vals = [-(2**62), -1, 0, 1, 2**62, 2**62 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {
        r["q"]: r["value"]
        for r in exact_quantiles(df, "x", QS, n_bins=4).collect()
    }
    assert got == {q: _ref(vals, q) for q in QS}


def test_rejects_bad_inputs(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", [])
    with pytest.raises(ValueError):
        exact_quantiles(df, "x", [1.5])


def test_no_global_sort_in_any_pass(spark):
    """The scale claim: the per-pass jobs are scan -> histogram agg;
    nothing ever plans a global Sort or a SinglePartition exchange over
    the data (only the tiny final-agg exchanges)."""
    df = spark.range(100_000).select(
        (F.col("id") % 9973).alias("x")
    )
    plan = df.select(
        F.explode(
            F.array(
                F.when(
                    F.col("x").between(F.lit(0), F.lit(9972)),
                    F.struct(F.lit(0).alias("qi"), F.expr("x div 10L").alias("bin")),
                )
            )
        ).alias("p")
    ).filter(F.col("p").isNotNull()).groupBy("p.qi", "p.bin").count()
    s = plan._jdf.queryExecution().executedPlan().toString()
    # a physical Sort node prints "Sort [col ASC ...]"; none may appear,
    # and no exchange may collapse the data to one partition
    assert "Sort [" not in s, s
    assert "Exchange SinglePartition" not in s, s
