"""Bounded two-phase top-k (pipeline/topk.py, VERDICT r11 #3): exact
equality with the single global window it replaces, and plan pins that
the corpus-sized ranking never runs in one task."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ncagg_spark.pipeline.topk import bounded_topk

SF_DIR = "/root/testdata/sf0.001"


def _scored(spark, n=1000):
    # score = id % 37 -> heavy ties, the tie-break path is exercised
    return spark.range(n).select(
        F.concat(F.lit("d"), F.format_string("%05d", "id")).alias(
            "doc_id"
        ),
        (F.col("id") % 37).alias("score"),
    )


def test_equals_single_global_window(spark):
    df = _scored(spark)
    order = [F.col("score").desc(), F.col("doc_id").asc()]
    got = sorted(
        map(
            tuple,
            bounded_topk(df, order, 40, id_col="doc_id").collect(),
        )
    )
    w = Window.orderBy(*order)
    want = sorted(
        map(
            tuple,
            df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 40)
            .collect(),
        )
    )
    assert got == want and len(got) == 40


def test_k_larger_than_input(spark):
    df = _scored(spark, n=7)
    order = [F.col("score").desc(), F.col("doc_id").asc()]
    out = bounded_topk(df, order, 100, id_col="doc_id").collect()
    assert len(out) == 7
    assert sorted(r["rank"] for r in out) == list(range(1, 8))


def _plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_bounded_windows(plan: str):
    """The scale pin (pack_sequences discipline): the full scored set
    is ranked inside a __tkb-partitioned window — with Spark's
    WindowGroupLimit pushdown pruning to k per task BEFORE the shuffle
    — and the only unpartitioned window ranks the <= k x n_buckets
    survivors behind the __tklr filter."""
    assert "WindowGroupLimit [__tkb" in plan, "map-side top-k pruning missing"
    specs = [
        ln
        for ln in plan.splitlines()
        if "windowspecdefinition(" in ln
    ]
    global_specs = [ln for ln in specs if "__tkb" not in ln]
    bucketed_specs = [ln for ln in specs if "__tkb" in ln]
    assert bucketed_specs, "corpus-sized window is not bucket-partitioned"
    # every unpartitioned window must be the survivors ranking
    assert global_specs and all("rank" in ln for ln in global_specs)
    # survivors are filtered to k per bucket before the global sort
    assert "__tklr" in plan


def test_bm25_topk_plan_is_bounded(spark):
    # r16: bm25_topk executes eagerly (single-tokenize-pass persist +
    # checkpointed <= k-row result), so the returned frame is a local
    # scan — the real pipeline plan is captured via plan_probe, the
    # audit hook for eager-collapsing operators
    from __spark_entry__ import q_doc_bm25_topk
    from ncagg_spark import plan_probe

    with plan_probe.capture() as jobs:
        q_doc_bm25_topk(spark, SF_DIR)
    plans = {label: df for label, df in jobs}
    assert "bm25-topk" in plans
    plan = _plan(plans["bm25-topk"])
    _assert_bounded_windows(plan)


def test_dsir_sample_plan_is_bounded(spark):
    from __spark_entry__ import q_doc_dsir_sample

    plan = _plan(q_doc_dsir_sample(spark, SF_DIR))
    _assert_bounded_windows(plan)
