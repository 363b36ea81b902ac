"""Multidim index handling (G7/G8): ordering by a representative element
of a 2-D index variable; synthesized fill arrays at the inner cadence.
Mirrors the reference's OB_time(report, samples) case
(test/generic/test_input_file_node.py:34-54).
"""

from __future__ import annotations

from datetime import timezone

from pyspark.sql import functions as F

from ncagg_spark.config import AggregationConfig
from ncagg_spark.operators.multidim import regularize_multidim

T0_US = 1_704_153_600_000_000
INNER = 10  # 10 samples per report at 10 Hz inside a 1 Hz report cadence


def _df(spark, report_ids):
    rows = []
    for r in report_ids:
        base = T0_US + r * 1_000_000
        rows.append((r, [base + j * 100_000 for j in range(INNER)]))
    df = spark.createDataFrame(rows, "report long, ob_us array<long>")
    return df.select(
        "report",
        F.transform("ob_us", lambda u: F.timestamp_micros(u)).alias("ob_time"),
    )


def test_multidim_regularize_orders_and_fills(spark):
    # reports 0,1,2 and 5,6 present; 3,4 missing
    df = _df(spark, [0, 1, 2, 5, 6])
    cfg = AggregationConfig(
        index_by="ts",
        cadence_hz=1.0,
        min_bound=T0_US / 1e6,
        max_bound=(T0_US + 7 * 1_000_000) / 1e6,
    )
    out = (
        regularize_multidim(
            spark,
            df,
            cfg,
            array_index_col="ob_time",
            inner_size=INNER,
            inner_hz=10.0,
        )
        .orderBy("ts")
        .collect()
    )
    assert len(out) == 7
    fills = [i for i, r in enumerate(out) if r["is_fill"]]
    assert fills == [3, 4]
    # real rows keep their original arrays
    assert out[0]["report"] == 0
    real_arr = out[1]["ob_time"]
    assert len(real_arr) == INNER
    us = [int(t.replace(tzinfo=timezone.utc).timestamp() * 1e6) for t in real_arr]
    assert us[0] == T0_US + 1_000_000 and us[1] - us[0] == 100_000
    # fill rows get synthesized arrays continuing the inner cadence
    fill_arr = out[3]["ob_time"]
    us = [int(t.replace(tzinfo=timezone.utc).timestamp() * 1e6) for t in fill_arr]
    assert us == [T0_US + 3 * 1_000_000 + j * 100_000 for j in range(INNER)]
    assert out[3]["report"] is None


def test_representative_element_nondefault(spark):
    # order by element 1 instead of 0 (other_dim_inds configurable)
    df = _df(spark, [0, 1])
    cfg = AggregationConfig(
        index_by="ts",
        cadence_hz=1.0,
        min_bound=(T0_US + 100_000) / 1e6,  # element 1 is offset +100ms
        max_bound=(T0_US + 2_100_000) / 1e6,
    )
    out = (
        regularize_multidim(
            spark,
            df,
            cfg,
            array_index_col="ob_time",
            inner_size=INNER,
            inner_hz=10.0,
            element=1,
        )
        .orderBy("ts")
        .collect()
    )
    assert [r["report"] for r in out] == [0, 1]
    assert all(not r["is_fill"] for r in out)
