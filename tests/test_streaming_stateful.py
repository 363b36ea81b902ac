"""applyInPandasWithState gap detector: state persists across
micro-batches — a gap spanning two batches is still detected.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ncagg_spark.streaming.regularize import stream_granules
from ncagg_spark.streaming.stateful import detect_gaps

T0_US = 1_704_153_600_000_000

SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, "event_type string, us long").select(
        "event_type", F.timestamp_micros(F.col("us")).alias("ts")
    ).coalesce(1).write.mode("append").parquet(path)


@pytest.mark.slow
def test_gap_detector_state_spans_batches(spark, tmp_path):
    inp = str(tmp_path / "in")
    # batch 1 file: key A seconds 0..3, then nothing
    _write(spark, inp, [("A", T0_US + i * 1_000_000) for i in range(4)])
    # batch 2 file: key A resumes at second 10 (gap of 6 slots),
    # key B appears fresh (no gap — no previous state)
    _write(
        spark,
        inp,
        [("A", T0_US + 10 * 1_000_000), ("B", T0_US + 11 * 1_000_000)],
    )

    stream = stream_granules(spark, inp, SCHEMA, max_files_per_trigger=1)
    gaps = detect_gaps(stream, key_col="event_type", step_us=1_000_000, dt_max_s=1.2)
    q = (
        gaps.writeStream.format("memory")
        .queryName("gap_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.sql("SELECT * FROM gap_sink").collect()
    assert len(got) == 1
    g = got[0]
    assert g["key"] == "A"
    assert g["missing_slots"] == 6
    assert (g["gap_end"] - g["gap_start"]).total_seconds() == 7.0
