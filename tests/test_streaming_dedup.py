"""stream_dedup_cadence: watermarked earliest-per-slot streaming dedup
(the pure-streaming layer, separate from the foreachBatch merge).
Driven through a rate-free memory-source-less path: file source + one
availableNow pass into a memory sink.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ncagg_spark.config import AggregationConfig
from ncagg_spark.streaming.regularize import stream_dedup_cadence, stream_granules

T0_US = 1_704_153_600_000_000

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.mark.slow
def test_stream_dedup_emits_earliest_per_slot(spark, tmp_path):
    inp = str(tmp_path / "in")
    # slot 0: two records (0.1s and 0.4s) -> earliest kept
    # slot 1: one record; slot 3: one record (slot 2 empty -> no row)
    rows = [
        (T0_US + 400_000, 9.0),
        (T0_US + 100_000, 1.0),
        (T0_US + 1_200_000, 2.0),
        (T0_US + 3_700_000, 3.0),
    ]
    spark.createDataFrame(rows, "us long, value double").select(
        F.timestamp_micros(F.col("us")).alias("ts"), "value"
    ).coalesce(1).write.parquet(inp)

    cfg = AggregationConfig(
        index_by="ts",
        cadence_hz=1.0,
        min_bound=T0_US / 1e6,
        max_bound=(T0_US + 10 * 1_000_000) / 1e6,
    )
    stream = stream_granules(spark, inp, SCHEMA)
    deduped = stream_dedup_cadence(stream, cfg)
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["__bucket"]: r["value"]
        for r in spark.sql("SELECT * FROM dedup_sink").collect()
    }
    assert got == {0: 1.0, 1: 2.0, 3: 3.0}
