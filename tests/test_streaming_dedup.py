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


@pytest.mark.slow
def test_late_drop_is_deterministic_only_after_eviction(spark, tmp_path):
    """Spark's documented 'may or may not be dropped' zone, pinned: a
    late row whose window is STILL IN STATE merges into it; once a
    watermark advance has emitted+evicted the window, a late row for it
    is dropped. q_stream_late_drop's granule ordering (flush sentinel
    BEFORE the late granule) exists exactly because of this — if this
    test starts failing, that query's oracle premise changed."""
    import glob as _glob
    import os

    from ncagg_spark.streaming.regularize import stream_granules

    T0 = 1_704_153_600_000_000

    def build(order_late_after_flush: bool):
        d = tmp_path / ("after" if order_late_after_flush else "before")
        inp = d / "in"
        inp.mkdir(parents=True)

        def write(i, rows):
            df = spark.createDataFrame(
                rows, "us long, event_id long, value double"
            ).select(
                F.timestamp_micros("us").alias("ts"), "event_id", "value"
            )
            tmp = str(d / f"t{i}")
            df.coalesce(1).write.parquet(tmp)
            (pf,) = _glob.glob(tmp + "/part-*.parquet")
            dst = str(inp / f"g{i}.parquet")
            os.rename(pf, dst)
            os.utime(dst, (1_700_000_000 + i * 100,) * 2)

        g0 = [(T0 + 5_000_000, 9, 9.0), (T0 + 10_000_000_000, 1, 1.0)]
        late = [(T0 + 1_000_000, 2, 2.0)]  # same slot as the +5s row
        flush = [(T0 + 20_000_000_000, 3, 3.0)]
        end = [(T0 + 30_000_000_000, 4, 4.0)]
        parts = (
            [g0, flush, late, end]
            if order_late_after_flush
            else [g0, late, flush, end]
        )
        for i, rows in enumerate(parts):
            write(i, rows)

        cfg = AggregationConfig(
            index_by="ts",
            cadence_hz=1 / 60.0,
            min_bound=T0 / 1e6,
            max_bound=(T0 + 15_000_000_000) / 1e6,
            tiebreak=["event_id"],
        )
        stream = stream_granules(
            spark,
            str(inp),
            spark.read.parquet(str(inp)).schema,
            max_files_per_trigger=1,
        )
        out_df = stream_dedup_cadence(
            stream, cfg, watermark_delay="10 seconds"
        )
        out = str(d / "out")
        q = (
            out_df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(d / "ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return {
            r["__bucket"]: r["event_id"]
            for r in spark.read.parquet(out).collect()
        }

    # late granule BEFORE the flush: window still in state -> merges
    merged = build(order_late_after_flush=False)
    assert merged[0] == 2  # the late row won the slot
    # late granule AFTER the flush: window evicted -> dropped
    dropped = build(order_late_after_flush=True)
    assert dropped[0] == 9  # the on-time row holds the slot
