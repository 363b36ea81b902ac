"""Regression pin for the round-3 failure class: driver testdata shipped
as parquet ``timestamp[us]`` with no timezone (Spark: TIMESTAMP_NTZ), and
every ``unix_micros`` call site broke at analysis time.

This test writes its own µs-no-tz parquet fixture and drives it through
every time-bucket operator, so a future testdata or Spark-default layout
shift fails ONE targeted test here instead of seven driver queries.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from ncagg_spark.functions.time import epoch_us, timestamp_to_cf
from ncagg_spark.operators.asof import asof_join
from ncagg_spark.operators.dedup import cadence_bucket, dedup_cadence
from ncagg_spark.operators.gapfill import gap_fill
from ncagg_spark.operators.sessionize import sessionize
from ncagg_spark.sources.tables import load_table

ORIGIN_US = 1_704_153_600_000_000  # 2024-01-02T00:00:00Z
STEP_US = 60_000_000


@pytest.fixture(scope="module")
def ntz_path(tmp_path_factory):
    """µs-precision, timezone-less timestamps — the round-3 layout."""
    path = str(tmp_path_factory.mktemp("ntz") / "events_ntz.parquet")
    us = [ORIGIN_US + i * STEP_US + (i % 3) * 1000 for i in range(10)]
    tbl = pa.table(
        {
            "ts": pa.array(us, type=pa.timestamp("us")),  # tz=None
            "rid": pa.array(range(10), type=pa.int64()),
            "key": pa.array([i % 2 for i in range(10)], type=pa.int64()),
        }
    )
    pq.write_table(tbl, path)
    return path


def test_load_table_casts_ntz_to_timestamp(spark, ntz_path):
    df = load_table(spark, ntz_path)
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    # values exact: epoch micros round-trip
    got = [r[0] for r in df.select(F.unix_micros("ts")).orderBy("rid").collect()]
    assert got == [ORIGIN_US + i * STEP_US + (i % 3) * 1000 for i in range(10)]


def test_load_table_ntz_bounds_pushdown(spark, ntz_path):
    lo = ORIGIN_US + 2 * STEP_US
    hi = ORIGIN_US + 7 * STEP_US
    df = load_table(spark, ntz_path, time_bounds=("ts", lo, hi))
    assert df.count() == 5
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(ts" in plan, "NTZ bounds must push to scan"
    assert "LessThan(ts" in plan


def test_epoch_us_accepts_raw_ntz(spark, ntz_path):
    # operators receiving a DataFrame the loader never touched (raw NTZ)
    raw = spark.read.parquet(ntz_path)
    assert raw.schema["ts"].dataType.typeName() == "timestamp_ntz"
    got = raw.select(epoch_us("ts").alias("us")).agg(F.min("us")).first()[0]
    assert got == ORIGIN_US


def test_bucket_ops_on_raw_ntz(spark, ntz_path):
    raw = spark.read.parquet(ntz_path)
    b = cadence_bucket(raw, "ts", ORIGIN_US, STEP_US)
    assert [r[0] for r in b.select("__bucket").orderBy("rid").collect()] == list(
        range(10)
    )
    d = dedup_cadence(b, "ts", tiebreak=["rid"])
    assert d.count() == 10
    g = gap_fill(
        spark,
        d,
        "ts",
        origin_us=ORIGIN_US,
        step_us=STEP_US,
        n_buckets=12,
        anchor="previous",
    )
    assert g.count() == 12
    assert g.filter(F.col("is_fill")).count() == 2


def test_sessionize_and_cf_on_raw_ntz(spark, ntz_path):
    raw = spark.read.parquet(ntz_path)
    s = sessionize(raw, "ts", "key", gap_us=STEP_US * 3, tiebreak=["rid"])
    assert s.agg(F.max("session_idx")).first()[0] >= 1
    cf = raw.select(
        timestamp_to_cf("ts", "seconds since 2024-01-02 00:00:00").alias("s")
    )
    assert cf.agg(F.min("s")).first()[0] == 0.0


def test_asof_join_on_raw_ntz(spark, ntz_path):
    raw = spark.read.parquet(ntz_path)
    left = raw.select("ts", "key", "rid")
    right = raw.select(
        F.col("ts").alias("rts"), "key", F.col("rid").alias("rrid")
    )
    j = asof_join(
        left,
        right,
        left_time="ts",
        right_time="rts",
        left_by="key",
        right_by="key",
        direction="backward",
    )
    assert j.count() == 10


def test_load_table_tz_aware_layout(spark, tmp_path):
    """Third physical layout: timestamp[us] WITH timezone (tz-aware
    parquet) — Spark reads TimestampType natively; bounds must still
    push down and values must match the NTZ layout exactly (UTC)."""
    path = str(tmp_path / "events_tz.parquet")
    us = [ORIGIN_US + i * STEP_US for i in range(10)]
    tbl = pa.table(
        {
            "ts": pa.array(us, type=pa.timestamp("us", tz="UTC")),
            "rid": pa.array(range(10), type=pa.int64()),
        }
    )
    pq.write_table(tbl, path)
    lo, hi = ORIGIN_US + 2 * STEP_US, ORIGIN_US + 7 * STEP_US
    df = load_table(spark, path, time_bounds=("ts", lo, hi))
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.count() == 5
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(ts" in plan
    got = [r[0] for r in df.select(F.unix_micros("ts")).orderBy("rid").collect()]
    assert got == us[2:7]


def test_footer_probe_cached_per_path(spark, ntz_path, monkeypatch):
    """load_table must hit the pyarrow footer once per path per process:
    the probed layout is cached so repeated loads (50 driver queries over
    the same handful of tables) pay zero extra driver metadata reads."""
    from ncagg_spark.sources import tables as tables_mod

    tables_mod.clear_schema_cache()
    calls = {"n": 0}
    real_dataset = tables_mod.pa_ds.dataset

    def counting_dataset(*a, **kw):
        calls["n"] += 1
        return real_dataset(*a, **kw)

    monkeypatch.setattr(tables_mod.pa_ds, "dataset", counting_dataset)
    try:
        load_table(spark, ntz_path)
        load_table(spark, ntz_path)
        # _uint64_cols shares the same cached schema
        assert tables_mod._uint64_cols(ntz_path) == []
        assert calls["n"] == 1
    finally:
        tables_mod.clear_schema_cache()
