"""Regression: the engine must work on a SparkSession it did not build.

Round-1 driver failure mode: the correctness harness passes its own
vanilla SparkSession (no ``spark.sql.legacy.parquet.nanosAsLong``), and
every query touching the nanos-timestamp ``events`` parquet died at scan
time with PARQUET_TYPE_ILLEGAL. Round-3 repeat: testdata regenerated as
``timestamp[us]`` no-tz, which Spark reads as TIMESTAMP_NTZ — a different
physical layout, same class of failure (analysis-time type break on a
session the engine did not build).

The contract under test: ``load_table``/``read_granules`` normalize every
timestamp column to plain TimestampType on ANY session and ANY of the
layouts the driver has shipped, setting whatever runtime confs the footer
probe says the layout needs.
"""

from __future__ import annotations

import pytest

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"
SF_DIR = "/root/testdata/sf0.001"


def _events_has_nanos() -> bool:
    from ncagg_spark.sources.tables import _timestamp_layout

    return bool(_timestamp_layout(f"{SF_DIR}/events.parquet")[0])


@pytest.fixture()
def vanilla_conf(spark):
    """Strip the engine's nanos conf so the session looks driver-vanilla."""
    spark.conf.unset(NANOS_CONF)
    yield spark
    spark.conf.set(NANOS_CONF, "true")


def test_load_table_normalizes_timestamps(vanilla_conf):
    from ncagg_spark.sources.tables import load_table

    spark = vanilla_conf
    df = load_table(spark, f"{SF_DIR}/events.parquet")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.limit(5).count() >= 0
    if _events_has_nanos():
        # legacy layout only: the loader must have set the conf itself
        assert spark.conf.get(NANOS_CONF) == "true"


def test_read_granules_normalizes_timestamps(vanilla_conf):
    from ncagg_spark.sources.granules import read_granules

    spark = vanilla_conf
    df = read_granules(spark, f"{SF_DIR}/events.parquet")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.limit(5).count() >= 0


@pytest.mark.parametrize(
    "qname", ["agg_regularize_day", "evt_sessionize", "rel_window_topk"]
)
def test_driver_queries_on_vanilla_session(vanilla_conf, qname):
    import __spark_entry__ as entrymod

    spark = vanilla_conf
    q = entrymod.queries()[qname]
    df = q(spark, SF_DIR)
    assert df.limit(1).count() >= 0


def test_entry_on_vanilla_session(vanilla_conf):
    import __spark_entry__ as entrymod

    df = entrymod.entry(vanilla_conf)
    assert df.limit(1).count() >= 0
