"""Regression: the engine must work on a SparkSession it did not build.

Round-1 driver failure mode: the correctness harness passes its own
vanilla SparkSession (no ``spark.sql.legacy.parquet.nanosAsLong``), and
every query touching the nanos-timestamp ``events`` parquet died at scan
time with PARQUET_TYPE_ILLEGAL. ``nanosAsLong`` is a *runtime* SQL conf,
so unsetting it on the shared test session reproduces the driver's
vanilla session exactly; ``load_table``/``read_granules`` must re-set it
defensively before the read.
"""

from __future__ import annotations

import pytest

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def vanilla_conf(spark):
    """Strip the engine's nanos conf so the session looks driver-vanilla."""
    spark.conf.unset(NANOS_CONF)
    yield spark
    spark.conf.set(NANOS_CONF, "true")


def test_load_table_sets_nanos_conf(vanilla_conf):
    from ncagg_spark.sources.tables import load_table

    spark = vanilla_conf
    df = load_table(spark, f"{SF_DIR}/events.parquet")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.limit(5).count() >= 0
    assert spark.conf.get(NANOS_CONF) == "true"


def test_read_granules_sets_nanos_conf(vanilla_conf):
    from ncagg_spark.sources.granules import read_granules

    spark = vanilla_conf
    df = read_granules(spark, f"{SF_DIR}/events.parquet")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.limit(5).count() >= 0


@pytest.mark.parametrize(
    "qname", ["agg_regularize_day", "evt_sessionize", "rel_window_agg"]
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
