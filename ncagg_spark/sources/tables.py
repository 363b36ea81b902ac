"""Table loader that papers over parquet TIMESTAMP(NANOS).

The driver's testdata stores timestamps as nanosecond-precision INT64
(pyarrow timestamp[ns]) which Spark cannot read as a timestamp; with
``spark.sql.legacy.parquet.nanosAsLong=true`` they arrive as LongType
nanos. This loader inspects the parquet schema with pyarrow, then converts
those columns to TimestampType via integer microsecond truncation —
matching DuckDB's ns->us truncation exactly, which matters for oracle
hash parity.

Schema inspection reads only file metadata (no data IO) — cheap even for
100 TB tables (one footer read).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.dataset as pa_ds
import pyarrow.types as pat
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _nanos_timestamp_cols(path: str) -> list[str]:
    schema = pa_ds.dataset(path, format="parquet").schema
    return [
        f.name
        for f in schema
        if pat.is_timestamp(f.type) and f.type.unit == "ns"
    ]


def _uint64_cols(path: str) -> list[str]:
    """Columns that are genuinely parquet UINT_64 per the footer — the
    only ones unsigned normalization may touch (a decimal(20,0) Spark
    type alone could be real decimal data)."""
    schema = pa_ds.dataset(path, format="parquet").schema
    return [f.name for f in schema if f.type == pa.uint64()]


def convert_nanos_cols(df: DataFrame, names: set[str] | list[str]) -> DataFrame:
    """Convert nanos-as-long columns to TimestampType (microsecond
    truncation, DuckDB-compatible). Only columns Spark actually read as
    LongType are touched — pyarrow also reports INT96 timestamps as
    timestamp[ns], but Spark reads those as TimestampType already."""
    long_cols = {
        f.name for f in df.schema.fields if f.dataType.typeName() == "long"
    }
    for name in names:
        if name in long_cols:
            df = df.withColumn(
                name, F.timestamp_micros(F.expr(f"`{name}` div 1000"))
            )
    return df


def load_table(
    spark: SparkSession,
    path: str,
    *,
    time_bounds: tuple[str, int | None, int | None] | None = None,
) -> DataFrame:
    """Read a parquet table, converting nanos-timestamp columns to
    TimestampType (microsecond truncation, DuckDB-compatible).

    ``time_bounds=(col, lo_us, hi_us)`` applies the range predicate on the
    RAW nanos long BEFORE conversion, so it reaches the parquet scan as a
    pushed filter and row-group/file min-max stats prune — a filter on
    the converted (computed) column cannot push down. The rewrite is
    exact: floor(raw/1000) >= lo_us  <=>  raw >= lo_us*1000, and
    floor(raw/1000) < hi_us  <=>  raw < hi_us*1000, for non-negative
    bounds. At 100 TB this is the difference between scanning a day and
    scanning a year.
    """
    nanos = _nanos_timestamp_cols(path)
    if nanos:
        # Runtime SQL conf — must hold on *whatever* session the caller
        # hands us (a vanilla SparkSession can't scan TIMESTAMP(NANOS)
        # parquet at all). Setting it here, gated on the footer probe,
        # makes the loader session-agnostic.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if time_bounds is not None:
        col, lo_us, hi_us = time_bounds
        long_cols = {
            f.name for f in df.schema.fields if f.dataType.typeName() == "long"
        }
        c = F.col(col)
        if col in nanos and col in long_cols:
            if lo_us is not None:
                df = df.filter(c >= lo_us * 1000)
            if hi_us is not None:
                df = df.filter(c < hi_us * 1000)
        else:
            if lo_us is not None:
                df = df.filter(c >= F.timestamp_micros(F.lit(lo_us)))
            if hi_us is not None:
                df = df.filter(c < F.timestamp_micros(F.lit(hi_us)))
    return convert_nanos_cols(df, nanos)


def load_sf_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the driver's star-schema tables from an sf directory."""
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    return {n: load_table(spark, f"{sf_dir}/{n}.parquet") for n in names}
