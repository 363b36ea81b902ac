"""Granule source: read N parquet granule files as one DataFrame with
provenance.

Reference equivalent: InputFileNode construction + union
(ncagg/aggrelist.py:192-215; file list handling ncagg/cli.py:123-149).
The reference opens files lazily and reads only needed variables; Spark's
parquet source gives both (column pruning, predicate pushdown, footer-stat
file skipping) for free — confirm with .explain("formatted"):
PushedFilters + ReadSchema.

Missing-column tolerance (P4): mergeSchema=true unions schemas across
granules; columns absent in a file read as null — exactly the reference's
fill-for-missing-variable semantics (ncagg/aggregator.py:337-340).

Scale notes: at 100 TB, granules should be laid out under
date-partitioned directories (dt=YYYY-MM-DD/) so bounds predicates become
partition pruning; this reader passes paths/globs straight to the Hadoop
FS layer, which handles that.
"""

from __future__ import annotations

import glob

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ncagg_spark.functions.unsigned import normalize_unsigned
from ncagg_spark.sources.tables import (
    _timestamp_layout,
    _uint64_cols,
    convert_nanos_cols,
    normalize_ntz_cols,
)

GRANULE_COL = "granule"


def read_granules(
    spark: SparkSession,
    paths: str | Sequence[str],
    *,
    merge_schema: bool = True,
    with_provenance: bool = True,
    columns: Sequence[str] | None = None,
) -> DataFrame:
    """Read one-or-many granule parquet paths (files, dirs, or globs)."""
    if isinstance(paths, str):
        paths = [paths]
    # nanos-timestamp columns (TIMESTAMP(NANOS) parquet) arrive as LongType
    # under legacy.parquet.nanosAsLong; probe footers BEFORE the read so the
    # conf can be set on whatever session the caller supplies (a vanilla
    # SparkSession cannot scan TIMESTAMP(NANOS) parquet at all).
    nanos: set[str] = set()
    u64: set[str] = set()
    for p in paths:
        # pyarrow does not expand globs (Spark does) — resolving here
        # keeps the probe effective for 'dir/*.parquet' sources instead
        # of silently skipping the nanos/uint64 normalization. Up to 8
        # evenly-spaced members probed per source spec (footers cached).
        if any(ch in p for ch in "*?["):
            matches = sorted(glob.glob(p))
            step = max(1, len(matches) // 8)
            members = matches[::step] or [p]
        else:
            members = [p]
        for m in members:
            try:
                nanos.update(_timestamp_layout(m)[0])
                u64.update(_uint64_cols(m))
            except (OSError, ValueError):
                pass
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.option("mergeSchema", str(merge_schema).lower()).parquet(
        *paths
    )
    if columns:
        df = df.select(*columns)
    df = normalize_ntz_cols(convert_nanos_cols(df, nanos))
    # parquet UINT_64 flag columns arrive as decimal(20,0): normalize to
    # LongType bit-pattern so flag predicates stay on primitive longs —
    # ONLY columns the footer probe proved unsigned (a real decimal(20,0)
    # column passes through untouched; see functions/unsigned.py)
    df = normalize_unsigned(df, columns=u64)
    if with_provenance:
        df = df.withColumn(GRANULE_COL, F.input_file_name())
    return df
