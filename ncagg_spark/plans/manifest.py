"""Input-file manifest: one row per granule, ordered, with per-file stats.

The reference plans over files by reading only each file's index variable
(ncagg/aggrelist.py:193-315). In Spark the equivalent metadata layer is a
tiny aggregation over ``input_file_name()`` — Parquet footer stats make it
a metadata-mostly scan; at 100 TB this is the job you run once and cache
(or maintain incrementally as granules land).

The manifest drives (a) file ordering for attribute strategies with
first/last semantics and (b) bounds-based file pruning diagnostics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FILE_COL = "input_file"
FILE_ORDER_COL = "file_order"


def build_manifest(
    df: DataFrame,
    index_col: str,
    *,
    file_col: str | None = None,
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """One row per input file: first/last index value, row count, plus the
    first value of each requested attribute column (file-level metadata
    modeled as ordinary columns constant within a file).

    ``file_col=None`` uses input_file_name() — the physical provenance;
    pass a column name to group by a logical granule id instead.
    """
    src = F.col(file_col) if file_col else F.input_file_name()
    aggs = [
        F.min(index_col).alias("index_min"),
        F.max(index_col).alias("index_max"),
        F.count(F.lit(1)).alias("row_count"),
    ]
    for c in attr_cols or []:
        aggs.append(F.first(c, ignorenulls=True).alias(c))
    m = df.groupBy(src.alias(FILE_COL)).agg(*aggs)
    # Reference file order: sorted by first index value, filename tiebreak
    # (ncagg/aggregator.py:95-97; :65 for the no-index fallback).
    w = F.row_number().over(
        Window.orderBy(F.col("index_min").asc_nulls_last(), F.col(FILE_COL).asc())
    )
    return m.withColumn(FILE_ORDER_COL, w)
