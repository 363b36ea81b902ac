"""Aggregate sink: time-sorted parquet + global-attributes JSON sidecar.

Reference equivalent: initialize_aggregation_file + the ordered append
loop + attribute finalize (ncagg/aggregator.py:239-417). The reference's
"running offset per unlimited dim" is simply row order here; its zlib-7
compression maps to zstd parquet; its chunksize control maps to
maxRecordsPerFile.

The write is range-partitioned by the index column (repartitionByRange)
so output files are non-overlapping time slices in sorted order — the
layout you want at 100 TB (each file's footer min/max enables downstream
file skipping), with sortWithinPartitions giving intra-file order.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame


DATE_PARTITION_COL = "dt"


def write_aggregate(
    df: DataFrame,
    path: str,
    *,
    order_by: str | None = None,
    attributes: dict[str, Any] | None = None,
    max_records_per_file: int | None = None,
    num_files: int | None = None,
    mode: str = "overwrite",
    partition_by_date: bool = False,
) -> None:
    """Write the aggregate as sorted parquet; attributes land in
    ``<path>/_attributes.json`` (the reference's global attrs).

    ``partition_by_date=True`` lays the output out under
    ``dt=YYYY-MM-DD/`` directories derived from ``order_by`` — the 100 TB
    layout: time-range predicates become partition pruning (directories
    skipped at planning time), and each day's files are internally
    range-sorted so footer min/max prunes within the day.
    """
    from pyspark.sql import functions as F

    out = df
    if partition_by_date:
        if not order_by:
            raise ValueError("partition_by_date requires order_by")
        out = out.withColumn(
            DATE_PARTITION_COL, F.to_date(F.col(order_by)).cast("string")
        )
    if order_by:
        if num_files and num_files == 1:
            out = out.coalesce(1).sortWithinPartitions(order_by)
        else:
            n = num_files or max(df.sparkSession.sparkContext.defaultParallelism, 1)
            keys = (
                [DATE_PARTITION_COL, order_by] if partition_by_date else [order_by]
            )
            out = out.repartitionByRange(n, *keys).sortWithinPartitions(*keys)
    writer = out.write.mode(mode)
    if partition_by_date:
        writer = writer.partitionBy(DATE_PARTITION_COL)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
    if attributes is not None:
        with open(os.path.join(path, "_attributes.json"), "w") as f:
            json.dump(attributes, f, indent=2, default=str)
