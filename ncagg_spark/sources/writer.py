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


def write_aggregate(
    df: DataFrame,
    path: str,
    *,
    order_by: str | None = None,
    attributes: dict[str, Any] | None = None,
    max_records_per_file: int | None = None,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write the aggregate as sorted parquet; attributes land in
    ``<path>/_attributes.json`` (the reference's global attrs).
    """
    out = df
    if order_by:
        if num_files and num_files == 1:
            out = out.coalesce(1).sortWithinPartitions(order_by)
        else:
            n = num_files or max(df.sparkSession.sparkContext.defaultParallelism, 1)
            out = out.repartitionByRange(n, order_by).sortWithinPartitions(
                order_by
            )
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
    if attributes is not None:
        with open(os.path.join(path, "_attributes.json"), "w") as f:
            json.dump(attributes, f, indent=2, default=str)
