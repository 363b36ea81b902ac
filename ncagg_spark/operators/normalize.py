"""Inbound normalization: fill-value sentinels -> null, invalid index rows
dropped.

Reference behavior being re-expressed (not ported):
  * sentinel -> masked on read: ncagg/aggrelist.py:568-582
  * records with index value <= 0 or NaN cut out (instrument wrote
    epoch-zero timestamps): ncagg/aggrelist.py:253-283, P8 in SURVEY.md
  * a file that is all-fill simply contributes zero rows (P9) — falls out
    of the row filter, no special case needed.

Everything is a plain Catalyst expression, so these filters push down to
the Parquet scan (check .explain() for PushedFilters).
"""

from __future__ import annotations

import math
from typing import Any, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize_fills(df: DataFrame, fill_values: Mapping[str, Any]) -> DataFrame:
    """Replace per-column sentinel values with null.

    NaN in floating columns is also treated as a fill (the reference masks
    NaN on write, ncagg/aggregator.py:328-335 — we normalize it inbound so
    every downstream operator sees null as the single missing marker).
    """
    if not fill_values:
        return df
    exprs: list[Column] = []
    schema = {f.name: f.dataType for f in df.schema.fields}
    for name in df.columns:
        c = F.col(name)
        if name in fill_values:
            fv = fill_values[name]
            cond = c == F.lit(fv)
            if isinstance(fv, float) and math.isnan(fv):
                cond = F.isnan(c)
            elif isinstance(schema.get(name), (T.FloatType, T.DoubleType)):
                cond = cond | F.isnan(c)
            exprs.append(F.when(cond, F.lit(None)).otherwise(c).alias(name))
        else:
            exprs.append(c)
    return df.select(*exprs)


def drop_invalid_index(
    df: DataFrame, index_col: str, *, min_valid_epoch: float = 0.0
) -> DataFrame:
    """Drop rows whose index (event-time) value is null, NaN, or at/before
    the epoch floor — junk timestamps the instrument emitted.
    """
    c = F.col(index_col)
    dtype = dict((f.name, f.dataType) for f in df.schema.fields)[index_col]
    cond = c.isNotNull()
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        cond = cond & ~F.isnan(c) & (c > F.lit(min_valid_epoch))
    elif isinstance(
        dtype, (T.TimestampType, T.TimestampNTZType)
    ):
        # NTZ cannot cast straight to double; via timestamp it is a
        # no-op for TimestampType and value-exact under the UTC session
        cond = cond & (
            c.cast("timestamp").cast("double") > F.lit(min_valid_epoch)
        )
    elif isinstance(
        dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        # integer epoch index: value 0 is the same junk epoch floor
        cond = cond & (c > F.lit(int(min_valid_epoch)))
    return df.filter(cond)
