"""Output-range bounds on the index column.

The reference applies bounds in three places — whole-file skip
(ncagg/aggregator.py:137-142), record-level start chop (:149-162) and end
chop (:204-212) — because it streams file-by-file. In Spark a single
``filter(lo <= ts < hi)`` expresses all three: Parquet min/max footer stats
prune whole files (P5) and the row predicate handles the chops (P6/P7)
with exact comparison instead of the reference's float-slack heuristics.

Interval convention: ``[min, max)`` half-open, matching the reference's
day-file semantics (a record exactly on the max bound belongs to the next
day — CHANGELOG v0.7.0 boundary-case discussion).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def apply_bounds(
    df: DataFrame,
    index_col: str,
    lo: Column | None = None,
    hi: Column | None = None,
    *,
    closed_end: bool = False,
) -> DataFrame:
    """Keep rows with lo <= index < hi (or <= hi when closed_end)."""
    c = F.col(index_col)
    if lo is not None:
        df = df.filter(c >= lo)
    if hi is not None:
        df = df.filter(c <= hi if closed_end else c < hi)
    return df
