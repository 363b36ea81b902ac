"""Sessionization — split a keyed event stream into sessions separated by
inactivity gaps.

The batch twin of Structured Streaming's session windows
(``F.session_window`` / ``applyInPandasWithState``): a new session starts
at the first event of a key and whenever the gap to the previous event
exceeds ``gap_us``. This generalizes the reference's gap detection
(ncagg/aggregator.py:164-195 flags inter-record gaps against a cadence
tolerance) from one global time series to millions of per-key series.

Scale notes: one shuffle, hash-partitioned by the session key; the window
functions (lag + running sum) then run per partition with no further
exchange — Catalyst plans both windows plus the session aggregation over
the SAME partitioning, so a billion-user event log costs exactly one
exchange. Skewed keys (one bot user with 10^9 events) are the failure
mode; cap per-key history upstream or pre-split with a salt + re-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ncagg_spark.functions.time import epoch_us

SESSION_COL = "session_idx"


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    *,
    gap_us: int,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Add a per-key ``session_idx`` column (1-based, in time order).

    A row starts a new session when it is the key's first event or when
    ``ts - lag(ts) > gap_us``. Ordering is (ts, *tiebreak) — pass a unique
    tiebreak column for determinism when timestamps can collide.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(key_col).orderBy(*order)
    gap = epoch_us(ts_col) - F.lag(epoch_us(ts_col)).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    return df.withColumn(
        SESSION_COL,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_summary(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    *,
    gap_us: int,
    tiebreak: list[str] | None = None,
    agg_cols: list | None = None,
) -> DataFrame:
    """One row per (key, session): start/end timestamps, event count, plus
    any extra aggregate expressions.
    """
    s = sessionize(df, ts_col, key_col, gap_us=gap_us, tiebreak=tiebreak)
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ] + list(agg_cols or [])
    return s.groupBy(key_col, SESSION_COL).agg(*aggs)
