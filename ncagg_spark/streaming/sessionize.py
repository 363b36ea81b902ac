"""Streaming sessionization — Structured Streaming's NATIVE session
windows (`F.session_window` + watermark), the online twin of the batch
`operators/sessionize.py` lag-window operator.

Semantics parity (probed, not assumed): `session_window` MERGES an
event arriving exactly `gap` after the previous one (window is
[start, last + gap) and the probe at diff == gap merged), which equals
the batch rule "new session when diff > gap". Session assignment
depends only on the per-key timestamp multiset, so ties need no
tiebreak column.

Scale shape: the aggregation state is one row per OPEN session per key
(Spark merges sessions in the state store as events arrive, emits a
session in append mode once the watermark passes session end + gap);
RocksDB provider applies unchanged (session conf — see
tools/stream_state_scale.py). No UDF, no Python state function — this
is the built-in operator doing exactly what SURVEY §7.4's custom
stateful path does for gaps, so the custom machinery is reserved for
what Spark genuinely lacks (absence detection / fill synthesis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    stream: DataFrame,
    *,
    key_col: str,
    ts_col: str = "ts",
    gap_s: float,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """(key, session_start, session_end, n_events) per CLOSED session.

    ``session_start``/``session_end`` are the min/max event timestamps
    (not the window's half-open end — exact parity with the batch
    `session_summary` and its SQL oracle). Append-mode emission: a
    session row is final once the event-time watermark passes its last
    event + gap; sessions still open when the stream's watermark stops
    advancing stay in state (bounded runs: push a far-future sentinel
    key, the stream_gap_fill_ooo pattern).
    """
    gap_expr = f"{float(gap_s)} seconds"
    return (
        stream.selectExpr(f"{key_col} AS key", f"{ts_col} AS ts")
        .withWatermark("ts", watermark_delay)
        .groupBy(F.col("key"), F.session_window("ts", gap_expr))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("key", "session_start", "session_end", "n_events")
    )
