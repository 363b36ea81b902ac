"""As-of (most-recent-match) join — an operator Spark lacks natively.

For each left row, attach the right row with the greatest (direction=
"backward") or smallest (direction="forward") time at-or-before /
at-or-after the left row's time, within the same `by` key group.

The reference has no joins at all (SURVEY.md §2.4 — its closest analogue
is grid alignment, ncagg/aggregator.py:119-234), but as-of enrichment is
the canonical time-series join every events pipeline needs, so the
engine exposes it as a first-class operator.

Scale design — sort-merge as-of via union, ONE shuffle:

    union(left, right) -> hash-partition by `by` -> sort within
    partitions by (time, side) -> running `last(right_payload,
    ignorenulls=True)` window -> keep left rows.

This is the plan a dedicated as-of physical operator would produce: the
only shuffle is the hash exchange on the `by` key (both sides share it),
the window is a single pass over each sorted partition, and nothing is
collected to the driver. Skewed `by` keys are handled by AQE; there is
no O(|left| x |right|) range-join blowup because matching is positional
in the sorted stream, not predicated.

Determinism: right rows sort before left rows at equal times (so an
exact-tie matches under "backward"), and equal right timestamps within a
key are ordered by `right_tiebreak` — the LAST row in that order wins.
Pass a unique tiebreak (e.g. the right table's primary key) whenever
(by, time) is not unique on the right, or pre-aggregate the right side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_time: str,
    right_time: str,
    left_by: str | list[str],
    right_by: str | list[str],
    direction: str = "backward",
    tolerance: Column | None = None,
    right_tiebreak: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right row's
    columns (renamed ``<col><suffix>`` on collision, time column always
    ``<right_time><suffix>``); null right columns when no match.

    tolerance: optional Column interval/duration — a match further than
    this from the left time is discarded (both directions).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left_by = [left_by] if isinstance(left_by, str) else list(left_by)
    right_by = [right_by] if isinstance(right_by, str) else list(right_by)
    if len(left_by) != len(right_by):
        raise ValueError("left_by and right_by must have equal length")

    by = [f"__by_{i}" for i in range(len(left_by))]
    payload_cols = [c for c in right.columns if c not in right_by]
    out_names = {
        c: (c + suffix if (c in left.columns or c == right_time) else c)
        for c in payload_cols
    }

    # Side marker orders right before left at equal timestamps so an
    # exact tie is visible to the left row; extra tiebreak columns make
    # the winner among equal right timestamps deterministic.
    r = right.select(
        *[F.col(b).alias(a) for a, b in zip(by, right_by)],
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*payload_cols).alias("__r"),
    )
    l = left.select(
        *[F.col(b).alias(a) for a, b in zip(by, left_by)],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.struct(*left.columns).alias("__l"),
    )
    r = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))

    tiebreak = [F.col(f"__r.{c}").asc_nulls_first() for c in (right_tiebreak or [])]
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__side").asc(), *tiebreak]
    else:
        # forward = mirror image: scan from the future backwards, so
        # sort descending; right still precedes left at equal times.
        order = [F.col("__t").desc(), F.col("__side").asc(), *tiebreak]

    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l.unionByName(r)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .withColumn("__mt", F.last(F.when(F.col("__side") == 0, F.col("__t")), ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        gap = (
            F.col("__t") - F.col("__mt")
            if direction == "backward"
            else F.col("__mt") - F.col("__t")
        )
        matched = matched.withColumn(
            "__m", F.when(gap <= tolerance, F.col("__m"))
        ).withColumn("__mt", F.when(gap <= tolerance, F.col("__mt")))

    out = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out += [
        F.col(f"__m.{c}").alias(out_names[c])
        for c in payload_cols
        if c != right_time
    ]
    out += [F.col("__mt").alias(right_time + suffix)]
    return matched.select(*out)
