"""Cadence-bucket deduplication (the reference's overlap-chop / too-close
record removal, G5/G6 in SURVEY.md §2.6).

Reference semantics being re-expressed:
  * inter-file overlap: records closer than dt_min to the previous file's
    end are chopped (ncagg/aggregator.py:198-201);
  * intra-file near-duplicates: stepdiff < 0.5/((2-c)*hz) => record cut
    (ncagg/aggrelist.py:290-293).

Spark-first formulation: assign every record to its cadence slot
("bucket") and keep exactly one record per slot — the earliest, with a
deterministic tiebreak. After the global union there is no intra/inter-file
distinction; one rule covers both (a real simplification over the
reference's sequential sweep).

Bucket arithmetic is integer microseconds so the DuckDB oracle can compute
bit-identical buckets:

    bucket = (unix_micros(ts) - origin_us) div step_us

Scale notes: the bucket expression is a pure projection (whole-stage
codegen); the dedup is one hash-shuffle on bucket. With AQE on, skewed
buckets (a hot slot) are split automatically. No global sort is needed —
``row_number() over (partition by bucket order by ts, tiebreak)`` uses a
per-key sort inside each shuffle partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ncagg_spark.functions.time import epoch_us

BUCKET_COL = "__bucket"


def cadence_bucket(
    df: DataFrame, index_col: str, origin_us: int, step_us: int,
    phase: float = 0.0,
) -> DataFrame:
    """Add the integer cadence-slot column. Index may be TIMESTAMP or
    TIMESTAMP_NTZ (epoch_us tolerates both). ``phase=0.5`` gives
    nearest-slot assignment (the reference's alignment); 0.0 gives
    floor buckets (the oracle-checked default)."""
    b = F.floor(
        (epoch_us(index_col) - F.lit(origin_us)) / F.lit(step_us)
        + F.lit(float(phase))
    ).cast("long")
    return df.withColumn(BUCKET_COL, b)


def dedup_cadence(
    df: DataFrame,
    index_col: str,
    *,
    tiebreak: list[str] | None = None,
    bucket_col: str = BUCKET_COL,
) -> DataFrame:
    """Keep the first record per cadence slot.

    Ordering inside a slot is (index, *tiebreak) ascending, with the
    full row as the final tiebreaker — fully deterministic, never
    dropDuplicates-without-order (SURVEY.md §7.5.2).

    Formulated as ``min(struct(order-keys, row))`` per bucket (round 6;
    the same shape the streaming dedup uses) rather than a
    ``row_number`` window: an aggregate gets MAP-SIDE PARTIAL
    aggregation, so each mapper ships at most one row per slot it saw —
    on a 100 TB stream where many records land in each cadence slot,
    the shuffle carries slots, not records, where the window form
    shuffles and per-key-sorts EVERY input row. Result is identical on
    any input where (index, tiebreak) is a total order per slot, and
    still deterministic (the trailing row struct breaks residual ties)
    otherwise.

    Frames containing non-orderable column types (MapType anywhere in
    the schema) cannot ride in an ordered struct — for those the
    row_number window form is used instead, ordering only by
    (index, *tiebreak) exactly as the pre-round-6 implementation did
    (ADVICE r6: the aggregate form was a silent API regression for
    map-typed callers).
    """
    if any(_has_map_type(f.dataType) for f in df.schema.fields):
        # residual tiebreak: every remaining ORDERABLE column joins the
        # window orderBy, so rows tied on (index, tiebreak) are still
        # kept deterministically — matching the aggregate form's
        # full-row struct tiebreak (ADVICE r7; only the map columns
        # themselves stay outside the order, Spark cannot sort them)
        explicit = {bucket_col, index_col, *(tiebreak or [])}
        residual = [
            f.name
            for f in df.schema.fields
            if f.name not in explicit and not _has_map_type(f.dataType)
        ]
        w = Window.partitionBy(bucket_col).orderBy(
            index_col, *(tiebreak or []), *residual
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    ordered = F.struct(
        F.col(index_col).alias("__ix"),
        *[F.col(c).alias(f"__tb_{c}") for c in (tiebreak or [])],
        F.struct(*[F.col(c) for c in df.columns]).alias("row"),
    )
    return (
        df.groupBy(F.col(bucket_col).alias("__g"))
        .agg(F.min(ordered).alias("__best"))
        .select("__best.row.*")
    )


def _has_map_type(dt) -> bool:
    """True when a MapType occurs anywhere in ``dt`` (maps have no
    ordering in Spark, so they cannot appear inside min(struct(...)))."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _has_map_type(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_has_map_type(f.dataType) for f in dt.fields)
    return False
