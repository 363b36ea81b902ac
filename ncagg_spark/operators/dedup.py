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

    Ordering inside a slot is (index, *tiebreak) ascending — fully
    deterministic, never dropDuplicates-without-order (SURVEY.md §7.5.2).
    """
    order = [F.col(index_col).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(bucket_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
