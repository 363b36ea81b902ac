"""The composed aggregation pipeline — the engine's flagship operator.

Semantic equivalent of the reference's plan+execute
(ncagg/aggregator.py:54-236 generate_aggregation_list,
:239-359 evaluate_aggregation_list), expressed as one declarative
DataFrame composition:

    scan (+ union) -> coalesce alt names -> fills->null -> drop invalid ts
    -> bounds filter -> cadence dedup -> grid gap-fill -> project/remap

The reference's aggregation-list IR disappears: Catalyst's logical plan is
the IR, and its optimizer replaces the hand-rolled sweep (file pruning via
parquet stats == the reference's file-level bounds skip; column pruning ==
its read-only-index planning pass; the one shuffle is the dedup/grid join
on the cadence slot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ncagg_spark.config import AggregationConfig
from ncagg_spark.operators.bounds import apply_bounds
from ncagg_spark.operators.dedup import BUCKET_COL, cadence_bucket, dedup_cadence
from ncagg_spark.operators.gapfill import gap_fill
from ncagg_spark.operators.normalize import drop_invalid_index, normalize_fills
from ncagg_spark.operators.projection import (
    coalesce_alternates,
    rename_columns,
    take_dim_indices,
)


def regularize(
    spark: SparkSession,
    df: DataFrame,
    cfg: AggregationConfig,
    *,
    anchor: str = "grid",
) -> DataFrame:
    """Run the full aggregation pipeline over an (already unioned) granule
    DataFrame. The index column must be TimestampType (use
    functions.time.cf_to_timestamp for CF-double inputs first).

    Without a cadence the pipeline degrades to normalize+bounds (the
    reference's no-index/no-cadence filename-order concat path,
    ncagg/aggregator.py:78-85 — ordering is applied at write).
    """
    ix = cfg.index_by
    if cfg.copy_from_alt:
        df = coalesce_alternates(df, cfg.copy_from_alt)
    df = normalize_fills(df, cfg.fill_values)
    df = drop_invalid_index(df, ix)

    lo_us, hi_us = cfg.min_us, cfg.max_us
    lo = F.timestamp_micros(F.lit(lo_us)) if lo_us is not None else None
    hi = F.timestamp_micros(F.lit(hi_us)) if hi_us is not None else None
    df = apply_bounds(df, ix, lo, hi)

    if cfg.cadence_hz is not None:
        if lo_us is None or hi_us is None:
            raise ValueError("cadence regularization requires both bounds")
        origin_us, n_buckets = lo_us, cfg.n_buckets()
        if getattr(cfg, "grid_phase", "bound") == "data":
            # reference-parity grid: shift the slot origin by the first
            # real record's sub-step phase (see AggregationConfig.
            # grid_phase — this realizes the reference's back-computed
            # leading-fill start, ncagg/aggregator.py:176-191, and keeps
            # every in-bounds record on its own slot with no bound-phase
            # lead slot). One tiny min() aggregate over the (pruned)
            # index column; returns None on an empty input -> plain
            # bound grid.
            from ncagg_spark.functions.time import epoch_us

            first_us = df.agg(
                F.min(epoch_us(ix)).alias("m")
            ).first()["m"]
            if first_us is not None:
                origin_us = lo_us + (int(first_us) - lo_us) % cfg.step_us
                n_buckets = max(
                    0, -(-(hi_us - origin_us) // cfg.step_us)
                )
        phase = getattr(cfg, "bucket_phase", 0.0)
        df = cadence_bucket(
            df, ix, origin_us=origin_us, step_us=cfg.step_us, phase=phase
        )
        if phase > 0:
            # nearest-slot rounding can push an in-bounds record past the
            # final slot (t in [hi - phase*step, hi) rounds to n_buckets);
            # the reference keeps every in-bounds record
            # (ncagg/aggregator.py:198-236 chops strictly on the bounds),
            # so clamp into the last slot — dedup resolves double
            # occupancy deterministically.
            df = df.withColumn(
                BUCKET_COL,
                F.least(F.col(BUCKET_COL), F.lit(n_buckets - 1)),
            )
        df = dedup_cadence(df, ix, tiebreak=cfg.tiebreak)
        df = gap_fill(
            spark,
            df,
            ix,
            origin_us=origin_us,
            step_us=cfg.step_us,
            n_buckets=n_buckets,
            anchor=anchor,
            # the reference's bump floor is the aggregation BOUND, not
            # the (possibly data-phase-shifted) grid origin
            backward_floor_us=lo_us,
        )

    if cfg.take_dim_indices:
        df = take_dim_indices(df, cfg.take_dim_indices)
    if cfg.rename:
        df = rename_columns(df, cfg.rename)
    return df
