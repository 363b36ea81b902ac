"""Scale measurement: the regularization pipeline at ~100x bench scale.

Synthesizes ~10M event records over 30 days at 4 Hz with gaps, duplicate
bursts, and epoch-junk timestamps (distributed via spark.range — no
driver-side data), then times the full pipeline for both fill-anchor
modes and checks output invariants. Evidence for SCALE.md.

Usage: python tools/scale_regularize.py [grid|previous|both]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

T0_US = 1_704_153_600_000_000  # 2024-01-02
DAYS = 30
HZ = 4
STEP_US = 250_000
N_SLOTS = DAYS * 86_400 * HZ


def build_events(spark):
    """~10M records: 4 Hz slots with 3% gap slots removed, 2% duplicate
    bursts added, 0.1% epoch-junk timestamps injected."""
    base = (
        spark.range(0, N_SLOTS, 1, 32)
        .withColumn("us", F.lit(T0_US) + F.col("id") * STEP_US)
        # deterministic pseudo-noise off the slot id
        .withColumn("h", F.abs(F.xxhash64("id")))
    )
    kept = base.filter((F.col("h") % 100) >= 3)  # 3% gap slots
    # duplicate bursts must target slots whose ORIGINAL record is kept,
    # otherwise the shifted copy is the slot's only record and the
    # dedup branch never fires (h%100 in [0,2) was disjoint from kept)
    dups = base.filter(
        ((F.col("h") % 100) >= 3) & ((F.col("h") % 100) < 5)
    ).withColumn(
        "us", F.col("us") + 1_000
    )  # 2% near-dup bursts inside dt_min, alongside their originals
    junk = base.filter((F.col("h") % 1000) == 7).withColumn(
        "us", F.lit(0)
    )  # epoch junk -> dropped by invalid-index removal
    ev = kept.union(dups).union(junk)
    return ev.select(
        F.timestamp_micros(F.col("us")).alias("ts"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    from ncagg_spark.config import AggregationConfig
    from ncagg_spark.operators.regularize import regularize
    from ncagg_spark.session import get_spark

    spark = get_spark(app_name="scale-regularize")
    spark.sparkContext.setLogLevel("ERROR")

    ev = build_events(spark)
    ev = ev.persist()
    n_in = ev.count()
    print(f"input: {n_in:,} records ({N_SLOTS:,} slots over {DAYS} days)")

    cfg = AggregationConfig(
        index_by="ts",
        cadence_hz=HZ,
        min_bound=T0_US / 1e6,
        max_bound=(T0_US + DAYS * 86_400_000_000) / 1e6,
    )
    anchors = ["grid", "previous"] if which == "both" else [which]
    for anchor in anchors:
        t0 = time.time()
        out = regularize(spark, ev, cfg, anchor=anchor)
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        n = out.count()
        assert n == N_SLOTS, (n, N_SLOTS)
        print(
            f"anchor={anchor}: {dt:.1f}s = {n_in / dt / 1e6:.2f}M rows/s "
            f"({n:,} output slots, exact)"
        )


if __name__ == "__main__":
    main()
