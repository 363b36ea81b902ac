"""Unit tests on individual operators: normalization, projection,
coalesce-alternates, take_dim_indices, bounds, dedup determinism.
Style mirrors the reference's test/generic/ component tests.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ncagg_spark.operators.bounds import apply_bounds
from ncagg_spark.operators.dedup import cadence_bucket, dedup_cadence
from ncagg_spark.operators.normalize import drop_invalid_index, normalize_fills
from ncagg_spark.operators.projection import (
    coalesce_alternates,
    rename_columns,
    take_dim_indices,
)


def test_normalize_fills_sentinel_and_nan(spark):
    df = spark.createDataFrame(
        [(1, -9999.0), (2, 5.0), (3, float("nan")), (4, None)],
        "id long, v double",
    )
    out = normalize_fills(df, {"v": -9999.0}).orderBy("id").collect()
    assert [r["v"] for r in out] == [None, 5.0, None, None]


def test_normalize_fills_int_sentinel(spark):
    df = spark.createDataFrame([(1, 255), (2, 7)], "id long, flag int")
    out = normalize_fills(df, {"flag": 255}).orderBy("id").collect()
    assert [r["flag"] for r in out] == [None, 7]


def test_normalize_fills_untouched_columns(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0)], "id long, a double, b double")
    out = normalize_fills(df, {"a": 2.0}).collect()[0]
    assert out["a"] is None and out["b"] == 3.0


def test_drop_invalid_index_double(spark):
    df = spark.createDataFrame(
        [(1, 100.5), (2, 0.0), (3, -5.0), (4, float("nan")), (5, None)],
        "id long, ts double",
    )
    out = drop_invalid_index(df, "ts").collect()
    assert [r["id"] for r in out] == [1]


def test_drop_invalid_index_timestamp(spark):
    df = spark.createDataFrame([(1, 10**6), (2, 0), (3, -1)], "id long, us long")
    df = df.select("id", F.timestamp_micros(F.col("us")).alias("ts"))
    out = drop_invalid_index(df, "ts").collect()
    assert [r["id"] for r in out] == [1]


def test_coalesce_alternates_prefers_target(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 9.0), (2, None, 8.0), (3, None, None)],
        "id long, new double, old double",
    )
    out = coalesce_alternates(df, {"new": ["old"]}).orderBy("id").collect()
    assert [r["new"] for r in out] == [1.0, 8.0, None]
    assert "old" not in out[0].asDict()


def test_coalesce_alternates_missing_column_skipped(spark):
    df = spark.createDataFrame([(1, 2.0)], "id long, new double")
    out = coalesce_alternates(df, {"new": ["never_existed"]}).collect()
    assert out[0]["new"] == 2.0


def test_coalesce_alternates_all_missing_raises(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        coalesce_alternates(df, {"ghost": ["ghost2"]})


def test_take_dim_indices(spark):
    df = spark.createDataFrame([(1, [10.0, 20.0, 30.0])], "id long, arr array<double>")
    out = take_dim_indices(df, {"arr": 1}).collect()[0]
    assert out["arr"] == 20.0  # 0-based index 1


def test_rename_columns(spark):
    df = spark.createDataFrame([(1, 2.0)], "a long, b double")
    out = rename_columns(df, {"b": "c"})
    assert out.columns == ["a", "c"]


def test_apply_bounds_half_open(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "v long")
    out = apply_bounds(df, "v", F.lit(2), F.lit(5)).collect()
    assert sorted(r["v"] for r in out) == [2, 3, 4]
    out2 = apply_bounds(df, "v", F.lit(2), F.lit(5), closed_end=True).collect()
    assert sorted(r["v"] for r in out2) == [2, 3, 4, 5]


def test_cadence_bucket_integer_micros(spark):
    df = spark.createDataFrame([(0,), (999_999,), (1_000_000,), (2_500_000,)], "us long")
    df = df.select(F.timestamp_micros(F.col("us")).alias("ts"))
    out = cadence_bucket(df, "ts", origin_us=0, step_us=1_000_000).collect()
    assert sorted(r["__bucket"] for r in out) == [0, 0, 1, 2]


def test_dedup_deterministic_under_shuffle(spark):
    # many same-bucket rows in random partition order: winner must be the
    # (ts, id) minimum regardless of physical layout (SURVEY §7.5.2)
    rows = [(5_000_000 + (i * 37) % 900_000, i) for i in range(100)]
    df = spark.createDataFrame(rows, "us long, id long").repartition(7)
    df = df.select(F.timestamp_micros(F.col("us")).alias("ts"), "id")
    df = cadence_bucket(df, "ts", origin_us=0, step_us=1_000_000)
    out = dedup_cadence(df, "ts", tiebreak=["id"]).collect()
    assert len(out) == 1
    best = min(rows)
    assert out[0]["id"] == best[1]


def test_salted_join_matches_plain_join(spark):
    from ncagg_spark.operators.skew import salted_join

    # one hot key (90% of rows) + a long tail
    left = spark.createDataFrame(
        [(0 if i % 10 else i, i) for i in range(200)], "k long, lid long"
    )
    right = spark.createDataFrame([(i, i * 10.0) for i in range(20)], "k long, v double")
    plain = {(r["lid"], r["v"]) for r in left.join(right, "k").collect()}
    salted = {
        (r["lid"], r["v"])
        for r in salted_join(left, right, "k", n_salts=4).collect()
    }
    assert salted == plain

    # left join keeps unmatched rows exactly once
    plain_l = sorted(
        (r["lid"], r["v"]) for r in left.join(right, "k", "left").collect()
    )
    salted_l = sorted(
        (r["lid"], r["v"])
        for r in salted_join(left, right, "k", n_salts=4, how="left").collect()
    )
    assert salted_l == plain_l

    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(left, right, "k", how="full")


def test_promote_fixed_dim(spark):
    from ncagg_spark.operators.projection import promote_fixed_dim

    df = spark.createDataFrame(
        [(1, [10.0, 20.0]), (2, []), (3, None)],
        "id long, arr array<double>",
    )
    out = promote_fixed_dim(df, "arr").orderBy("id", "pos").collect()
    # element rows for id=1; empty/null arrays keep one row with nulls
    # (the reference's missing-dim "size 1 per file" semantics)
    assert [(r["id"], r["pos"], r["arr"]) for r in out] == [
        (1, 0, 10.0),
        (1, 1, 20.0),
        (2, None, None),
        (3, None, None),
    ]


def test_per_file_scalar_grain(spark):
    """The crota case (test/exis/EXISL1bSFXR_with_crota): per-file scalar
    variables become a per-file grain — one row per granule with the
    scalar attached, via the manifest with attr_cols."""
    from ncagg_spark.plans.manifest import FILE_COL, build_manifest

    rows = [
        (100.0, "f1", 0.75),
        (101.0, "f1", 0.75),
        (200.0, "f2", 0.80),
    ]
    df = spark.createDataFrame(rows, "ts double, src string, crota double")
    m = build_manifest(df, "ts", file_col="src", attr_cols=["crota"])
    got = {r[FILE_COL]: (r["crota"], r["row_count"]) for r in m.collect()}
    assert got == {"f1": (0.75, 2), "f2": (0.80, 1)}


def test_cadence_bucket_phase_nearest_slot(spark):
    """bucket_phase=0.5 assigns jittered records to their NEAREST slot
    (the reference's alignment): a record at k*step - 0.05s belongs to
    slot k, not k-1. Default phase 0 keeps floor semantics (the
    oracle-checked driver queries)."""
    from ncagg_spark.operators.dedup import cadence_bucket

    t0 = 1_704_153_600_000_000
    us = [t0 + 950_000, t0 + 1_050_000, t0 + 2_499_000, t0 + 2_501_000]
    df = spark.createDataFrame([(u,) for u in us], "us long").select(
        F.timestamp_micros(F.col("us")).alias("ts")
    )
    floor_b = [
        r[0]
        for r in cadence_bucket(df, "ts", t0, 1_000_000)
        .select("__bucket").orderBy("ts").collect()
    ]
    near_b = [
        r[0]
        for r in cadence_bucket(df, "ts", t0, 1_000_000, phase=0.5)
        .select("__bucket").orderBy("ts").collect()
    ]
    assert floor_b == [0, 1, 2, 2]
    assert near_b == [1, 1, 2, 3]


def test_salted_join_bounds_hot_key_partitions(spark):
    """VERDICT r9 #2: the salted layout must BOUND the straggler, pinned
    deterministically. pmod(hash(keys), P) replicates Spark's
    HashPartitioning exactly (same Murmur3), so the per-partition row
    counts below are the rows each shuffle task would receive. On a
    fixture where one key owns 30% of all rows: the plain layout's
    hottest partition is >5x the median (the straggler the skew tool
    measures — 16.7x records / 8.5s wall at sf10 scale, SCALE.md); the
    salted layout must keep every partition under 2x the median, and
    the bound must TIGHTEN as n_salts grows (hot share per (key, salt)
    group shrinks, so salt-group collisions cost less — measured
    max/median 2.7 -> 1.76 -> 1.45 -> 1.21 for 16/64/128/256 salts;
    size n_salts to the skew, not a constant). Wall-time evidence lives
    in tools/skew_stress.py + SCALE.md; this pins the layout property
    that produces it."""
    from pyspark.sql import functions as F

    n, p = 100_000, 32
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 10 < 3, F.lit(777))
        .otherwise(F.col("id") % 5000)
        .alias("user_id"),
    )

    def partition_counts(df, cols):
        return [
            r["c"]
            for r in df.groupBy(
                F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(p)).alias(
                    "pid"
                )
            )
            .agg(F.count("*").alias("c"))
            .collect()
        ]

    plain = sorted(partition_counts(ev, ["user_id"]))
    med_plain = plain[len(plain) // 2]
    assert plain[-1] > 5 * med_plain, (plain[-1], med_plain)

    from ncagg_spark.operators.skew import SALT_COL

    maxima = {}
    for n_salts in (16, 64):
        salted = ev.withColumn(
            SALT_COL, (F.rand(seed=42) * n_salts).cast("int")
        )
        s_counts = sorted(partition_counts(salted, ["user_id", SALT_COL]))
        med_s = s_counts[len(s_counts) // 2]
        maxima[n_salts] = (s_counts[-1], med_s)
    # at 64 salts every partition is within 2x the median (no straggler)
    mx, med = maxima[64]
    assert mx <= 2 * med, maxima
    # and the bound tightens with the salt count
    assert maxima[64][0] < maxima[16][0], maxima
