"""Regularization pipeline invariants — the reference's end-to-end test
style (SURVEY.md §5): diff(ts) regularity, bounds containment, exact
counts, fill placement, dedup determinism, invalid-index removal.

Scenario coverage maps to reference test dirs:
  * gap fill          -> test/mag/magnl2hires_gap
  * overlap dedup     -> test/exis/EXISL1bSFEU (interleaved)
  * leading fill      -> test/seis/SEISL1bMPSH_boundbetween
  * zero timestamps   -> test/mag/MAGL1bGEOF_5min_with0timestamp
  * all-fill file     -> CHANGELOG 0.8.2 (P9)
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from ncagg_spark.config import AggregationConfig
from ncagg_spark.operators.regularize import regularize

T0 = datetime(2024, 1, 2, tzinfo=timezone.utc)
T0_US = 1_704_153_600_000_000
HOUR_US = 3_600_000_000


def _df(spark, rows):
    """rows: list of (epoch_us, value). Builds (ts timestamp, value double)."""
    df = spark.createDataFrame(rows, "us long, value double")
    return df.select(
        F.timestamp_micros(F.col("us")).alias("ts"), "value"
    )


def _cfg(hz=1.0, lo=T0_US, hi=None, **kw):
    hi = hi if hi is not None else T0_US + 60 * 1_000_000
    return AggregationConfig(
        index_by="ts",
        cadence_hz=hz,
        min_bound=lo / 1e6,
        max_bound=hi / 1e6,
        **kw,
    )


def _micros(rows, col="ts"):
    return [int(r[col].replace(tzinfo=timezone.utc).timestamp() * 1e6) for r in rows]


def test_perfect_series_passes_through(spark):
    rows = [(T0_US + i * 1_000_000, float(i)) for i in range(60)]
    out = regularize(spark, _df(spark, rows), _cfg()).orderBy("ts").collect()
    assert len(out) == 60
    assert all(not r["is_fill"] for r in out)
    us = _micros(out)
    diffs = {b - a for a, b in zip(us, us[1:])}
    assert diffs == {1_000_000}


def test_gap_fill_regularity_and_count(spark):
    # 60-slot window with records missing in slots 10..19 (the gap)
    rows = [
        (T0_US + i * 1_000_000, float(i))
        for i in range(60)
        if not 10 <= i < 20
    ]
    out = regularize(spark, _df(spark, rows), _cfg()).orderBy("ts").collect()
    assert len(out) == 60  # exact count: every slot exactly once
    fills = [i for i, r in enumerate(out) if r["is_fill"]]
    assert fills == list(range(10, 20))  # fill placement
    assert all(out[i]["value"] is None for i in fills)  # data cols null
    us = _micros(out)
    diffs = {b - a for a, b in zip(us, us[1:])}
    assert diffs == {1_000_000}  # diff(ts) min=mean=max=1/hz


def test_bounds_containment(spark):
    # records straddling both bounds; [lo, hi) half-open
    rows = [(T0_US + i * 1_000_000, float(i)) for i in range(-5, 70)]
    out = regularize(spark, _df(spark, rows), _cfg()).collect()
    us = _micros(out)
    assert min(us) >= T0_US
    assert max(us) < T0_US + 60 * 1_000_000
    assert len(out) == 60


def test_overlap_dedup_keeps_earliest_with_tiebreak(spark):
    # two "files" overlap: slot 5 has three candidate records
    rows = [(T0_US + i * 1_000_000, float(i)) for i in range(10)]
    rows += [
        (T0_US + 5_000_000, 100.0),  # same ts as value=5.0 row
        (T0_US + 5_400_000, 200.0),  # later within slot 5
    ]
    cfg = _cfg(hi=T0_US + 10 * 1_000_000, tiebreak=["value"])
    out = regularize(spark, _df(spark, rows), cfg).orderBy("ts").collect()
    assert len(out) == 10
    # earliest ts wins; tie on ts broken by value ascending -> 5.0
    assert out[5]["value"] == 5.0


def test_invalid_index_rows_dropped(spark):
    # epoch-zero / negative timestamps cut (reference P8); their slots fill
    rows = [(T0_US + i * 1_000_000, float(i)) for i in range(3)]
    rows += [(0, 99.0), (-1_000_000, 98.0)]
    cfg = _cfg(hi=T0_US + 5 * 1_000_000)
    out = regularize(spark, _df(spark, rows), cfg).orderBy("ts").collect()
    assert len(out) == 5
    assert [r["is_fill"] for r in out] == [False] * 3 + [True] * 2


def test_all_fill_input_yields_all_fill_output(spark):
    # an input that is entirely junk (P9): full grid of fills comes out
    rows = [(0, 1.0), (0, 2.0)]
    cfg = _cfg(hi=T0_US + 10 * 1_000_000)
    out = regularize(spark, _df(spark, rows), cfg).collect()
    assert len(out) == 10
    assert all(r["is_fill"] for r in out)


def test_leading_and_trailing_fill_against_bounds(spark):
    # data only in the middle of the window -> fills on both edges
    rows = [(T0_US + i * 1_000_000, float(i)) for i in range(20, 40)]
    out = regularize(spark, _df(spark, rows), _cfg()).orderBy("ts").collect()
    assert len(out) == 60
    flags = [r["is_fill"] for r in out]
    assert all(flags[:20]) and all(flags[40:])
    assert not any(flags[20:40])


def test_anchored_fill_continues_from_previous_record(spark):
    # reference ncagg/aggregator.py:171-175: fill stamps continue from the
    # previous real record, not the grid. Real record offset +0.3s into its
    # slot; following fills must carry that offset.
    rows = [(T0_US + 300_000, 1.0)]  # slot 0, offset 0.3s
    cfg = _cfg(hi=T0_US + 4 * 1_000_000)
    out = (
        regularize(spark, _df(spark, rows), cfg, anchor="previous")
        .orderBy("ts")
        .collect()
    )
    us = _micros(out)
    assert us == [T0_US + 300_000 + i * 1_000_000 for i in range(4)]
    # grid anchor: fills land exactly on grid points instead
    out_g = regularize(spark, _df(spark, rows), cfg).orderBy("ts").collect()
    us_g = _micros(out_g)
    assert us_g[1:] == [T0_US + i * 1_000_000 for i in range(1, 4)]


def test_leading_fill_back_computed_from_first_record(spark):
    # no real record precedes the leading fills: the reference
    # back-computes the fill start from the NEXT real node
    # (aggregator.py:176-191: start_from = next_start - (size+1)*dt_nom)
    # — leading fills carry the first real record's phase, not the grid
    rows = [(T0_US + 2 * 1_000_000 + 250_000, 1.0)]  # slot 2, +0.25s
    cfg = _cfg(hi=T0_US + 4 * 1_000_000)
    out = (
        regularize(spark, _df(spark, rows), cfg, anchor="previous")
        .orderBy("ts")
        .collect()
    )
    us = _micros(out)
    assert us[0] == T0_US + 250_000  # 2.25s - 2*dt
    assert us[1] == T0_US + 1_250_000  # 2.25s - 1*dt
    assert us[2] == T0_US + 2_250_000  # the real record
    assert us[3] == T0_US + 3_250_000  # continues from the real record
    # the bump rule (start_from + dt >= bound) is automatic: every
    # back-computed fill stays >= the grid origin
    assert all(u >= T0_US for u in us)


def test_leading_fill_grid_when_input_empty(spark):
    # with NO real records at all there is no node to back-compute from:
    # anchored mode falls back to the grid
    rows = [(0, 1.0)]  # invalid index -> dropped
    cfg = _cfg(hi=T0_US + 3 * 1_000_000)
    out = (
        regularize(spark, _df(spark, rows), cfg, anchor="previous")
        .orderBy("ts")
        .collect()
    )
    us = _micros(out)
    assert us == [T0_US + i * 1_000_000 for i in range(3)]
    assert all(r["is_fill"] for r in out)


def test_anchored_fill_carries_across_blocks(spark):
    """The two-phase distributed running-last must carry the previous real
    record across block boundaries — forced here with a tiny block_size so
    the carry-in (broadcast prefix) path is exercised, not just the
    per-block window."""
    from ncagg_spark.operators.dedup import cadence_bucket, dedup_cadence
    from ncagg_spark.operators.gapfill import gap_fill

    n = 40
    # one real record at slot 3 (offset +0.3s); everything after must
    # anchor to it, across many 8-slot blocks
    rows = [(T0_US + 3 * 1_000_000 + 300_000, 1.0)]
    df = cadence_bucket(
        _df(spark, rows), "ts", origin_us=T0_US, step_us=1_000_000
    )
    df = dedup_cadence(df, "ts")
    out = (
        gap_fill(
            spark,
            df,
            "ts",
            origin_us=T0_US,
            step_us=1_000_000,
            n_buckets=n,
            anchor="previous",
            block_size=8,
        )
        .orderBy("ts")
        .collect()
    )
    us = _micros(out)
    # leading fills back-compute from the first real record (its +0.3s
    # phase), then everything after anchors forward from it
    assert us == [
        T0_US + 300_000 + i * 1_000_000 for i in range(n)
    ]


def test_anchored_window_is_partitioned(spark):
    """Plan assertion: the data-sized running-last window is partitioned
    by the coarse block — no global single-partition window over the slot
    grid (the round-1 scale-killer)."""
    rows = [(T0_US + 300_000, 1.0)]
    cfg = _cfg(hi=T0_US + 4 * 1_000_000)
    df = regularize(spark, _df(spark, rows), cfg, anchor="previous")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(__gf_block" in plan


def test_ten_hz_cadence(spark):
    # the reference's MAG hires case: 10 Hz
    n = 100
    rows = [(T0_US + i * 100_000, float(i)) for i in range(0, n, 2)]  # half missing
    cfg = _cfg(hz=10.0, hi=T0_US + n * 100_000)
    out = regularize(spark, _df(spark, rows), cfg).orderBy("ts").collect()
    assert len(out) == n
    us = _micros(out)
    diffs = {b - a for a, b in zip(us, us[1:])}
    assert diffs == {100_000}
    assert sum(r["is_fill"] for r in out) == n // 2


def test_no_cadence_degrades_to_bounds_filter(spark):
    rows = [(T0_US + i * 777_000, float(i)) for i in range(100)]
    cfg = AggregationConfig(
        index_by="ts",
        min_bound=T0_US / 1e6,
        max_bound=(T0_US + 30 * 1_000_000) / 1e6,
    )
    out = regularize(spark, _df(spark, rows), cfg).collect()
    us = _micros(out)
    assert all(T0_US <= u < T0_US + 30 * 1_000_000 for u in us)
    assert len(out) == len([r for r in rows if r[0] < T0_US + 30 * 1_000_000])


def test_fill_value_normalization_feeds_pipeline(spark):
    # sentinel -9999 in `value` becomes null before gap-fill
    rows = [(T0_US + i * 1_000_000, -9999.0 if i % 2 else float(i)) for i in range(10)]
    cfg = _cfg(hi=T0_US + 10 * 1_000_000, fill_values={"value": -9999.0})
    out = regularize(spark, _df(spark, rows), cfg).orderBy("ts").collect()
    assert len(out) == 10
    assert [r["value"] is None for r in out] == [bool(i % 2) for i in range(10)]
    # the rows themselves are real (index was valid), not fills
    assert all(not r["is_fill"] for r in out)


def test_grid_phase_data_keeps_all_phase_offset_records(spark):
    """The head-to-head day-build divergence (VERDICT r6 #2): records at
    a constant sub-step phase (+0.9 s) with nearest-slot bucketing.
    grid_phase='bound' leaves slot 0 empty (a fill at the bound's phase)
    and clamp-drops the last record; grid_phase='data' anchors the grid
    to the first record's phase (the reference's effective behavior —
    aggregator.py:176-191) so every record keeps its own slot and the
    output is exactly the input series."""
    n = 10
    rows = [(T0_US + 900_000 + i * 1_000_000, float(i)) for i in range(n)]
    cfg = _cfg(hi=T0_US + n * 1_000_000, bucket_phase=0.5,
               grid_phase="data")
    out = (
        regularize(spark, _df(spark, rows), cfg).orderBy("ts").collect()
    )
    assert len(out) == n
    assert not any(r["is_fill"] for r in out)
    assert _micros(out) == [us for us, _ in rows]
    # the bound-phase grid, for contrast: one leading fill, last real
    # record clamp-merged away
    cfg_b = _cfg(hi=T0_US + n * 1_000_000, bucket_phase=0.5)
    out_b = (
        regularize(spark, _df(spark, rows), cfg_b).orderBy("ts").collect()
    )
    assert len(out_b) == n
    assert out_b[0]["is_fill"] and not any(r["is_fill"] for r in out_b[1:])


def test_grid_phase_data_gap_fill_carries_phase(spark):
    """With a data-aligned grid, mid-series fill slots synthesize
    timestamps on the DATA's phase (anchor='previous'), exactly the
    reference's prev_end + k*dt_nom fill stamps."""
    rows = [
        (T0_US + 400_000, 0.0),
        (T0_US + 1_400_000, 1.0),
        # slots 2,3 missing
        (T0_US + 4_400_000, 4.0),
    ]
    cfg = _cfg(hi=T0_US + 5 * 1_000_000, bucket_phase=0.5,
               grid_phase="data")
    out = (
        regularize(spark, _df(spark, rows), cfg, anchor="previous")
        .orderBy("ts")
        .collect()
    )
    assert len(out) == 5
    assert [r["is_fill"] for r in out] == [False, False, True, True, False]
    assert _micros(out) == [T0_US + 400_000 + i * 1_000_000
                            for i in range(5)]


def test_grid_phase_data_empty_input_uses_bound_grid(spark):
    rows = [(0, 1.0)]  # invalid -> dropped
    cfg = _cfg(hi=T0_US + 3 * 1_000_000, grid_phase="data")
    out = regularize(spark, _df(spark, rows), cfg).orderBy("ts").collect()
    assert _micros(out) == [T0_US + i * 1_000_000 for i in range(3)]


def test_grid_phase_validation():
    with pytest.raises(ValueError, match="grid_phase"):
        _cfg(grid_phase="nope")


def test_leading_fill_bump_rule_clamps_below_bound(spark):
    """The reference's bump case (aggregator.py:185-191): with
    nearest-slot bucketing a slot-b record can sit up to half a step
    BEFORE origin + b*step, so the slot-0 back-computed stamp would dip
    below the aggregation bound — it must fall back to the grid point
    (the reference drops that below-bound fill; the grid model keeps
    the slot but stamps it at the bound)."""
    # record at slot 1's center - 0.4s = T0 + 0.6s (nearest slot 1)
    rows = [(T0_US + 600_000, 1.0)]
    cfg = _cfg(hi=T0_US + 3 * 1_000_000, bucket_phase=0.5)
    out = (
        regularize(spark, _df(spark, rows), cfg, anchor="previous")
        .orderBy("ts")
        .collect()
    )
    us = _micros(out)
    # slot 0 backward stamp would be T0 - 0.4s < bound -> grid point
    assert us[0] == T0_US
    assert us[1] == T0_US + 600_000  # the real record
    assert us[2] == T0_US + 1_600_000  # forward-anchored fill
    assert all(u >= T0_US for u in us)
