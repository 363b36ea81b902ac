"""AggregationConfig — cadence tolerance formulas and validation.

Mirrors the reference's config unit tests (test/generic/test_config_objects.py)
and the tolerance constants at ncagg/aggregator.py:119-125.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from ncagg_spark.config import AggregationConfig


def test_tolerance_formulas_match_reference():
    cfg = AggregationConfig(index_by="ts", cadence_hz=10.0)
    c = 0.9
    assert cfg.dt_nom == pytest.approx(1 / 10.0)
    assert cfg.dt_min == pytest.approx(1 / ((2 - c) * 10.0))
    assert cfg.dt_max == pytest.approx(1 / (c * 10.0))
    assert cfg.dt_min < cfg.dt_nom < cfg.dt_max


def test_step_us_integer_micros():
    assert AggregationConfig(index_by="ts", cadence_hz=1.0).step_us == 1_000_000
    assert AggregationConfig(index_by="ts", cadence_hz=10.0).step_us == 100_000
    # 1-minute cadence expressed as hz
    assert AggregationConfig(index_by="ts", cadence_hz=1 / 60).step_us == 60_000_000


def test_bounds_to_micros():
    dt = datetime(2024, 1, 2, tzinfo=timezone.utc)
    cfg = AggregationConfig(index_by="ts", min_bound=dt, max_bound=1704240000.0)
    assert cfg.min_us == 1_704_153_600_000_000
    assert cfg.max_us == 1_704_240_000_000_000


def test_n_buckets_half_open_interval():
    cfg = AggregationConfig(
        index_by="ts", cadence_hz=1.0, min_bound=0.0, max_bound=86400.0
    )
    assert cfg.n_buckets() == 86400
    # partial trailing slot rounds up
    cfg2 = AggregationConfig(
        index_by="ts", cadence_hz=1.0, min_bound=0.0, max_bound=10.5
    )
    assert cfg2.n_buckets() == 11


def test_validation_rejects_bad_values():
    with pytest.raises(ValueError):
        AggregationConfig(index_by="ts", timing_certainty=0.0)
    with pytest.raises(ValueError):
        AggregationConfig(index_by="ts", timing_certainty=1.5)
    with pytest.raises(ValueError):
        AggregationConfig(index_by="ts", cadence_hz=-1.0)


def test_n_buckets_requires_bounds():
    cfg = AggregationConfig(index_by="ts", cadence_hz=1.0)
    with pytest.raises(ValueError):
        cfg.n_buckets()


def test_validate_columns_inter_validation():
    # the reference's Config.inter_validate analogue
    # (test/generic/test_util_validate_unlim_config.py)
    import pytest

    cfg = AggregationConfig(
        index_by="ts", tiebreak=["event_id"], take_dim_indices={"arr": 2}
    )
    cfg.validate_columns(["ts", "event_id", "arr", "value"])  # ok

    with pytest.raises(ValueError, match="index_by"):
        AggregationConfig(index_by="nope").validate_columns(["ts"])
    with pytest.raises(ValueError, match="tiebreak"):
        AggregationConfig(index_by="ts", tiebreak=["gone"]).validate_columns(
            ["ts"]
        )
    with pytest.raises(ValueError, match="take_dim_indices"):
        AggregationConfig(
            index_by="ts", take_dim_indices={"gone": 0}
        ).validate_columns(["ts"])
    with pytest.raises(ValueError, match=">= 0"):
        AggregationConfig(
            index_by="ts", take_dim_indices={"arr": -1}
        ).validate_columns(["ts", "arr"])
    # lenient by design: fill sentinels / alternates may be absent (P4)
    AggregationConfig(
        index_by="ts",
        fill_values={"missing_col": -999},
        copy_from_alt={"v": ["absent_alt"]},
    ).validate_columns(["ts", "v"])
