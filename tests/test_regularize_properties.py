"""Property-based invariants for the regularizer (hypothesis): for ANY
input record set — duplicates, junk timestamps, out-of-bounds records,
empty input — the output is exactly the slot grid: n_buckets rows, one
per slot, grid-regular timestamps for fills, real slots iff the slot had
at least one valid in-bounds record, earliest-record-wins per slot.

This is the guarantee the reference earns with its artfully-tuned
sequential sweep (SURVEY.md §7.5.1); here it must hold by construction.
"""

from __future__ import annotations

from datetime import timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ncagg_spark.config import AggregationConfig
from ncagg_spark.operators.regularize import regularize

T0_US = 1_704_153_600_000_000
WINDOW_S = 30  # 30 slots at 1 Hz
STEP_US = 1_000_000

record = st.tuples(
    st.integers(
        min_value=-5_000_000, max_value=(WINDOW_S + 5) * 1_000_000
    ),  # offset from T0, may fall outside bounds
    st.integers(min_value=0, max_value=10_000),  # tiebreak id
)
records = st.lists(record, min_size=0, max_size=60)
junk = st.lists(
    st.sampled_from([0, -1_000_000, -999]), min_size=0, max_size=3
)


@pytest.fixture(scope="module")
def cfg():
    return AggregationConfig(
        index_by="ts",
        cadence_hz=1.0,
        min_bound=T0_US / 1e6,
        max_bound=(T0_US + WINDOW_S * 1_000_000) / 1e6,
        tiebreak=["rid"],
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(recs=records, junk_ts=junk)
def test_regularize_grid_invariants(spark, cfg, recs, junk_ts):
    rows = [(T0_US + off, rid) for off, rid in recs]
    rows += [(j, 99999) for j in junk_ts]  # epoch-junk timestamps
    df = spark.createDataFrame(
        rows or [(None, None)], "us long, rid long"
    ).filter(F.col("us").isNotNull())
    df = df.select(F.timestamp_micros(F.col("us")).alias("ts"), "rid")

    out = regularize(spark, df, cfg).orderBy("ts").collect()

    # exactly one row per slot
    assert len(out) == WINDOW_S

    # expected slot contents computed by a plain-python oracle
    valid = [
        (u, rid)
        for u, rid in rows
        if u is not None and u > 0 and T0_US <= u < T0_US + WINDOW_S * STEP_US
    ]
    by_slot: dict[int, tuple[int, int]] = {}
    for u, rid in valid:
        slot = (u - T0_US) // STEP_US
        if slot not in by_slot or (u, rid) < by_slot[slot]:
            by_slot[slot] = (u, rid)

    for i, r in enumerate(out):
        us = int(r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1e6)
        if i in by_slot:
            assert not r["is_fill"]
            assert (us, r["rid"]) == by_slot[i]
        else:
            assert r["is_fill"]
            assert us == T0_US + i * STEP_US  # grid-anchored
            assert r["rid"] is None
