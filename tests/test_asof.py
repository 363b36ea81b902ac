"""asof_join: backward/forward, ties, tolerance, no-match nulls,
determinism under shuffle, and single-shuffle plan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ncagg_spark.operators.asof import asof_join

TS = lambda s: dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, TS("2024-01-01 00:10:00"), "a"),
            (1, TS("2024-01-01 00:20:00"), "b"),
            (1, TS("2024-01-01 00:05:00"), "pre"),
            (2, TS("2024-01-01 00:15:00"), "c"),
            (3, TS("2024-01-01 00:15:00"), "nomatch-key"),
        ],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, TS("2024-01-01 00:10:00"), 100, 1.0),
            (1, TS("2024-01-01 00:18:00"), 101, 2.0),
            (2, TS("2024-01-01 00:14:00"), 200, 3.0),
            (2, TS("2024-01-01 00:14:00"), 201, 4.0),  # tie on (k, t)
        ],
        "k long, t timestamp, rid long, val double",
    )
    return left, right


def _rows(df):
    return {r["tag"]: r.asDict() for r in df.collect()}


def test_backward_basic(frames):
    left, right = frames
    out = asof_join(
        left, right, left_time="t", right_time="t",
        left_by="k", right_by="k", right_tiebreak=["rid"],
    )
    assert set(out.columns) == {"k", "t", "tag", "rid", "val", "t_asof"}
    r = _rows(out)
    assert r["a"]["rid"] == 100  # exact tie at 00:10 matches (<=)
    assert r["b"]["rid"] == 101  # latest at-or-before 00:20
    assert r["pre"]["rid"] is None  # before first right row
    assert r["c"]["rid"] == 201  # (k,t) tie -> max tiebreak wins
    assert r["nomatch-key"]["rid"] is None
    assert r["b"]["t_asof"] == TS("2024-01-01 00:18:00")


def test_forward(frames):
    left, right = frames
    r = _rows(
        asof_join(
            left, right, left_time="t", right_time="t",
            left_by="k", right_by="k",
            direction="forward", right_tiebreak=["rid"],
        )
    )
    assert r["pre"]["rid"] == 100  # next at-or-after 00:05
    assert r["a"]["rid"] == 100  # exact tie still matches
    assert r["b"]["rid"] is None  # nothing after 00:20


def test_tolerance(frames):
    left, right = frames
    r = _rows(
        asof_join(
            left, right, left_time="t", right_time="t",
            left_by="k", right_by="k",
            tolerance=F.expr("INTERVAL 3 MINUTES"), right_tiebreak=["rid"],
        )
    )
    assert r["b"]["rid"] == 101  # 2 min gap, within tolerance
    assert r["a"]["rid"] == 100  # 0 gap
    r5 = _rows(
        asof_join(
            left, right, left_time="t", right_time="t",
            left_by="k", right_by="k",
            tolerance=F.expr("INTERVAL 1 MINUTES"), right_tiebreak=["rid"],
        )
    )
    assert r5["b"]["rid"] is None  # 2 min gap rejected
    assert r5["b"]["t_asof"] is None


def test_deterministic_under_shuffle(frames):
    left, right = frames
    out1 = asof_join(
        left.repartition(7), right.repartition(3),
        left_time="t", right_time="t", left_by="k", right_by="k",
        right_tiebreak=["rid"],
    )
    out2 = asof_join(
        left.repartition(2), right.repartition(11),
        left_time="t", right_time="t", left_by="k", right_by="k",
        right_tiebreak=["rid"],
    )
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out2.collect()))


def test_single_shuffle_plan(frames):
    left, right = frames
    plan = asof_join(
        left, right, left_time="t", right_time="t",
        left_by="k", right_by="k",
    )._jdf.queryExecution().executedPlan().toString()
    # one hash exchange on the union (both sides share it), no join node
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
