"""Sessionization and connected-components duplicate clustering."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ncagg_spark.operators.sessionize import session_summary, sessionize
from ncagg_spark.pipeline.dedup import connected_components

UTC = dt.timezone.utc


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, 0, tzinfo=UTC)


def _events(spark):
    rows = [
        # user 1: events at t=0,1,2 then a 20-min gap, then 25,26
        (1, _ts(0), 10),
        (2, _ts(1), 10),
        (3, _ts(2), 10),
        (4, _ts(25), 10),
        (5, _ts(26), 10),
        # user 2: single event
        (6, _ts(5), 20),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    )


def test_sessionize_splits_on_gap(spark):
    out = sessionize(
        _events(spark), "ts", "user_id", gap_us=10 * 60 * 1_000_000,
        tiebreak=["event_id"],
    )
    got = {
        r["event_id"]: r["session_idx"]
        for r in out.collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 1}


def test_session_summary_counts_and_bounds(spark):
    out = session_summary(
        _events(spark), "ts", "user_id", gap_us=10 * 60 * 1_000_000,
        tiebreak=["event_id"],
    ).collect()
    by_key = {(r["user_id"], r["session_idx"]): r for r in out}
    assert len(by_key) == 3
    s1 = by_key[(10, 1)]
    assert s1["n_events"] == 3
    assert s1["session_start"] == _ts(0).replace(tzinfo=None)
    assert s1["session_end"] == _ts(2).replace(tzinfo=None)
    assert by_key[(10, 2)]["n_events"] == 2
    assert by_key[(20, 1)]["n_events"] == 1


def test_sessionize_ties_deterministic(spark):
    # two events at the same timestamp: tiebreak column orders them,
    # and both land in the same session regardless of shuffle layout
    rows = [(2, _ts(0), 1), (1, _ts(0), 1)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    out = sessionize(df, "ts", "user_id", gap_us=60_000_000, tiebreak=["event_id"])
    assert {r["session_idx"] for r in out.collect()} == {1}


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4 (transitive closure -> one cluster), pair 10-11,
    # pair 20-21: three clusters labeled by their min member
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)],
        "id_a long, id_b long",
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(pairs, num_partitions=2).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_near_dedup_keeps_one_per_cluster(spark):
    from ncagg_spark.pipeline.dedup import near_dedup

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3, 4, 10, 11, 99)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["n_members"]
        for r in near_dedup(docs, pairs, num_partitions=2).collect()
    }
    # cluster {1,2,3,4} -> keep 1 (size 4); {10,11} -> keep 10 (size 2);
    # 99 untouched by the graph -> kept, size 1
    assert got == {1: 4, 10: 2, 99: 1}


def test_connected_components_long_chain_converges(spark):
    # a 24-node chain exercises the pointer-jumping path: min label must
    # traverse the full diameter well within max_iter rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 124)], "id_a long, id_b long"
    )
    out = connected_components(pairs, max_iter=10, num_partitions=2)
    labels = {r["cluster_id"] for r in out.collect()}
    assert labels == {100}
    assert out.count() == 25


def test_cc_agrees_with_union_find_oracle(spark):
    """Third-implementation agreement (round 6): the Spark pointer-
    jumping CC and a driver-side union-find must produce identical
    min-label clusterings of the real simhash pair graph — the check
    that scales past where the DuckDB recursive oracle is tractable
    (tools/verify_cc.py runs the same comparison at sf1.0)."""
    import numpy as np

    import __spark_entry__ as entry
    from tools.verify_cc import union_find_min_labels

    sf = "/root/testdata/sf0.01"
    pdf = (
        entry.queries()["doc_simhash_near_dup"](spark, sf)
        .select("id_a", "id_b")
        .toPandas()
    )
    pairs = pdf.to_numpy(dtype=np.int64).reshape(-1, 2)
    expect = union_find_min_labels(pairs)
    got = {
        int(r["doc_id"]): int(r["cluster_id"])
        for r in entry.queries()["doc_dup_clusters"](spark, sf).collect()
    }
    assert got == expect
