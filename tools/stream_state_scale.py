"""State-store scale evidence for the STATEFUL STREAMING operators
(VERDICT r10 #7; extended r13 per VERDICT r12 #5): run each operator on
the RocksDB state store provider and log per-phase state size — it must
stay O(open state) = O(active keys / open sessions), flat while total
processed records grow phase over phase.

Operators covered (one section each):

* ``arrival``   — `fill_gaps_online` (arrival order, the r10 original)
* ``eventtime`` — `fill_gaps_online(order="eventtime")` (r12): buffers
  in state, finalizes below the watermark; a far-future sentinel key
  flushes the tail so the output must equal the arrival-mode
  constructible set EXACTLY (cross-op equality is asserted too)
* ``session``   — `sessionize_stream` (r12): native session windows;
  state is one row per OPEN session

Why it matters at 100 TB: the default HDFSBackedStateStoreProvider
keeps every key's state as JVM objects on the executor heap — at
100 TB-pipeline key cardinality that's a driver-of-OOM; RocksDB keeps
state off-heap/on-disk with incremental checkpointing. The operators
need ZERO code changes — the provider is session conf
(`spark.sql.streaming.stateStore.providerClass`), set per run below.

Fixture: N_KEYS independent 1 Hz series, landed in PHASES time-slices
(same keys, later windows — so per-key state survives across phases and
every phase's input re-keys ALL keys). Between phases the stream stops
and resumes from the checkpoint (the 24/7 operational shape). Per phase
we record: input rows, filled/emitted rows, state rows (numRowsTotal —
the O(open state) claim), numRowsUpdated, RocksDB file size, wall.

Usage: python tools/stream_state_scale.py [n_keys] [phases] [ops]
(ops = comma list of arrival,eventtime,session; default all three)
Prints a markdown table + one JSON line per (op, provider) and an
equality-verdict JSON per op: rocksdb == hdfs-default == oneshot
(single query, no stop/resume) on the same workload.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ncagg_spark.session import get_spark  # noqa: E402
from ncagg_spark.streaming.regularize import stream_granules  # noqa: E402
from ncagg_spark.streaming.sessionize import sessionize_stream  # noqa: E402
from ncagg_spark.streaming.stateful import fill_gaps_online  # noqa: E402

T0_US = 1_704_153_600_000_000  # 2024-01-02 UTC midnight
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
SCHEMA = "event_type string, ts timestamp"
SECONDS_PER_PHASE = 20  # per key per phase; every 5th second missing
SENTINEL_KEY = "zzzz__wm_sentinel"
WATERMARK_DELAY = "30 seconds"


def write_phase(
    spark, inp: str, n_keys: int, phase: int, *, ordered_mtimes: bool = True
) -> int:
    """Land one phase: n_keys series, 1 Hz, every 5th slot missing (so
    the filler keeps real per-key state), continuing each key's
    timeline from the previous phase.

    Each part file gets a DISTINCT mtime increasing in event-time
    order (r12): FileStreamSource orders new files by modification
    time but breaks ties arbitrarily, so equal-mtime files can land in
    micro-batches out of event-time order — which the arrival-order
    filler misreads as gaps (tools/stream_state_diag.py). With
    strictly increasing mtimes the listing order is deterministic and
    event-time-monotone (measured: mtime order honored, name order
    ignored), which is the arrival-mode contract."""
    base = T0_US + phase * SECONDS_PER_PHASE * 1_000_000
    df = (
        spark.range(n_keys * SECONDS_PER_PHASE)
        .select(
            F.concat(F.lit("k"), (F.col("id") % n_keys)).alias(
                "event_type"
            ),
            F.timestamp_micros(
                F.lit(base)
                + (F.col("id") / n_keys).cast("long") * 1_000_000
            ).alias("ts"),
        )
        .filter((F.unix_micros("ts") / 1_000_000) % 5 != 4)
    )
    n = df.count()
    before = set(os.listdir(inp))
    df.coalesce(4).write.mode("append").parquet(inp)
    if not ordered_mtimes:
        # tools/stream_state_diag.py uses this to reproduce the r11
        # bug: equal mtimes -> arbitrary tie-break -> out-of-order
        return n
    new_files = [
        f
        for f in os.listdir(inp)
        if f.endswith(".parquet") and f not in before
    ]
    # order the new files by their data's min ts, then stamp strictly
    # increasing mtimes (100 s apart per file, phases well separated)
    ranked = sorted(
        new_files,
        key=lambda f: spark.read.parquet(os.path.join(inp, f))
        .agg(F.min("ts"))
        .first()[0],
    )
    t_base = 1_700_000_000 + phase * 10_000
    for i, f in enumerate(ranked):
        p = os.path.join(inp, f)
        os.utime(p, (t_base + 100 * i, t_base + 100 * i))
    return n


def write_sentinel(spark, inp: str, n_keys: int, phases: int) -> None:
    """Far-future sentinel granule (the stream_gap_fill_ooo pattern):
    two records on a key absent from the data, 100 s past the last real
    record — the watermark (delay 30 s) then clears every real record +
    dt_max, flushing eventtime-buffered state and closing every real
    session. Stamped with an mtime after every phase file."""
    us = T0_US + (phases * SECONDS_PER_PHASE + 100) * 1_000_000
    df = spark.createDataFrame(
        [(SENTINEL_KEY, us), (SENTINEL_KEY, us + 1_000_000)],
        "event_type string, us long",
    ).select("event_type", F.timestamp_micros("us").alias("ts"))
    before = set(os.listdir(inp))
    df.coalesce(1).write.mode("append").parquet(inp)
    t = 1_700_000_000 + (phases + 1) * 10_000
    for f in os.listdir(inp):
        if f.endswith(".parquet") and f not in before:
            os.utime(os.path.join(inp, f), (t, t))


def _make_reg(op: str, stream):
    if op == "arrival":
        return fill_gaps_online(
            stream,
            key_col="event_type",
            step_us=1_000_000,
            dt_max_s=1.2,
            timeout="none",  # availableNow needs NoTimeout (r10)
        )
    if op == "eventtime":
        return fill_gaps_online(
            stream,
            key_col="event_type",
            step_us=1_000_000,
            dt_max_s=1.2,
            order="eventtime",
            watermark_delay=WATERMARK_DELAY,
        )
    if op == "session":
        return sessionize_stream(
            stream,
            key_col="event_type",
            gap_s=1.2,
            watermark_delay=WATERMARK_DELAY,
        )
    raise ValueError(op)


def run_provider(
    spark,
    provider: str,
    n_keys: int,
    phases: int,
    *,
    op: str = "arrival",
    phased: bool = True,
    ordered_mtimes: bool = True,
) -> dict:
    """One full workload run. ``phased=True`` stops and resumes the
    query between phases (the 24/7 operational shape); ``phased=False``
    lands ALL phases' files first and runs a single query — the
    cross-restart equality control. Ops other than ``arrival`` append a
    sentinel granule (and one extra drain cycle when phased) so the
    watermark flushes the tail."""
    work = f"/root/repo/.scale/stream_state/{op}-{provider}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    inp, ckpt, out = f"{work}/in", f"{work}/ckpt", f"{work}/out"
    os.makedirs(inp, exist_ok=True)
    needs_sentinel = op != "arrival"

    saved = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    if provider.startswith("rocksdb"):
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB
        )
    rows = []
    total_in = 0
    try:
        if not phased:
            for phase in range(phases):
                total_in += write_phase(
                    spark, inp, n_keys, phase,
                    ordered_mtimes=ordered_mtimes,
                )
            if needs_sentinel:
                write_sentinel(spark, inp, n_keys, phases)
        n_cycles = (phases + (1 if needs_sentinel else 0)) if phased else 1
        for cycle in range(n_cycles):
            if phased:
                if cycle < phases:
                    total_in += write_phase(
                        spark, inp, n_keys, cycle,
                        ordered_mtimes=ordered_mtimes,
                    )
                else:
                    write_sentinel(spark, inp, n_keys, phases)
            stream = stream_granules(
                spark, inp, SCHEMA, max_files_per_trigger=2
            )
            reg = _make_reg(op, stream)
            t0 = time.time()
            q = (
                reg.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
            wall = time.time() - t0
            state_rows = updated = rdb_bytes = None
            for p in q.recentProgress:
                for sop in p.get("stateOperators", []):
                    if sop.get("numRowsTotal") is not None:
                        state_rows = sop["numRowsTotal"]
                        updated = sop.get("numRowsUpdated")
                        cm = sop.get("customMetrics") or {}
                        rdb_bytes = cm.get("rocksdbSstFileSize") or (
                            cm.get("rocksdbTotalMemoryUsage")
                        )
            rows.append(
                {
                    "phase": cycle + 1,
                    "total_input_rows": total_in,
                    "state_rows": state_rows,
                    "rows_updated": updated,
                    "rocksdb_bytes": rdb_bytes,
                    "wall_s": round(wall, 2),
                }
            )
            print(f"  {op}/{provider} phase {cycle + 1}: {rows[-1]}")
    finally:
        if saved is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", saved
            )
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
    odf = spark.read.parquet(out)
    key_col = "key"
    odf = odf.filter(F.col(key_col) != SENTINEL_KEY)
    n_out = odf.count()
    n_fill = odf.filter("is_fill").count() if op != "session" else None
    return {
        "op": op,
        "provider": provider,
        "n_keys": n_keys,
        "phases": rows,
        "out_rows": n_out,
        "filled_rows": n_fill,
    }


def _out_df(spark, op: str, provider: str):
    p = f"/root/repo/.scale/stream_state/{op}-{provider}/out"
    df = spark.read.parquet(p).filter(F.col("key") != SENTINEL_KEY)
    if op == "session":
        return df.groupBy(
            "key", "session_start", "session_end", "n_events"
        ).count()
    return df.groupBy("key", "ts", "is_fill").count()


def _same(a, b) -> bool:
    return (
        a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    )


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    phases = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ops = (
        sys.argv[3].split(",")
        if len(sys.argv) > 3
        else ["arrival", "eventtime", "session"]
    )
    spark = get_spark(app_name="stream-state-scale")
    spark.sparkContext.setLogLevel("ERROR")

    all_results: dict[str, list] = {}
    for op in ops:
        results = []
        for provider in ("rocksdb", "hdfs-default"):
            print(f"op {op} provider {provider}:")
            results.append(
                run_provider(spark, provider, n_keys, phases, op=op)
            )
        print(f"op {op} provider hdfs-oneshot (no stop/resume):")
        results.append(
            run_provider(
                spark, "hdfs-oneshot", n_keys, phases, op=op,
                phased=False,
            )
        )
        all_results[op] = results

    print()
    print(
        "| op | provider | phase | total input rows | state rows "
        "| rows updated | rocksdb bytes | wall s |"
    )
    print("|---|---|---|---|---|---|---|---|")
    for op, results in all_results.items():
        for res in results:
            for r in res["phases"]:
                print(
                    f"| {op} | {res['provider']} | {r['phase']} "
                    f"| {r['total_input_rows']} | {r['state_rows']} "
                    f"| {r['rows_updated']} | {r['rocksdb_bytes']} "
                    f"| {r['wall_s']} |"
                )
    for results in all_results.values():
        for res in results:
            print(json.dumps(res))

    # equality verdicts: per op, all three runs must produce the same
    # output multiset; for the gap fillers, fills must equal the
    # constructible missing slots (3 interior per key per phase +
    # phases-1 boundary slots; the final cadence slot is never closed);
    # eventtime (sentinel-flushed) must ALSO equal arrival exactly
    expected_fill = n_keys * (phases * 3 + (phases - 1))
    outs = {
        op: [_out_df(spark, op, res["provider"]) for res in results]
        for op, results in all_results.items()
    }
    for op, results in all_results.items():
        verdict = {
            "op": op,
            "equal_rocksdb_vs_default": _same(outs[op][0], outs[op][1]),
            "equal_phased_vs_oneshot": _same(outs[op][0], outs[op][2]),
        }
        if op != "session":
            verdict["expected_fill"] = expected_fill
            verdict["fills_ok"] = all(
                r["filled_rows"] == expected_fill for r in results
            )
        if op == "session":
            # 4 closed sessions (of 4 events) per key per phase once
            # the sentinel flushes the tail
            expected_sessions = n_keys * 4 * phases
            verdict["expected_sessions"] = expected_sessions
            verdict["sessions_ok"] = all(
                r["out_rows"] == expected_sessions for r in results
            )
        print(json.dumps(verdict))
    if "arrival" in outs and "eventtime" in outs:
        print(
            json.dumps(
                {
                    "equal_eventtime_vs_arrival": _same(
                        outs["arrival"][0], outs["eventtime"][0]
                    )
                }
            )
        )


if __name__ == "__main__":
    main()
