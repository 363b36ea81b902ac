"""State-store scale evidence for the stateful gap filler (VERDICT r10
#7): run `fill_gaps_online` on the RocksDB state store provider and log
per-phase state size — it must stay O(open gaps) = O(active keys), flat
while total processed records grow phase over phase.

Why it matters at 100 TB: the default HDFSBackedStateStoreProvider
keeps every key's state as JVM objects on the executor heap — at
100 TB-pipeline key cardinality that's a driver-of-OOM; RocksDB keeps
state off-heap/on-disk with incremental checkpointing. The operator
needs ZERO code changes — the provider is session conf
(`spark.sql.streaming.stateStore.providerClass`), set per run below.

Fixture: N_KEYS independent 1 Hz series, landed in PHASES time-slices
(same keys, later windows — so per-key state survives across phases and
every phase's input re-keys ALL keys). Between phases the stream stops
and resumes from the checkpoint (the 24/7 operational shape). Per phase
we record: input rows, filled rows, state rows (numRowsTotal — the
O(open gaps) claim: == N_KEYS, flat), numRowsUpdated, RocksDB file
size, wall.

Usage: python tools/stream_state_scale.py [n_keys] [phases]
Prints a markdown table + one JSON line per provider (rocksdb, then the
default HDFS-backed for the same workload as a cross-check).
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
from ncagg_spark.streaming.stateful import fill_gaps_online  # noqa: E402

T0_US = 1_704_153_600_000_000  # 2024-01-02 UTC midnight
ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
SCHEMA = "event_type string, ts timestamp"
SECONDS_PER_PHASE = 20  # per key per phase; every 5th second missing


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


def run_provider(
    spark,
    provider: str,
    n_keys: int,
    phases: int,
    *,
    phased: bool = True,
    ordered_mtimes: bool = True,
) -> dict:
    """One full workload run. ``phased=True`` stops and resumes the
    query between phases (the 24/7 operational shape); ``phased=False``
    lands ALL phases' files first and runs a single query — the
    cross-restart equality control."""
    work = f"/root/repo/.scale/stream_state/{provider}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    inp, ckpt, out = f"{work}/in", f"{work}/ckpt", f"{work}/out"
    os.makedirs(inp, exist_ok=True)

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
        for phase in range(phases if phased else 1):
            if phased:
                total_in += write_phase(
                    spark, inp, n_keys, phase,
                    ordered_mtimes=ordered_mtimes,
                )
            stream = stream_granules(
                spark, inp, SCHEMA, max_files_per_trigger=2
            )
            reg = fill_gaps_online(
                stream,
                key_col="event_type",
                step_us=1_000_000,
                dt_max_s=1.2,
                timeout="none",  # availableNow needs NoTimeout (r10)
            )
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
                for op in p.get("stateOperators", []):
                    if op.get("numRowsTotal") is not None:
                        state_rows = op["numRowsTotal"]
                        updated = op.get("numRowsUpdated")
                        cm = op.get("customMetrics") or {}
                        rdb_bytes = cm.get("rocksdbSstFileSize") or (
                            cm.get("rocksdbTotalMemoryUsage")
                        )
            rows.append(
                {
                    "phase": phase + 1,
                    "total_input_rows": total_in,
                    "state_rows": state_rows,
                    "rows_updated": updated,
                    "rocksdb_bytes": rdb_bytes,
                    "wall_s": round(wall, 2),
                }
            )
            print(f"  {provider} phase {phase + 1}: {rows[-1]}")
    finally:
        if saved is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", saved
            )
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
    n_out = spark.read.parquet(out).count()
    n_fill = (
        spark.read.parquet(out).filter("is_fill").count()
    )
    return {
        "provider": provider,
        "n_keys": n_keys,
        "phases": rows,
        "out_rows": n_out,
        "filled_rows": n_fill,
    }


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    phases = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark(app_name="stream-state-scale")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for provider in ("rocksdb", "hdfs-default"):
        print(f"provider {provider}:")
        results.append(run_provider(spark, provider, n_keys, phases))
    # cross-restart control: same workload, one query, no stop/resume
    print("provider hdfs-oneshot (no stop/resume):")
    results.append(
        run_provider(
            spark, "hdfs-oneshot", n_keys, phases, phased=False
        )
    )

    print()
    print(
        "| provider | phase | total input rows | state rows "
        "| rows updated | rocksdb bytes | wall s |"
    )
    print("|---|---|---|---|---|---|---|")
    for res in results:
        for r in res["phases"]:
            print(
                f"| {res['provider']} | {r['phase']} "
                f"| {r['total_input_rows']} | {r['state_rows']} "
                f"| {r['rows_updated']} | {r['rocksdb_bytes']} "
                f"| {r['wall_s']} |"
            )
    for res in results:
        print(json.dumps(res))

    # equality verdict: all three runs must produce the same output
    # multiset, and fills must equal the constructible missing slots
    # (3 interior per key per phase + phases-1 boundary slots; the
    # run's final cadence slot is never closed)
    outs = []
    for res in results:
        p = f"/root/repo/.scale/stream_state/{res['provider']}/out"
        outs.append(
            spark.read.parquet(p)
            .groupBy("key", "ts", "is_fill")
            .count()
        )
    eq_01 = outs[0].exceptAll(outs[1]).count() == 0 and (
        outs[1].exceptAll(outs[0]).count() == 0
    )
    eq_02 = outs[0].exceptAll(outs[2]).count() == 0 and (
        outs[2].exceptAll(outs[0]).count() == 0
    )
    expected_fill = n_keys * (phases * 3 + (phases - 1))
    print(
        json.dumps(
            {
                "equal_rocksdb_vs_default": eq_01,
                "equal_phased_vs_oneshot": eq_02,
                "expected_fill": expected_fill,
                "fills_ok": all(
                    r["filled_rows"] == expected_fill for r in results
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
