"""Wall-clock streaming soak (VERDICT r14 #4, carried from r13 #6): the
state-GC and anchor-TTL paths had unit- and tool-scale evidence but
every gate ran bounded availableNow triggers. This harness runs the
eventtime gap filler CONTINUOUSLY — processingTime trigger, RocksDB
state store, a driver-side injector landing granules every few seconds
with full key churn — and samples streaming progress until the
requested wall clock elapses.

Workload shape:
  * every INJECT_EVERY_S seconds one granule lands: the ACTIVE key
    generation emits SECONDS_PER_INJECT 1 Hz slots (every 5th missing,
    so the filler holds real per-key state), event time advancing
    SECONDS_PER_INJECT per injection;
  * every CHURN_INJECTIONS injections the ENTIRE generation retires and
    a fresh disjoint key set takes over — total distinct keys grow
    linearly with wall clock while the active set stays constant. A
    retired key goes quiet forever: its buffered rows finalize as the
    watermark passes them, its anchor survives ``anchor_ttl_s`` past
    its last slot, and then EventTimeTimeout must GC it.

What the verdict JSON asserts:
  * ``state_flat``: state rows do not trend with TOTAL keys ever seen —
    the second-half linear slope of numRowsTotal per sample stays under
    a small fraction of the per-generation state footprint. If retired
    anchors leaked (the TTL/GC bug this soak exists to catch), every
    churn would stack +n_keys rows and the slope check fails.
  * ``anchors_expire``: max state rows over the steady half stays under
    (buffered-window rows + 2 generations of anchors) — i.e. anchors
    from generations retired beyond the TTL horizon are GONE.
  * ``watermark_advances``: the event-time watermark is strictly
    non-decreasing and covers most of the injected event-time span.
  * ``no_dup_slots``: output (key, ts) pairs are unique — fills never
    collide with reals across the whole soak (the r12 OOO signature).

Usage: python tools/stream_soak.py [minutes] [n_keys]
defaults: 30 minutes, 200 keys. Prints one sample line per trigger
interval and a final verdict JSON (tee to tools/logs_stream_soak_rN.txt).
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

INJECT_EVERY_S = 5.0  # wall seconds between granules
SECONDS_PER_INJECT = 20  # event-time span of one granule (1 Hz slots)
CHURN_INJECTIONS = 12  # generation lifetime: 12 injects = 60 s wall
WATERMARK_DELAY = "30 seconds"
ANCHOR_TTL_S = 45.0  # > dt_max; quiet-key anchors live 45 event-secs
DT_MAX_S = 1.2


def inject(spark, inp: str, gen: int, i: int, n_keys: int) -> int:
    """Land injection ``i`` for generation ``gen``: n_keys 1 Hz series,
    every 5th slot missing."""
    base = T0_US + i * SECONDS_PER_INJECT * 1_000_000
    df = (
        spark.range(n_keys * SECONDS_PER_INJECT)
        .select(
            F.concat(
                F.lit(f"g{gen}_k"), (F.col("id") % n_keys)
            ).alias("event_type"),
            F.timestamp_micros(
                F.lit(base)
                + (F.col("id") / n_keys).cast("long") * 1_000_000
            ).alias("ts"),
        )
        .filter((F.unix_micros("ts") / 1_000_000) % 5 != 4)
    )
    n = df.count()
    df.coalesce(1).write.mode("append").parquet(inp)
    return n


def latest_state(q) -> tuple[int | None, str | None, int]:
    """(numRowsTotal, watermark, batchId) from the freshest progress."""
    p = q.lastProgress
    if not p:
        return None, None, -1
    rows = None
    for sop in p.get("stateOperators", []):
        if sop.get("numRowsTotal") is not None:
            rows = sop["numRowsTotal"]
    wm = (p.get("eventTime") or {}).get("watermark")
    return rows, wm, p.get("batchId", -1)


def main() -> None:
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    work = "/root/repo/.scale/stream_soak"
    shutil.rmtree(work, ignore_errors=True)
    inp, ckpt, out = f"{work}/in", f"{work}/ckpt", f"{work}/out"
    os.makedirs(inp, exist_ok=True)

    spark = get_spark(app_name="stream-soak")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB
    )

    stream = stream_granules(spark, inp, SCHEMA, max_files_per_trigger=4)
    reg = fill_gaps_online(
        stream,
        key_col="event_type",
        step_us=1_000_000,
        dt_max_s=DT_MAX_S,
        order="eventtime",
        watermark_delay=WATERMARK_DELAY,
        anchor_ttl_s=ANCHOR_TTL_S,
    )
    # seed one granule BEFORE start so the source has a schema to bind
    inject(spark, inp, 0, 0, n_keys)
    q = (
        reg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime=f"{int(INJECT_EVERY_S)} seconds")
        .start()
    )

    t_end = time.time() + minutes * 60.0
    samples: list[dict] = []
    i = 1
    total_in = inject_total = 0
    try:
        while time.time() < t_end:
            gen = i // CHURN_INJECTIONS
            n = inject(spark, inp, gen, i, n_keys)
            total_in += n
            inject_total += 1
            i += 1
            time.sleep(INJECT_EVERY_S)
            rows, wm, batch = latest_state(q)
            samples.append(
                {
                    "wall_s": round(time.time() - (t_end - minutes * 60), 1),
                    "inject": i - 1,
                    "gen": gen,
                    "batch": batch,
                    "state_rows": rows,
                    "watermark": wm,
                    "total_in": total_in,
                }
            )
            print(json.dumps(samples[-1]), flush=True)
    finally:
        q.stop()

    # ---- verdict ----------------------------------------------------
    st = [
        (s["wall_s"], s["state_rows"])
        for s in samples
        if s["state_rows"] is not None
    ]
    half = st[len(st) // 2 :]
    # per-generation footprint: buffered rows (watermark window) +
    # anchors. One generation's full slot load:
    gen_rows = n_keys * SECONDS_PER_INJECT * CHURN_INJECTIONS
    # linear slope (rows per sample) over the steady half
    if len(half) >= 8:
        xs = [x for x, _ in half]
        ys = [y for _, y in half]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        denom = sum((x - mx) ** 2 for x in xs) or 1.0
        slope = sum((x - mx) * (y - my) for x, y in half) / denom
    else:
        slope = float("nan")
    # rows/wall-second the state would grow at if every retired
    # generation leaked its anchors:
    leak_rate = n_keys / (CHURN_INJECTIONS * INJECT_EVERY_S)
    peak_half = max(y for _, y in half) if half else None
    # numRowsTotal counts KEYS with state (one row per key: anchor +
    # pending buffer). Steady bound: the active generation + at most
    # two retired generations whose anchors sit inside the TTL horizon
    # (watermark delay + anchor TTL < 2 generation lifetimes of event
    # time), + slack for a generation straddling a churn boundary.
    bound = 4 * n_keys
    wms = [s["watermark"] for s in samples if s["watermark"]]
    wm_ok = all(a <= b for a, b in zip(wms, wms[1:])) and len(wms) > 2
    odf = spark.read.parquet(out)
    n_out = odf.count()
    n_dup = (
        odf.groupBy("key", "ts").count().filter("count > 1").count()
    )
    verdict = {
        "minutes": minutes,
        "n_keys": n_keys,
        "injections": inject_total,
        "generations": samples[-1]["gen"] + 1 if samples else 0,
        "total_input_rows": total_in,
        "out_rows": n_out,
        "dup_slots": n_dup,
        "state_peak_steady_half": peak_half,
        "state_bound": bound,
        "state_slope_rows_per_sample": round(slope, 2),
        "leak_rate_if_anchors_leaked": round(
            leak_rate * INJECT_EVERY_S, 2
        ),
        "watermark_first": wms[0] if wms else None,
        "watermark_last": wms[-1] if wms else None,
        "state_flat": bool(
            slope == slope and abs(slope) < 0.25 * leak_rate * INJECT_EVERY_S
        ),
        "anchors_expire": bool(
            peak_half is not None and peak_half <= bound
        ),
        "watermark_advances": bool(wm_ok),
        "no_dup_slots": n_dup == 0,
    }
    verdict["pass"] = all(
        verdict[k]
        for k in (
            "state_flat",
            "anchors_expire",
            "watermark_advances",
            "no_dup_slots",
        )
    )
    print("SOAK_VERDICT " + json.dumps(verdict), flush=True)


if __name__ == "__main__":
    main()
