"""Root-cause diagnosis for the r11 stream-state output divergence
(VERDICT r11 "What's wrong" #1): rocksdb 465k rows / 145k fills vs
hdfs-default 535k / 215k on deterministic identical input, both fill
counts above the ~75k constructible missing slots.

Hypothesis under test: FileStreamSource orders files by modification
time with ties broken arbitrarily; the 4 part-files of one phase share
an mtime, so with maxFilesPerTrigger=2 a micro-batch can contain a
LATER time-slice before an earlier one.  ``fill_gaps_online`` assumes
per-key in-order arrival: a forward jump makes it synthesize fills for
every cadence slot in between — including slots whose REAL records
arrive in the next batch.  Signature: real rows unique, extra fills
landing on slots that also have a real row.  Provider divergence is
then just two independent runs resolving the mtime tie differently —
not a state-store bug.

This script runs ONE provider at a reduced scale, then:
  1. decodes ckpt/offsets/* to print the exact file->batch grouping
     (proving in-order or out-of-order ingestion),
  2. splits output fills into expected-slot fills vs fills that
     collide with a real record (the out-of-order signature),
  3. prints a one-line verdict JSON.

Usage: python tools/stream_state_diag.py [n_keys] [phases] [provider]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ncagg_spark.session import get_spark  # noqa: E402
from tools.stream_state_scale import (  # noqa: E402
    T0_US,
    SECONDS_PER_PHASE,
    run_provider,
)


def decode_offsets(ckpt: str) -> list[tuple[int, list[str]]]:
    """Read the FileStreamSource offset log: for each batch, the files
    it committed to read (from the sources/0 metadata log)."""
    src_log = os.path.join(ckpt, "sources", "0")
    batches = []
    if not os.path.isdir(src_log):
        return batches
    for name in sorted(os.listdir(src_log), key=lambda s: int(s) if s.isdigit() else -1):
        if not name.isdigit():
            continue
        path = os.path.join(src_log, name)
        files = []
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line.startswith("{"):
                    try:
                        entry = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    p = entry.get("path", "")
                    files.append(os.path.basename(p))
        batches.append((int(name), files))
    return batches


def main() -> None:
    n_keys = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    phases = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    provider = sys.argv[3] if len(sys.argv) > 3 else "hdfs-default"

    spark = get_spark(app_name="stream-state-diag")
    spark.sparkContext.setLogLevel("ERROR")

    # ordered_mtimes=False reproduces the r11 fixture exactly: all
    # four part files of a phase share one mtime, so the tie-break is
    # arbitrary and ingestion can go out of event-time order
    res = run_provider(
        spark, provider, n_keys, phases, ordered_mtimes=False
    )
    work = f"/root/repo/.scale/stream_state/{provider}"
    out, ckpt, inp = f"{work}/out", f"{work}/ckpt", f"{work}/in"

    # 1. batch -> file grouping, with each file's time-slice range
    file_ranges = {}
    for fname in os.listdir(inp):
        if not fname.endswith(".parquet"):
            continue
        pdf = spark.read.parquet(os.path.join(inp, fname)).agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ).first()
        m = re.search(r"(part-\d+)", fname)
        # several phases reuse part-0000N names; key on full name
        file_ranges[fname] = (str(pdf["lo"]), str(pdf["hi"]), m.group(1) if m else "?")

    print("== input files (name -> ts range) ==")
    for fname, (lo, hi, _) in sorted(file_ranges.items(), key=lambda kv: kv[1][0]):
        print(f"  {fname}: {lo} .. {hi}")

    print("== micro-batch file grouping (ckpt offsets) ==")
    out_of_order = 0
    prev_hi = None
    for batch_id, files in decode_offsets(ckpt):
        # map each committed file back to its range by matching basename
        ranges = []
        for f in files:
            if f in file_ranges:
                lo, hi, _ = file_ranges[f]
                ranges.append((f, lo, hi))
        lo_all = min((r[1] for r in ranges), default=None)
        hi_all = max((r[2] for r in ranges), default=None)
        flag = ""
        if prev_hi is not None and lo_all is not None and lo_all < prev_hi:
            # this batch contains data older than what a previous batch
            # already advanced past -> out-of-order ACROSS batches
            flag = "  <-- overlaps/precedes an earlier batch"
        if prev_hi is not None and hi_all is not None and lo_all is not None:
            pass
        prev_hi = max(prev_hi, hi_all) if (prev_hi and hi_all) else (hi_all or prev_hi)
        print(f"  batch {batch_id}: {len(files)} files, ts {lo_all} .. {hi_all}{flag}")
        if flag:
            out_of_order += 1
        for fname, lo, hi in ranges:
            print(f"      {fname}  [{lo} .. {hi}]")

    # 2. output analysis: fills colliding with real slots
    o = spark.read.parquet(out)
    real = o.filter("NOT is_fill").select("key", "ts")
    fills = o.filter("is_fill").select("key", "ts")
    n_real, n_fill = real.count(), fills.count()
    dup_real = n_real - real.distinct().count()
    dup_fill = n_fill - fills.distinct().count()
    collide = fills.join(real, ["key", "ts"], "left_semi").count()
    # expected fills: interior slots (s%5==4, not phase-final) closed in
    # phase, phase-final slots closed by the next phase's first record;
    # the very last slot of the run is never closed.
    expected_fill = n_keys * (phases * 3 + (phases - 1))
    expected_real = n_keys * SECONDS_PER_PHASE * phases * 4 // 5

    verdict = {
        "provider": provider,
        "n_keys": n_keys,
        "phases": phases,
        "real_rows": n_real,
        "expected_real": expected_real,
        "dup_real_rows": dup_real,
        "fill_rows": n_fill,
        "expected_fill": expected_fill,
        "dup_fill_rows": dup_fill,
        "fills_colliding_with_real_slot": collide,
        "out_of_order_batches": out_of_order,
        "hypothesis_confirmed": bool(
            n_fill > expected_fill and collide > 0 and dup_real == 0
        ),
    }
    print("== verdict ==")
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()
