"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": <sf>, ...}

Each query is timed end-to-end with ``df.write.format("noop")`` — the
standard Spark benchmarking sink: it fully evaluates every output column
(a bare count() would let Catalyst prune the expensive expressions and
measure nothing) without driver-side row conversion.

Contention-proofing (VERDICT r6 #1 — three rounds of verdict time went
to re-litigating box noise):

* every query runs ``$SPARK_GRAFT_BENCH_REPEATS`` (default 3) times
  in-process and reports the MEDIAN; the per-query value is no longer
  a single sample;
* the 1-min load average is recorded before and after the run
  (``load_1m_start`` / ``load_1m_end``) so drift can be attributed;
* if the box is busy at start (1-min load > 0.5) the bench waits up to
  ``$SPARK_GRAFT_BENCH_SETTLE`` seconds (default 180) for it to drain;
  if it never settles the run proceeds but is marked
  ``"certified": false`` and the process exits 75 (EX_TEMPFAIL) AFTER
  printing the JSON line — numbers from a contended box are recorded
  but not certified;
* ``cold_total`` (sum of first-repeat timings) is reported alongside
  the median total so plan-compilation cost stays visible;
* a fixed-work machine-speed CANARY (single-core Python checksum loop +
  an all-cores 2B-row Spark range-agg) runs immediately before AND
  after the queries (r13, VERDICT r12 #2: box throughput swings ~1.5x
  between sessions, so raw cross-round totals are noise). Certification
  now requires a clean END state too: ``load_1m_end`` <= 6.0 after a
  short settle (our own tail work decays; foreign load does not),
  ``load_1m_end_raw`` <= 24.0 (ADVICE r13: a foreign job that quits
  just as the bench ends can wait out the settle window — the raw
  pre-settle value still carries its footprint), and end canary
  within 1.5x of the start canary. Cross-round comparisons
  normalize by the canary ratio — the rule and the reference values
  live in SCALE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from ncagg_spark.session import get_spark

# Representative, scale-sensitive subset of queries(): the reference's
# core regularization path, the relational star-schema set, the dedup /
# similarity / text pipeline ops. Every query is evaluated through the
# noop sink (full output materialization, no driver-side rows).
BENCH_QUERIES = [
    "agg_regularize_day",
    "agg_regularize_anchored",
    "agg_dedup_cadence",
    "agg_manifest_attrs",
    "evt_sessionize",
    "evt_asof_purchase",
    "rel_q1_pricing",
    "rel_q3_topk",
    "rel_q5_nation_volume",
    "rel_window_topk",
    "rel_rollup",
    "rel_anti_join",
    "agg_multidim",
    "doc_exact_dedup",
    "doc_text_stats",
    "doc_minhash_sig",
    "doc_lsh_pairs",
    "doc_simhash",
    "emb_brute_topk",
    "emb_ivf_topk",
]

# The heaviest non-headline queries (VERDICT r7 #8) — timed only when
# SPARK_GRAFT_BENCH_EXTENDED=1 (the sf10 scale-regression run) so the
# headline total stays comparable across rounds. Recorded under
# "extended" in the JSON, never summed into "value".
EXTENDED_QUERIES = [
    "doc_clean_corpus",
    "doc_dup_clusters",
    "doc_near_dedup",
    "emb_pq_topk",
    # r10: the IVFADC composition, timed next to the flat ADC scan above
    # — the sf10 run is the direct evidence that probing ~1/4 of sqrt(N)
    # cells cuts the exp-0.69 flat scan (VERDICT r9 #4)
    "emb_ivfpq_topk",
    "doc_dup_spans",
    # r11: the new pipeline operators — extended (not headline) so the
    # round-over-round headline total stays comparable
    "emb_semdedup",
    "doc_lm_score",
    "doc_bm25_topk",
    "doc_dsir_sample",
    "doc_pack_sequences",
    "doc_repetition_filter",
    # r12: the count_col packing path
    "doc_pack_bpeish",
    # r13 (VERDICT r12 #6): the r12 operators join the extended bench.
    # The timers wrap fn() itself, so eager-at-construction work
    # (doc_len_quantiles' histogram passes) and the streaming queries'
    # full availableNow runs ARE inside the measured interval — the
    # trailing noop write only re-materializes their small results.
    "doc_len_quantiles",
    "stream_gap_fill_ooo",
    "stream_sessionize",
    # r14: deterministic stratified sample + split (pure scan-side
    # projection+filter — its scale curve should track the raw scan)
    "doc_stratified_split",
    # r14: count-driven corpus mixing (one count per source + union)
    "doc_mix_corpora",
]

LOAD_CERTIFY_MAX = 0.5
# the bench's own 32-thread bursts leave a ~2.0 1-min load at the end of
# a clean run (measured r12); a concurrent heavy job pushes it well past
# this bound
LOAD_END_CERTIFY_MAX = 6.0
# ADVICE r13: the settle loop (below) waits out the decay of our OWN
# tail work before applying LOAD_END_CERTIFY_MAX — but a heavy FOREIGN
# job that contended with the final queries and terminated just as the
# bench ended would also settle within the window. Gate the RAW
# (pre-settle) value too, with a bound above the bench's own footprint
# (observed raw end loads on clean runs: ~7.5-10.9 after the extended
# streaming queries) but below what a competing many-core job adds.
LOAD_END_RAW_CERTIFY_MAX = 24.0
# a box whose throughput degraded mid-run shows an inflated end canary;
# allow normal jitter, catch a 1.5x-slowdown session (the r12 failure
# mode: identical code measured 12.3-18.6 s across sessions)
CANARY_DRIFT_MAX = 1.5


def _canary(spark) -> dict:
    """Fixed-work machine-speed probe (VERDICT r12 #2): cross-round
    bench totals are only comparable after normalizing by box speed,
    because the box's effective throughput swings ~1.5x between
    sessions. Two probes, seconds each on a healthy box:

    * ``py_sec`` — a single-core pure-Python checksum loop (10M
      iterations, no allocation): interpreter + one core.
    * ``spark_sec`` — a 2B-row ``spark.range`` sum through the noop
      sink: JVM whole-stage codegen across all local[] cores — the
      same substrate every benched query runs on.

    The normalization rule lives in SCALE.md: compare
    ``total * (ref_canary / this_canary)`` per probe, with the
    reference canary pinned from the round that set the band.
    """
    t0 = time.perf_counter()
    acc = 0
    for i in range(10_000_000):
        acc = (acc * 1315423911 + i) & 0xFFFFFFFFFFFF
    py_sec = time.perf_counter() - t0
    # untimed small run first: the probe must measure the box, not the
    # one-time codegen/JIT warmup of the range-agg plan shape
    spark.range(0, 10_000_000).selectExpr(
        "sum(id * 3 + 1) as s"
    ).write.format("noop").mode("overwrite").save()
    t0 = time.perf_counter()
    spark.range(0, 2_000_000_000).selectExpr(
        "sum(id * 3 + 1) as s"
    ).write.format("noop").mode("overwrite").save()
    spark_sec = time.perf_counter() - t0
    return {
        "py_sec": round(py_sec, 3),
        "spark_sec": round(spark_sec, 3),
    }


def _load_1m() -> float:
    try:
        return os.getloadavg()[0]
    except OSError:  # platforms without getloadavg
        return 0.0


def _settle(max_wait_sec: float) -> float:
    """Wait (poll 5 s) for the 1-min load to drop under the certify
    threshold; returns the load observed when we stop waiting."""
    deadline = time.time() + max_wait_sec
    load = _load_1m()
    while load > LOAD_CERTIFY_MAX and time.time() < deadline:
        print(
            f"# load_1m={load:.2f} > {LOAD_CERTIFY_MAX} — waiting for the "
            "box to drain...",
            file=sys.stderr,
        )
        time.sleep(5)
        load = _load_1m()
    return load


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    settle = float(os.environ.get("SPARK_GRAFT_BENCH_SETTLE", "180"))

    load_start = _settle(settle)
    certified = load_start <= LOAD_CERTIFY_MAX

    spark = get_spark(app_name="ncagg-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Scaling legibility (VERDICT r15 #1): prove to the driver that
    # $SPARK_GRAFT_CPUS reached the session — the JSON line carries the
    # RESOLVED master and scheduler parallelism, so an 8-core companion
    # run is distinguishable from a hardcoded master by artifact alone.
    parallelism = spark.sparkContext.defaultParallelism
    master = spark.sparkContext.master

    # Warm up the JVM / parquet footer caches so the first measured query
    # isn't charged for session spin-up (steady-state numbers).
    for t in (
        "events", "lineitem", "orders", "customer", "supplier",
        "nation", "region", "part", "documents", "embeddings",
    ):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.format("noop").mode(
            "overwrite"
        ).save()

    # machine-speed canary immediately before the queries (and again
    # after them): fixed work, so the measured seconds ARE the box's
    # speed — cross-round totals normalize by the ratio (SCALE.md)
    canary_start = _canary(spark)
    print(f"# canary(start): {canary_start}", file=sys.stderr)

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    spread: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        samples = []
        for _ in range(repeats):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 3)
        cold[name] = round(samples[0], 3)
        spread[name] = round(
            (max(samples) - min(samples)) / max(timings[name], 1e-9), 3
        )
        print(
            f"# {name}: median {timings[name]:.3f}s over {repeats} "
            f"(cold {cold[name]:.3f}s, spread {spread[name]:.0%})",
            file=sys.stderr,
        )

    extended: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_EXTENDED"):
        for name in EXTENDED_QUERIES:
            fn = qs[name]
            samples = []
            for _ in range(repeats):
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.time() - t0)
            extended[name] = round(statistics.median(samples), 3)
            print(
                f"# [extended] {name}: median {extended[name]:.3f}s "
                f"over {repeats}",
                file=sys.stderr,
            )

    canary_end = _canary(spark)
    print(f"# canary(end): {canary_end}", file=sys.stderr)
    # the bench's own final queries (the streaming extended runs
    # especially) leave a high 1-min load that decays within ~a
    # minute; FOREIGN load does not. Poll briefly so the end-load
    # check certifies the BOX, not our own tail work (raw value is
    # recorded alongside).
    load_end_raw = _load_1m()
    load_end = load_end_raw
    settle_deadline = time.time() + 150
    while load_end > LOAD_END_CERTIFY_MAX and time.time() < settle_deadline:
        time.sleep(10)
        load_end = _load_1m()
    total = round(sum(timings.values()), 3)
    # certification (VERDICT r12 #2): start-load alone could not see a
    # box that slowed down mid-run — require the END state to be clean
    # too: end load bounded (the bench's own footprint is ~2.0) and the
    # end canary within CANARY_DRIFT_MAX of the start canary
    reasons = []
    if load_start > LOAD_CERTIFY_MAX:
        reasons.append(
            f"load_1m_start {load_start:.2f} > {LOAD_CERTIFY_MAX}"
        )
    if load_end > LOAD_END_CERTIFY_MAX:
        reasons.append(
            f"load_1m_end {load_end:.2f} > {LOAD_END_CERTIFY_MAX}"
        )
    if load_end_raw > LOAD_END_RAW_CERTIFY_MAX:
        # a contended tail cannot certify purely by waiting out the
        # 1-min decay (ADVICE r13): the raw value carries the foreign
        # job's footprint even after it exits
        reasons.append(
            f"load_1m_end_raw {load_end_raw:.2f} > "
            f"{LOAD_END_RAW_CERTIFY_MAX}: heavy contention during the "
            "final queries"
        )
    # py_sec is symmetric-stable within a clean run (observed <= 1.15x
    # swing), so EITHER direction of a big swing means the box changed
    # speed mid-run and the per-query medians are not comparable — a
    # run that STARTED degraded and recovered is as uncertifiable as
    # one that slowed down (observed: py 1.78 -> 0.996 start-slow run).
    # spark_sec keeps improving with deep JIT across a long run, so
    # only UPWARD drift is a red flag there.
    py_hi = max(canary_start["py_sec"], canary_end["py_sec"])
    py_lo = max(min(canary_start["py_sec"], canary_end["py_sec"]), 1e-9)
    if py_hi > CANARY_DRIFT_MAX * py_lo:
        reasons.append(
            f"canary py_sec swung {canary_start['py_sec']} -> "
            f"{canary_end['py_sec']} (> {CANARY_DRIFT_MAX}x either "
            "way): box speed changed mid-run"
        )
    if canary_end["spark_sec"] > CANARY_DRIFT_MAX * max(
        canary_start["spark_sec"], 1e-9
    ):
        reasons.append(
            f"canary spark_sec drifted {canary_start['spark_sec']} -> "
            f"{canary_end['spark_sec']} (> {CANARY_DRIFT_MAX}x): box "
            "slowed down mid-run"
        )
    certified = not reasons
    for r in reasons:
        print(f"# NOT CERTIFIED: {r}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "repeats": repeats,
                "cold_total": round(sum(cold.values()), 3),
                "max_spread": max(spread.values()) if spread else 0.0,
                "parallelism": parallelism,
                "master": master,
                "load_1m_start": round(load_start, 3),
                "load_1m_end": round(load_end, 3),
                "load_1m_end_raw": round(load_end_raw, 3),
                "canary_start": canary_start,
                "canary_end": canary_end,
                "certified": certified,
                **({"uncertified_reasons": reasons} if reasons else {}),
                **({"extended": extended} if extended else {}),
            }
        )
    )
    if not certified:
        sys.exit(75)  # EX_TEMPFAIL: numbers recorded, not certified


if __name__ == "__main__":
    main()
