"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (bounded cadence-regularized
day aggregation over events — the reference's core semantic) at sf0.001.
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 plus the training-data-pipeline operators; ``oracle_sql()``
gives the DuckDB-equivalent SQL for every SQL-expressible one.

Parity rules used throughout (see ncagg_spark.functions.hashing and
pipeline.text for the shared builders):
  * time-bucket math in integer microseconds (unix_micros <-> epoch_us);
  * portable hashes built on md5 (identical in both engines);
  * float reductions widened to double with identical evaluation order;
  * every computed column aliased identically on both sides.
"""

from __future__ import annotations

import math
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ncagg_spark.config import AggregationConfig
from ncagg_spark.functions.hashing import (
    sql_hash64,
    sql_minhash_signature,
)
from ncagg_spark.functions.time import cf_to_timestamp, epoch_us, timestamp_to_cf
from ncagg_spark.operators.dedup import cadence_bucket, dedup_cadence
from ncagg_spark.operators.flatten import (
    block_diagonal_union,
    flatten_by_index,
    flatten_overlay,
)
from ncagg_spark.operators.gapfill import gap_fill
from ncagg_spark.operators.multidim import regularize_multidim
from ncagg_spark.operators.normalize import drop_invalid_index
from ncagg_spark.operators.projection import coalesce_alternates
from ncagg_spark.streaming.tuning import stream_shuffle_partitions
from ncagg_spark.pipeline.dedup import (
    exact_dedup,
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard,
    simhash_near_duplicates,
    simhash_signatures,
)
from ncagg_spark.pipeline.similarity import (
    brute_force_topk_relational,
    ivf_topk,
    kmeans_centroids,
    srp_lsh_topk,
)
from ncagg_spark.pipeline.chunking import chunk_documents, sql_chunk_starts
from ncagg_spark.pipeline.pii import (
    pii_counts,
    redact_pii,
    sql_pii_counts,
    sql_redact_pii,
)
from ncagg_spark.pipeline.corpus import clean_corpus
from ncagg_spark.pipeline.lm import (
    lm_score,
    ngram_lm,
    sql_lm_score,
    sql_ngram_lm_ctes,
)
from ncagg_spark.pipeline.search import bm25_topk, sql_bm25_scores
from ncagg_spark.pipeline.semdedup import semantic_dedup
from ncagg_spark.pipeline.packing import pack_sequences, sql_pack_sequences
from ncagg_spark.pipeline.text import (
    LANG_PRECEDENCE,
    benchmark_overlap,
    bpeish_token_count,
    detect_language,
    fingerprint,
    mean_token_length,
    quality_score,
    repetition_counts,
    repetition_keep,
    sql_bpeish_tokens,
    sql_lines,
    sql_paragraphs,
    sql_stopword_hits,
    sql_tokenize,
    sql_winnow_fingerprint,
    sql_word_ngrams,
    tokenize,
    winnow_fingerprint,
)
from ncagg_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# shared constants (Spark + oracle)
# ---------------------------------------------------------------------------

DAY_LO_US = 1_704_153_600_000_000  # 2024-01-02 00:00:00 UTC
DAY_HI_US = 1_704_240_000_000_000  # 2024-01-03 00:00:00 UTC
STEP_US = 60_000_000  # 1-minute cadence
N_BUCKETS = (DAY_HI_US - DAY_LO_US) // STEP_US  # 1440

MINHASH_PERMS = 16
SHINGLE_N = 3
LSH_BANDS, LSH_ROWS = 4, 4

MD_INNER = 4  # multidim: inner samples per report
MD_INNER_STEP_US = 100_000  # 10 Hz inner cadence

# stratified-split query (r14): per-language keep fractions + held-out
# fraction. The integer ticket cuts are computed ONCE here with the
# engine's own floor(x+0.5) rule (pipeline/sampling.py) and embedded in
# BOTH the Spark filters and the DuckDB oracle, so no float rounding can
# diverge between engines.
STRATA_FRACTIONS = {"en": 1.0, "de": 0.6, "zh": 0.3}
STRATA_DEFAULT_FRACTION = 0.15
SPLIT_VAL_FRACTION = 0.2

# corpus-mixing query (r14): target row-count proportions for the three
# language corpora. mix_corpora normalizes these in Python; the oracle
# embeds the NORMALIZED doubles via repr() so both engines run the
# identical IEEE-754 arithmetic on the identical constants — the keep
# fractions are count-driven (min feasible total), so unlike the
# stratified cuts they cannot be precomputed as integers here.
MIX_PROPORTIONS = {"en": 0.6, "de": 0.25, "zh": 0.15}

_T = Callable[[SparkSession, str], DataFrame]


def _work_dir(prefix: str, sf_dir: str) -> str:
    """Fixed per-(prefix, sf) scratch dir, wiped on reuse.

    mkdtemp here would leak a fresh tree of granules/checkpoints into
    /tmp on EVERY gate run; a deterministic name bounds the footprint to
    one tree per (query, sf, process) and the wipe gives streaming a
    fresh checkpoint each run. The PID component keeps concurrent driver
    processes from wiping each other's in-flight granules."""
    import glob as _glob
    import hashlib
    import os
    import shutil
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    # sweep siblings left by DEAD driver processes so the per-PID names
    # stay bounded (a PID suffix alone would leak one tree per run)
    for stale in _glob.glob(
        os.path.join(tempfile.gettempdir(), f"{prefix}_{tag}_*")
    ):
        try:
            pid = int(stale.rsplit("_", 1)[-1])
            if pid != os.getpid():
                os.kill(pid, 0)  # ProcessLookupError iff the pid is gone
        except ValueError:
            continue
        except ProcessLookupError:
            shutil.rmtree(stale, ignore_errors=True)
        except OSError:
            # PermissionError (EPERM) = pid is ALIVE under another user;
            # leave its in-flight scratch dir alone
            continue
    d = os.path.join(
        tempfile.gettempdir(), f"{prefix}_{tag}_{os.getpid()}"
    )
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    return d


def _write_granules(
    base: str,
    in_dir: str,
    parts: list[DataFrame],
    *,
    mtime: int | None = None,
) -> None:
    """Write each part as one single-file granule under ``in_dir``.

    The parts are INDEPENDENT tiny jobs (each a filter of an
    already-defined frame), so they are submitted concurrently from a
    thread pool (optimization guide §2.6): the stream-prep phase pays
    roughly one job latency instead of len(parts) sequential latencies.
    Content is unchanged — each granule is still written by its own
    deterministic coalesce(1) plan; ``mtime`` (when given) stamps
    granule i with mtime + 100*i so the file source's micro-batch order
    stays forced exactly as before.
    """
    import glob as _glob
    from concurrent.futures import ThreadPoolExecutor

    def _one(item: tuple[int, DataFrame]) -> None:
        i, part = item
        tmp_out = os.path.join(base, f"tmp{i}")
        part.coalesce(1).write.parquet(tmp_out)
        (pf,) = _glob.glob(os.path.join(tmp_out, "part-*.parquet"))
        dst = os.path.join(in_dir, f"granule_{i}.parquet")
        os.rename(pf, dst)
        if mtime is not None:
            os.utime(dst, (mtime + 100 * i, mtime + 100 * i))

    if not parts:
        return
    # bounded pool (ADVICE r15): 2-3 jobs in flight fills the scheduler
    # tail (guide §2.6); len(parts) would submit every granule job at
    # once for large lists and ValueError on an empty one
    with ThreadPoolExecutor(max_workers=max(1, min(len(parts), 8))) as pool:
        list(pool.map(_one, list(enumerate(parts))))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, f"{sf_dir}/{name}.parquet")


def _day_cfg() -> AggregationConfig:
    return AggregationConfig(
        index_by="ts",
        cadence_hz=1e6 / STEP_US,
        min_bound=DAY_LO_US / 1e6,
        max_bound=DAY_HI_US / 1e6,
        tiebreak=["event_id"],
    )


# ---------------------------------------------------------------------------
# ncagg-core queries (events)
# ---------------------------------------------------------------------------


def _events_day_prepped(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bounds applied on the raw nanos column inside load_table so they
    # reach the parquet scan as pushed filters (row-group pruning)
    ev = load_table(
        spark,
        f"{sf_dir}/events.parquet",
        time_bounds=("ts", DAY_LO_US, DAY_HI_US),
    )
    ev = drop_invalid_index(ev, "ts")
    return cadence_bucket(ev, "ts", origin_us=DAY_LO_US, step_us=STEP_US)


def q_agg_regularize_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_day_prepped(spark, sf_dir)
    df = dedup_cadence(df, "ts", tiebreak=["event_id"])
    out = gap_fill(
        spark,
        df,
        "ts",
        origin_us=DAY_LO_US,
        step_us=STEP_US,
        n_buckets=N_BUCKETS,
        anchor="grid",
        keep_bucket=True,
    )
    return out.select("__bucket", "ts", "event_id", "value", "is_fill").withColumnRenamed(
        "__bucket", "bucket"
    )


def q_agg_regularize_anchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_day_prepped(spark, sf_dir)
    df = dedup_cadence(df, "ts", tiebreak=["event_id"])
    out = gap_fill(
        spark,
        df,
        "ts",
        origin_us=DAY_LO_US,
        step_us=STEP_US,
        n_buckets=N_BUCKETS,
        anchor="previous",
        keep_bucket=True,
    )
    return out.select("__bucket", "ts", "event_id", "is_fill").withColumnRenamed(
        "__bucket", "bucket"
    )


def q_agg_dedup_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _events_day_prepped(spark, sf_dir)
    df = dedup_cadence(df, "ts", tiebreak=["event_id"])
    return df.select(
        F.col("__bucket").alias("bucket"), "ts", "event_id", "value"
    )


def q_agg_dedup_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-slot cadence alignment (bucket_phase=0.5) — the reference's
    actual slot assignment (ncagg/aggregator.py:206-212 rounds a record to
    the nearest cadence slot, not the floor). Buckets are clamped into the
    last slot exactly as ``operators/regularize.py`` does, so an in-bounds
    record in the final half-slot cannot round off the grid."""
    ev = load_table(
        spark,
        f"{sf_dir}/events.parquet",
        time_bounds=("ts", DAY_LO_US, DAY_HI_US),
    )
    ev = drop_invalid_index(ev, "ts")
    df = cadence_bucket(
        ev, "ts", origin_us=DAY_LO_US, step_us=STEP_US, phase=0.5
    )
    df = df.withColumn(
        "__bucket", F.least(F.col("__bucket"), F.lit(N_BUCKETS - 1))
    )
    df = dedup_cadence(df, "ts", tiebreak=["event_id"])
    return df.select(
        F.col("__bucket").alias("bucket"), "ts", "event_id", "value"
    )


def q_agg_nc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native `.nc` ingest end-to-end: the day window is re-granulated to
    hourly classic NetCDF files (distributed applyInPandas writer,
    sources/nc_granules.py:write_nc_granules), read back through the
    pure-Python codec (binaryFile -> mapInPandas,
    sources/netcdf3.py), CF time decoded, then regularized — the
    reference's actual input format driven through its flagship
    aggregation (ncagg/aggregator.py:239-359). The oracle replicates the
    CF double round-trip (us -> us/1e6 -> floor(sec*1e6)) in identical
    IEEE arithmetic, so values — including the decoded timestamps — are
    hash-checked, not just counted."""
    from ncagg_spark.sources.nc_granules import (
        read_nc_granules,
        write_nc_granules,
    )

    ev = load_table(
        spark,
        f"{sf_dir}/events.parquet",
        time_bounds=("ts", DAY_LO_US, DAY_HI_US),
    )
    ev = drop_invalid_index(ev, "ts").select("ts", "event_id", "value")
    out_dir = _work_dir("ncagg_ingest", sf_dir)
    write_nc_granules(
        ev,
        out_dir,
        index_col="ts",
        cf_units="seconds since 1970-01-01",
        interval_us=3_600_000_000,  # hourly granules
    ).collect()  # manifest action runs the distributed export

    df = read_nc_granules(spark, f"{out_dir}/*.nc")
    df = df.select(
        cf_to_timestamp("ts", "seconds since 1970-01-01").alias("ts"),
        "event_id",
        "value",
    )
    df = cadence_bucket(df, "ts", origin_us=DAY_LO_US, step_us=STEP_US)
    df = dedup_cadence(df, "ts", tiebreak=["event_id"])
    out = gap_fill(
        spark,
        df,
        "ts",
        origin_us=DAY_LO_US,
        step_us=STEP_US,
        n_buckets=N_BUCKETS,
        anchor="grid",
        keep_bucket=True,
    )
    return out.select(
        F.col("__bucket").alias("bucket"), "ts", "event_id", "value",
        "is_fill",
    )


def q_stream_day_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-vs-incremental equivalence, driver-checked: the day window
    lands as four quarter-day granule files; ``incremental_aggregate``
    (streaming/regularize.py — foreachBatch merge with
    maxFilesPerTrigger=1, so each granule is its own micro-batch)
    maintains the regularized day aggregate across four successive
    merges; the final on-disk state is returned and must hash-match the
    ONE-SHOT batch oracle — the reference's operational re-aggregation
    loop (a cron drops a granule, the day file is rebuilt) proven
    incremental == batch."""
    import os

    from ncagg_spark.streaming.regularize import incremental_aggregate

    base = _work_dir("ncagg_stream", sf_dir)
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)

    ev = load_table(
        spark,
        f"{sf_dir}/events.parquet",
        time_bounds=("ts", DAY_LO_US, DAY_HI_US),
    )
    ev = drop_invalid_index(ev, "ts").select("ts", "event_id", "value")
    quarter_us = (DAY_HI_US - DAY_LO_US) // 4
    _write_granules(
        base,
        in_dir,
        [
            ev.filter(
                (epoch_us("ts") >= DAY_LO_US + i * quarter_us)
                & (epoch_us("ts") < DAY_LO_US + (i + 1) * quarter_us)
            )
            for i in range(4)
        ],
        # the sequential writes used to yield naturally increasing
        # mtimes; stamp them explicitly so the concurrent writes keep
        # the same quarter-by-quarter micro-batch order
        mtime=1_700_000_000,
    )

    out_dir = os.path.join(base, "out")
    with stream_shuffle_partitions(spark):
        q = incremental_aggregate(
            spark,
            in_dir,
            out_dir,
            os.path.join(base, "ckpt"),
            spark.read.parquet(in_dir).schema,
            _day_cfg(),
            available_now=True,
            max_files_per_trigger=1,
        )
        q.awaitTermination()
    return spark.read.parquet(out_dir).select(
        "ts", "event_id", "value", "is_fill"
    )


def q_stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark LATE-DATA correctness, oracle-checked (round 6): the
    pure-streaming dedup (streaming/regularize.py:stream_dedup_cadence,
    append mode, bounded state) must DROP records that arrive after the
    watermark has passed them. Micro-batch order is forced by file
    mtime with maxFilesPerTrigger=1:

      batch 0  g0 = first-half-day events with event_id % 5 != 0
               (advances the watermark to ~12:00 - delay)
      batch 1  sentinel past the half-day window: filtered out by the
               bounds (no output row of its own) but its event time
               pushes the watermark past every open slot, so batch 1
               EMITS AND EVICTS all of g0's windows
      batch 2  g1 = the event_id % 5 == 0 stragglers, all with event
               times in the first SIX hours — their windows are closed
               AND evicted, so every row is dropped. (Ordering matters:
               Spark only guarantees dropping late rows whose state is
               already evicted; a late row arriving while its window is
               still in state merges into it — the documented
               "may or may not be dropped" zone. Flushing first makes
               the drop deterministic, which is what lets this query be
               value-hash-gated at all.)
      batch 3  second sentinel: flushes anything still open (nothing —
               guards the invariant rather than the result)

    The DuckDB oracle therefore sees ONLY g0: earliest-per-minute-slot
    over the %5 != 0 rows. If late rows leaked into the result, the
    hash comparison fails."""
    import os

    from ncagg_spark.streaming.regularize import (
        stream_dedup_cadence,
        stream_granules,
    )

    base = _work_dir("ncagg_late", sf_dir)
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)

    half_hi = DAY_LO_US + (DAY_HI_US - DAY_LO_US) // 2
    ev = load_table(
        spark,
        f"{sf_dir}/events.parquet",
        time_bounds=("ts", DAY_LO_US, half_hi),
    )
    ev = drop_invalid_index(ev, "ts").select("ts", "event_id", "value")
    g0 = ev.filter(F.col("event_id") % 5 != 0)
    g1 = ev.filter(
        (F.col("event_id") % 5 == 0)
        & (epoch_us("ts") < DAY_LO_US + 6 * 3_600_000_000)
    )
    # single-partition JVM one-row sentinels (see q_stream_gap_fill_ooo)
    sent = [
        spark.range(0, 1, 1, 1).select(
            F.timestamp_micros(
                F.lit(half_hi + (i + 1) * 3_600_000_000)
            ).alias("ts"),
            F.lit(10**9 + i).cast("long").alias("event_id"),
            F.lit(0.0).alias("value"),
        )
        for i in range(2)
    ]
    # force micro-batch order: the file source orders by mtime
    _write_granules(
        base, in_dir, [g0, sent[0], g1, sent[1]], mtime=1_700_000_000
    )

    cfg = AggregationConfig(
        index_by="ts",
        cadence_hz=1e6 / STEP_US,
        min_bound=DAY_LO_US / 1e6,
        max_bound=half_hi / 1e6,
        tiebreak=["event_id"],
    )
    stream = stream_granules(
        spark,
        in_dir,
        spark.read.parquet(in_dir).schema,
        max_files_per_trigger=1,
    )
    out = stream_dedup_cadence(stream, cfg, watermark_delay="120 seconds")
    out_dir = os.path.join(base, "out")
    with stream_shuffle_partitions(spark):
        q = (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    got = spark.read.parquet(out_dir)
    return got.select(
        F.col("__bucket").alias("bucket"), "ts", "event_id", "value"
    )


# online gap-fill cadence: 10-min slots, gap trigger > 15 min
GF_STEP_US = 600_000_000
# streaming sessionize: > 15 min inactivity splits a session (r12)
SESS_STREAM_GAP_US = 900_000_000
GF_DTMAX_US = 900_000_000
GF_HI_US = DAY_LO_US + 2 * 86_400_000_000


def q_stream_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ONLINE gap fill, oracle-gated (VERDICT r6 #3): the
    stateful empty-window emitter (streaming/stateful.py
    fill_gaps_online — applyInPandasWithState, one state row per key)
    run over two days of events keyed by event_type, fed as two
    time-ordered granule micro-batches (maxFilesPerTrigger=1, mtime
    order). Real records pass through is_fill=false; whenever a record
    lands > 15 min after its key's previous record, the missing 10-min
    cadence slots (prev + k*step — the reference's fill synthesis,
    ncagg/aggregator.py:173-175, applied online) are emitted as
    is_fill=true rows in the SAME micro-batch as the closing record.
    State carries across the batch boundary, so the micro-batched
    output must equal the one-shot batch rule — which is exactly what
    the DuckDB lag-window oracle computes."""
    import os

    from ncagg_spark.streaming.regularize import stream_granules
    from ncagg_spark.streaming.stateful import fill_gaps_online

    base = _work_dir("ncagg_gapfill", sf_dir)
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)

    ev = load_table(
        spark,
        f"{sf_dir}/events.parquet",
        time_bounds=("ts", DAY_LO_US, GF_HI_US),
    )
    ev = drop_invalid_index(ev, "ts").select("ts", "event_type")
    mid = DAY_LO_US + (GF_HI_US - DAY_LO_US) // 2
    _write_granules(
        base,
        in_dir,
        [ev.filter(epoch_us("ts") < mid), ev.filter(epoch_us("ts") >= mid)],
        mtime=1_700_000_000,
    )

    stream = stream_granules(
        spark,
        in_dir,
        spark.read.parquet(in_dir).schema,
        max_files_per_trigger=1,
    )
    out = fill_gaps_online(
        stream,
        key_col="event_type",
        step_us=GF_STEP_US,
        dt_max_s=GF_DTMAX_US / 1e6,
        timeout="none",  # bounded availableNow run; see fill_gaps_online
    )
    out_dir = os.path.join(base, "out")
    with stream_shuffle_partitions(spark):
        q = (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.parquet(out_dir).select("key", "ts", "is_fill")


def q_stream_gap_fill_ooo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming online gap fill under OUT-OF-ORDER granule arrival
    (r12): the same two-day event slice as stream_gap_fill, but the
    second-day granule is delivered BEFORE the first-day granule
    (reversed mtimes — exactly the r11 failure shape root-caused in
    tools/stream_state_diag.py). ``order="eventtime"`` buffers records
    in state and finalizes only below the event-time watermark, so the
    output must still equal the one-shot batch rule — the identical
    DuckDB lag-window oracle as stream_gap_fill. Two far-future
    sentinel granules (a key absent from the data, filtered out here
    and never present in the oracle) advance the watermark so the
    EventTimeTimeout flushes every real key's tail."""
    import os

    from ncagg_spark.streaming.regularize import stream_granules
    from ncagg_spark.streaming.stateful import fill_gaps_online

    base = _work_dir("ncagg_gapfill_ooo", sf_dir)
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)

    ev = load_table(
        spark,
        f"{sf_dir}/events.parquet",
        time_bounds=("ts", DAY_LO_US, GF_HI_US),
    )
    ev = drop_invalid_index(ev, "ts").select("ts", "event_type")
    mid = DAY_LO_US + (GF_HI_US - DAY_LO_US) // 2
    # watermark delay must exceed the out-of-orderness span (2 days)
    delay_us = 49 * 3_600_000_000
    dtmax_us = GF_DTMAX_US
    sent_key = "zzzz__wm_sentinel"
    sent1_us = GF_HI_US + delay_us + dtmax_us + 3_600_000_000

    # single-partition JVM-side one-row frames: a Python-side
    # createDataFrame gets defaultParallelism partitions, and
    # coalesce(1) then walks all of them sequentially in one task
    # (~150 ms per Python partition handshake — measured 4-5 s per
    # sentinel write at r15); range(..., numPartitions=1) writes in
    # ~0.2 s with identical rows
    def _sent_row(us_val: int) -> DataFrame:
        return spark.range(0, 1, 1, 1).select(
            F.timestamp_micros(F.lit(us_val)).alias("ts"),
            F.lit(sent_key).alias("event_type"),
        )

    parts = [
        ev.filter(epoch_us("ts") >= mid),  # second day FIRST
        ev.filter(epoch_us("ts") < mid),
        _sent_row(sent1_us),
        _sent_row(sent1_us + 1_000_000),
    ]
    _write_granules(base, in_dir, parts, mtime=1_700_000_000)

    stream = stream_granules(
        spark,
        in_dir,
        spark.read.parquet(in_dir).schema,
        max_files_per_trigger=1,
    )
    out = fill_gaps_online(
        stream,
        key_col="event_type",
        step_us=GF_STEP_US,
        dt_max_s=GF_DTMAX_US / 1e6,
        order="eventtime",
        watermark_delay=f"{delay_us // 1_000_000} seconds",
    )
    out_dir = os.path.join(base, "out")
    with stream_shuffle_partitions(spark):
        q = (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.read.parquet(out_dir)
        .filter(F.col("key") != sent_key)
        .select("key", "ts", "is_fill")
    )


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization with Spark's NATIVE session windows
    (r12, streaming/sessionize.py): the two-day event slice keyed by
    event_type, fed as two time-ordered granule micro-batches; sessions
    split on > 15 min inactivity. State is one row per OPEN session;
    append mode emits each session exactly once when the watermark
    passes its end + gap — sessions spanning the granule boundary merge
    in the state store, so the micro-batched output must equal the
    one-shot batch rule, which is what the DuckDB lag-window session
    oracle computes. Far-future sentinel granules (key filtered here,
    absent from the oracle) advance the watermark to flush the tail."""
    import os

    from ncagg_spark.streaming.regularize import stream_granules
    from ncagg_spark.streaming.sessionize import sessionize_stream

    base = _work_dir("ncagg_sess_stream", sf_dir)
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)

    ev = load_table(
        spark,
        f"{sf_dir}/events.parquet",
        time_bounds=("ts", DAY_LO_US, GF_HI_US),
    )
    ev = drop_invalid_index(ev, "ts").select("ts", "event_type")
    mid = DAY_LO_US + (GF_HI_US - DAY_LO_US) // 2
    sent_key = "zzzz__wm_sentinel"
    delay_us = 3_600_000_000  # 1h watermark (granules arrive in order)
    sent1_us = GF_HI_US + delay_us + SESS_STREAM_GAP_US + 3_600_000_000

    # single-partition JVM one-row sentinels (see q_stream_gap_fill_ooo)
    def _sent_row(us_val: int) -> DataFrame:
        return spark.range(0, 1, 1, 1).select(
            F.timestamp_micros(F.lit(us_val)).alias("ts"),
            F.lit(sent_key).alias("event_type"),
        )

    parts = [
        ev.filter(epoch_us("ts") < mid),
        ev.filter(epoch_us("ts") >= mid),
        _sent_row(sent1_us),
        _sent_row(sent1_us + 1_000_000),
    ]
    _write_granules(base, in_dir, parts, mtime=1_700_000_000)

    stream = stream_granules(
        spark,
        in_dir,
        spark.read.parquet(in_dir).schema,
        max_files_per_trigger=1,
    )
    out = sessionize_stream(
        stream,
        key_col="event_type",
        gap_s=SESS_STREAM_GAP_US / 1e6,
        watermark_delay=f"{delay_us // 1_000_000} seconds",
    )
    out_dir = os.path.join(base, "out")
    with stream_shuffle_partitions(spark):
        q = (
            out.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return (
        spark.read.parquet(out_dir)
        .filter(F.col("key") != sent_key)
        .select("key", "session_start", "session_end", "n_events")
    )


def q_agg_bounds_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(
        spark,
        f"{sf_dir}/events.parquet",
        time_bounds=("ts", DAY_LO_US, DAY_HI_US),
    )
    ev = drop_invalid_index(ev, "ts")
    return ev.select("event_id", "ts", "user_id", "event_type", "value")


def q_agg_manifest_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute-strategy reduction over a synthetic per-day granule
    manifest (granule id = event date) — first/last/unique_list/int_sum/
    input_count expressed as one aggregation, like the reference's
    global-attribute finalize (ncagg/attributes.py:341-385)."""
    ev = _t(spark, sf_dir, "events")
    man = ev.groupBy(F.to_date("ts").cast("string").alias("granule")).agg(
        F.min("ts").alias("index_min"),
        F.max("ts").alias("index_max"),
        F.count(F.lit(1)).alias("row_count"),
        F.min("event_type").alias("file_attr"),
    )
    return man.agg(
        F.count(F.lit(1)).alias("input_count"),
        F.sum("row_count").alias("total_rows"),
        F.min_by("granule", "index_min").alias("first_input"),
        F.max_by("granule", "index_max").alias("last_input"),
        F.date_format(F.min("index_min"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias(
            "time_coverage_start"
        ),
        F.date_format(F.max("index_max"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").alias(
            "time_coverage_end"
        ),
        F.array_join(
            F.array_sort(F.array_distinct(F.collect_list("file_attr"))), ", "
        ).alias("unique_attrs"),
    )


def q_agg_coalesce_alt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """copy_from_alt semantics: value arrives under one of two vintage
    column names; output coalesces (ncagg/aggrelist.py:553-566)."""
    ev = _t(spark, sf_dir, "events")
    ev = ev.withColumn(
        "value_v1", F.when(F.col("event_id") % 2 == 0, F.col("value"))
    ).withColumn(
        "value_v2", F.when(F.col("event_id") % 2 == 1, F.col("value"))
    ).drop("value")
    ev = coalesce_alternates(ev, {"value_v1": ["value_v2"]})
    return ev.select("event_id", F.col("value_v1").alias("value"))


def q_agg_take_dim_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """take_dim_indicies (P10 — regressed in the reference, implemented
    here): pick fixed-dim elements out of an array column."""
    em = _t(spark, sf_dir, "embeddings")
    return em.select(
        "vec_id",
        F.element_at("embedding", 1).alias("e0"),
        F.element_at("embedding", 8).alias("e7"),
    )


def q_agg_block_diagonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-diagonal multi-unlim-dim default (SURVEY §1.2): two granule
    variants with disjoint data columns unioned with null padding."""
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "click").select(
        "event_id", F.col("value").alias("click_value")
    )
    b = ev.filter(F.col("event_type") == "view").select(
        "event_id", F.col("value").alias("view_value")
    )
    return block_diagonal_union([a, b])


def q_agg_flatten_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatten:true overlay (offset-0 per file): two files' rows aligned
    by per-file position; earlier file wins per column."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & (F.col("event_id") < 2000)
    )
    f1 = ev.filter(F.col("event_id") % 2 == 0).select("event_id", "value")
    f2 = ev.filter(F.col("event_id") % 2 == 1).select("event_id", "value")
    return flatten_overlay([f1, f2], order_by="event_id")


def q_agg_flatten_by_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatten-by-index (J2 — the reference's documented-but-unimplemented
    value-matching alignment, test_flatten_index_by.py): two granule
    variants carrying different variables, aligned by label value via
    full outer join."""
    na = _t(spark, sf_dir, "nation")
    a = na.filter(F.col("n_nationkey") < 15).select(
        F.col("n_nationkey").alias("label"), F.col("n_name").alias("name_a")
    )
    b = na.filter(F.col("n_nationkey") >= 10).select(
        F.col("n_nationkey").alias("label"),
        F.col("n_regionkey").alias("region_b"),
    )
    return flatten_by_index([a, b], "label")


def q_agg_multidim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multidim (G8) index: a 2-D OB_time(report, sample) variable ordered
    by its representative element and gap-filled with synthesized
    inner-cadence arrays (ncagg/aggrelist.py:347-386 ordering,
    :140-189 fill-block synthesis; test/generic/test_input_file_node.py:
    34-54). The driver tables carry no array-time column, so the 2-D index
    is synthesized from the scalar event time (MD_INNER samples at the
    inner cadence); the pipeline then sees ONLY the array column. Output
    is exploded to scalar rows (driver canonicalizer can't hash lists)."""
    ev = load_table(
        spark,
        f"{sf_dir}/events.parquet",
        time_bounds=("ts", DAY_LO_US, DAY_HI_US),
    )
    ev = drop_invalid_index(ev, "ts")
    ev = ev.withColumn(
        "ob_time",
        F.transform(
            F.sequence(F.lit(0), F.lit(MD_INNER - 1)),
            lambda j: F.timestamp_micros(
                epoch_us(F.col("ts")) + j * MD_INNER_STEP_US
            ),
        ),
    ).drop("ts")
    out = regularize_multidim(
        spark,
        ev,
        _day_cfg(),
        array_index_col="ob_time",
        inner_size=MD_INNER,
        inner_hz=1e6 / MD_INNER_STEP_US,
    )
    return out.select(
        "ts",
        "event_id",
        "is_fill",
        F.posexplode("ob_time").alias("inner_idx", "ob_ts"),
    ).withColumn("inner_idx", F.col("inner_idx").cast("long"))


def q_agg_promote_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed->unlimited dim promotion (type1 remapping): each embedding
    element becomes its own record with its position."""
    from ncagg_spark.operators.projection import promote_fixed_dim

    em = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return promote_fixed_dim(em.select("vec_id", "embedding"), "embedding")


def q_agg_cf_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CF time encode/decode (F1): timestamps <-> 'seconds since
    2000-01-01 12:00:00' doubles, round-tripped."""
    units = "seconds since 2000-01-01 12:00:00"
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    enc = ev.select(
        "event_id", timestamp_to_cf("ts", units).alias("cf_seconds")
    )
    return enc.select(
        "event_id",
        "cf_seconds",
        cf_to_timestamp("cf_seconds", units).alias("ts_roundtrip"),
    )


# ---------------------------------------------------------------------------
# relational surface (star schema) — groupBy/join/window/rollup/set ops
# ---------------------------------------------------------------------------


SESSION_GAP_US = 12 * 3600 * 1_000_000  # 12h inactivity closes a session


def q_evt_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessionization of the event stream (12h inactivity gap):
    one row per session with bounds, event count, and value sum. One
    shuffle (hash by user_id); lag + running-sum + groupBy all share the
    partitioning."""
    from ncagg_spark.operators.sessionize import session_summary

    ev = drop_invalid_index(_t(spark, sf_dir, "events"), "ts")
    return session_summary(
        ev,
        "ts",
        "user_id",
        gap_us=SESSION_GAP_US,
        tiebreak=["event_id"],
        agg_cols=[
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value")
        ],
    )


def q_evt_sessionize_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """evt_sessionize through the hot-key-routed operator
    (operators/sessionize.py:sessionize_skew, round 11): identical
    sessions, but detected hot keys are chunked across n_chunks window
    partitions and merged at boundaries — the skew-bounded physical
    strategy, value-checked against the same DuckDB oracle as the plain
    window form. The events fixture is deliberately uniform (no user
    clears a realistic hot threshold at any sf), so the query FORCES
    the routed path: the 100 smallest user ids are declared hot (any
    hot_keys choice yields identical results — the operator's
    contract), exercising chunking + boundary merge + the correction
    join at every scale."""
    from ncagg_spark.operators.sessionize import SESSION_COL, sessionize_skew

    ev = drop_invalid_index(_t(spark, sf_dir, "events"), "ts")
    hot = [
        r[0]
        for r in ev.select("user_id")
        .distinct()
        .orderBy("user_id")
        .limit(100)
        .collect()
    ]
    s = sessionize_skew(
        ev,
        "ts",
        "user_id",
        gap_us=SESSION_GAP_US,
        hot_keys=hot,
        n_chunks=8,
        tiebreak=["event_id"],
    )
    return s.groupBy("user_id", SESSION_COL).agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_value"),
    )


def q_evt_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (events.props is a JSON string) + grouped
    aggregate — the semi-structured-column path every training-data
    manifest needs. get_json_object stays JVM-side (no UDF)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        ev.select(k.alias("k"), F.col("value"), F.col("event_type"))
        .groupBy((F.col("k") % 10).alias("k_mod"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def q_evt_asof_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each non-purchase event enriched with the
    user's most recent purchase at-or-before it (sort-merge as-of via
    union + running-last window — ONE shuffle, no range-join blowup;
    operators/asof.py)."""
    from ncagg_spark.operators.asof import asof_join

    ev = drop_invalid_index(_t(spark, sf_dir, "events"), "ts")
    left = ev.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        left,
        right,
        left_time="ts",
        right_time="ts",
        left_by="user_id",
        right_by="user_id",
        right_tiebreak=["event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id_asof").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
        F.col("ts_asof").alias("purchase_ts"),
    )


def q_evt_asof_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: each click's next error event by the
    same user within 7 days (null past the tolerance window)."""
    from ncagg_spark.operators.asof import asof_join

    ev = drop_invalid_index(_t(spark, sf_dir, "events"), "ts")
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    out = asof_join(
        left,
        right,
        left_time="ts",
        right_time="ts",
        left_by="user_id",
        right_by="user_id",
        direction="forward",
        tolerance=F.expr("INTERVAL 7 DAYS"),
        right_tiebreak=["event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("event_id_asof").alias("error_id"),
        F.col("ts_asof").alias("error_ts"),
    )


def q_rel_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    g = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    return g


def q_rel_q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    # no forced broadcast: customer scales with SF (150k x SF rows) — at
    # 100 TB it must shuffle-join; AQE auto-broadcasts it at small SF.
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .filter(
            (F.col("c_mktsegment") == "BUILDING")
            & (F.col("o_orderdate") < cutoff)
            & (F.col("l_shipdate") > cutoff)
        )
    )
    g = j.groupBy("l_orderkey", "o_orderdate").agg(
        F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
        .cast("double")
        .alias("revenue")
    )
    return g.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc()).limit(10)


def q_rel_q5_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    # broadcast only nation (25 rows at every SF); customer/supplier scale
    # with SF and must be joinable by shuffle at 100 TB (AQE broadcasts
    # them automatically when they fit).
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == na.n_nationkey)
    )
    return j.groupBy("n_name").agg(
        F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
        .cast("double")
        .alias("revenue")
    )


def q_rel_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    j = od.join(cu, od.o_custkey == cu.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn")
    )


def q_rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q_rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube):
    per-returnflag totals, per-linestatus totals, and the grand total in
    one aggregation pass."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_rel_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no 1998 orders — anti join against a filtered right
    side (non-empty at every sf, unlike no-orders-at-all customers).

    The right side is reduced to DISTINCT join keys first (r13, VERDICT
    r12 #4): an anti join ignores right-side duplicates, so the
    map-side-combined distinct shrinks the build side from |orders in
    1998| rows to |customers with 1998 orders| keys — at sf10 that cut
    the 65 MB raw-key broadcast to ~10 MB and the wall 8.1 -> 2.7 s
    (measured solo, 3-repeat medians), and the exchange lets AQE pick
    the join strategy from the REAL reduced size instead of a static
    scan estimate, which is what holds at 100 TB."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    keys = od.select("o_custkey").distinct()
    return cu.join(
        keys, cu.c_custkey == keys.o_custkey, how="anti"
    ).select("c_custkey", "c_name")


def q_rel_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers shipping any high-quantity line item (left semi join)."""
    su = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return su.join(li, su.s_suppkey == li.l_suppkey, how="semi").select(
        "s_suppkey", "s_name"
    )


def q_rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_rel_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops: nations with customers INTERSECT nations with suppliers,
    unioned with (nations with customers EXCEPT nations with suppliers)
    tagged — exercises both operators in one stable result."""
    cu = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    su = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    both = cu.intersect(su).withColumn("tag", F.lit("both"))
    only_cu = cu.subtract(su).withColumn("tag", F.lit("cust_only"))
    return both.union(only_cu)


def q_rel_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS via SQL (Catalyst rewrites to semi join):
    orders having at least one returned line item."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM v_orders
        WHERE EXISTS (SELECT 1 FROM v_lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        """
    )


def q_rel_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average total price."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders2")
    return spark.sql(
        """
        SELECT o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS totalprice
        FROM v_orders2
        WHERE o_totalprice > (SELECT avg(CAST(o_totalprice AS DECIMAL(18,4)))
                              FROM v_orders2)
        """
    )


def q_rel_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per region: the full 5-table chain through nation+region
    (both constant-size -> broadcast)."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region")
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    j = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
    )
    return j.groupBy("r_name").agg(
        F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_rel_part_type_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by part type for one brand — part joined to lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    return (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .groupBy("p_type")
        .agg(
            F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_rel_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window (1 hour) aggregation over events — the
    batch form of the streaming windowed agg (F.window)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = F.window("ts", "1 hour")
    return ev.groupBy(w.alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


def q_rel_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per group (the approx_count_distinct scale
    path exists but can't hash-match an oracle)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def q_rel_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-frame window: 7-row moving average of daily order totals
    per priority (rows between 6 preceding and current)."""
    od = _t(spark, sf_dir, "orders")
    daily = od.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.to_date("o_orderdate").cast("string").alias("day"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("total"))
    w = Window.partitionBy("prio").orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "prio",
        "day",
        F.round(F.avg(F.col("total").cast("double")).over(w), 4).alias("avg7"),
    )


def q_rel_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    a = cu.join(F.broadcast(na), cu.c_nationkey == na.n_nationkey).select("n_name")
    b = su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey).select("n_name")
    return a.union(b).distinct()


# ---------------------------------------------------------------------------
# training-data pipeline queries (documents / embeddings)
# ---------------------------------------------------------------------------


def q_doc_exact_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_duplicates(_t(spark, sf_dir, "documents"))


def q_doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(mean_token_length(toks), 6).alias("mean_token_len"),
        quality_score(F.col("text")).alias("quality"),
        fingerprint(F.col("text")).alias("fp"),
    )


def q_doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate: keep documents whose composite quality score passes
    the threshold — the canonical pretraining-corpus filter pass. Pure
    Catalyst predicate (no UDF), so the 100 TB variant is a single scan.
    """
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", quality_score(F.col("text")).alias("quality")
    ).filter(F.col("quality") >= 0.75)


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", detect_language(F.col("text")).alias("lang_pred"))


def q_doc_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Exploded (doc_id, perm_idx, sig_val) rather than sig array<long>:
    # the driver's pandas canonicalizer cannot sort a list column
    # (round-1 "unhashable type: 'list'"), and exploded scalar rows
    # hash-compare cleanly. Same information, canon-friendly shape.
    sigs = minhash_signatures(
        _t(spark, sf_dir, "documents"),
        shingle_n=SHINGLE_N,
        num_perm=MINHASH_PERMS,
    )
    return sigs.select(
        "doc_id", F.posexplode("sig").alias("perm_idx", "sig_val")
    ).withColumn("perm_idx", F.col("perm_idx").cast("long"))


def q_doc_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = minhash_signatures(
        _t(spark, sf_dir, "documents"),
        shingle_n=SHINGLE_N,
        num_perm=MINHASH_PERMS,
    )
    return minhash_lsh_candidates(
        sigs, num_bands=LSH_BANDS, rows_per_band=LSH_ROWS
    )


def q_doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    sigs = minhash_signatures(d, shingle_n=SHINGLE_N, num_perm=MINHASH_PERMS)
    pairs = minhash_lsh_candidates(
        sigs, num_bands=LSH_BANDS, rows_per_band=LSH_ROWS
    )
    j = ngram_jaccard(d, pairs, shingle_n=SHINGLE_N)
    return j.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_signatures(_t(spark, sf_dir, "documents"))


def q_doc_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways: whitespace words and BPE-ish pre-tokens
    (letter/digit/punct runs — the LLM-token-count proxy)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(tokenize(F.col("text"))).alias("ws_tokens"),
        bpeish_token_count(F.col("text")).alias("bpeish_tokens"),
    )


def q_doc_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dataset assembly (pipeline/sampling.py): stratified
    per-language downsampling, then a contamination-safe train/val
    split. Both decisions are the portable content-hash ticket
    (hash64(key|salt) % 1e6 < cut), so re-runs, repartitioning, and
    appends never change a row's fate and the oracle reproduces the
    identical row set in SQL. One scan, projection + filter only — no
    shuffle, no UDF; the split labels are a second ticket on the same
    scan.
    """
    from ncagg_spark.pipeline.sampling import (
        split_label,
        stratified_sample,
    )

    d = _t(spark, sf_dir, "documents")
    sampled = stratified_sample(
        d,
        STRATA_FRACTIONS,
        strata_col="lang",
        default_fraction=STRATA_DEFAULT_FRACTION,
        salt="strata",
    )
    # split_label, not split_train_val + union: the label column keeps
    # this ONE scan (the two-frame API would read the source twice)
    return sampled.select(
        "doc_id",
        "lang",
        split_label(SPLIT_VAL_FRACTION, salt="split").alias("split"),
    )


def q_doc_mix_corpora(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing to target proportions WITHOUT oversampling
    (pipeline/sampling.py mix_corpus_labeled): the three language
    corpora are label slices of ONE documents scan, so all per-source
    counts come from a single groupBy(lang).count() job and the mix
    itself is one projection + filter on one scan (VERDICT r14 #2 —
    the dict-of-frames mix_corpora over slices of the same table would
    scan the lang column once per source). Cuts are the largest total
    every source can supply (T = min_i count_i / prop_i); the oracle
    recomputes them with the identical IEEE-754 arithmetic (normalized
    proportions embedded as repr'd doubles). Row set is pinned equal
    to the dict-of-frames mix_corpora by test."""
    from ncagg_spark.pipeline.sampling import mix_corpus_labeled

    d = _t(spark, sf_dir, "documents")
    out = mix_corpus_labeled(
        d, MIX_PROPORTIONS, label_col="lang", salt="mix"
    )
    return out.select("doc_id", "source")


def q_doc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level (substring) duplicate detection: maximal verbatim
    k-token passages shared across documents — the substring-dedup
    primitive document-level hashing misses (Lee et al. 2022). Rolling
    hash + one grouped shuffle + gaps-and-islands merge; hot hashes
    capped like the LSH bucket guard."""
    from ncagg_spark.pipeline.spans import duplicate_spans

    d = _t(spark, sf_dir, "documents")
    out = duplicate_spans(d, k=8)
    return out.select(
        "id_a", "id_b",
        F.col("a_start").cast("long").alias("a_start"),
        F.col("b_start").cast("long").alias("b_start"),
        F.col("length").cast("long").alias("length"),
    )


def q_doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: per-pattern match counts + fingerprint of the redacted
    text. The synthetic corpus carries no PII, so each document is
    augmented with deterministic doc_id-derived PII (email, phone, IP,
    card, SSN) — identically in the oracle — making every pattern's
    match/replace path load-bearing. Expression-only
    (regexp_replace/regexp_extract_all): one codegen'd scan at 100 TB.
    """
    d = _t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1 (303) 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lit(" ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 card 4111 1111 1111 1111 ssn 123-45-6789."),
    )
    counts = pii_counts(aug)
    red = redact_pii(aug)
    return d.select(
        "doc_id",
        *[
            counts[k].cast("long").alias(f"n_{k}")
            for k in ("email", "ip", "ssn", "cc", "phone")
        ],
        F.length(red).cast("long").alias("redacted_len"),
        F.md5(red).alias("redacted_fp"),
    )


def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (size=40 tokens, overlap=10): the
    RAG/pretraining corpus-prep split. Per-row explode — no shuffle."""
    d = _t(spark, sf_dir, "documents")
    ch = chunk_documents(d, size=40, overlap=10)
    return ch.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.col("chunk_tokens").cast("long").alias("chunk_tokens"),
        "chunk_text",
    )


def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing (r11): concatenate the corpus token
    stream in doc_id order and split it into fixed 128-token training
    sequences; returns the (seq_id, doc_id, doc_offset, seq_offset,
    seg_len) dataloader manifest. The global token offsets come from a
    two-phase DISTRIBUTED prefix sum (pipeline/packing.py) — the only
    single-partition window runs over <= 256 bucket subtotals, never the
    corpus — while the DuckDB oracle states the same semantics as one
    sequential cumulative window."""
    return pack_sequences(
        _t(spark, sf_dir, "documents"), seq_len=128, drop_incomplete=True
    )


def q_doc_pack_bpeish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-pluggable packing (r12, VERDICT r11 #7): the same
    distributed-prefix-sum manifest, but over a PRECOMPUTED token-count
    column (``count_col``) — the real-pipeline shape where counts come
    from the actual BPE tokenizer, not the engine's tokenizer. Here the
    precomputed column is the BPE-ish pre-token count
    (pipeline/text.py bpeish_token_count: letter/digit/punct runs —
    splits punctuation and numbers off like a BPE pre-tokenizer), so
    the count_col path is exercised end-to-end against the oracle."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "bpe_n", bpeish_token_count(F.col("text"))
    )
    return pack_sequences(
        d, seq_len=128, count_col="bpe_n", drop_incomplete=True
    )


def q_doc_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-INSPIRED repetition gate (r11; adapted from Rae et al.
    2021 §A1.1 — the paper's n-gram signals are character-mass
    fractions and its duplicated-5-gram threshold is 0.15; this gate
    uses occurrence fractions with thresholds 0.30/0.30/0.20/0.30, a
    deliberate adaptation, not the published filter) as exact integers:
    per-doc duplicate-line / duplicate-paragraph / top-2-gram /
    duplicated-5-gram counts plus the keep verdict computed by integer
    cross-multiplication — no double ever hashed. Pure per-row Catalyst
    expressions: ONE scan, no shuffle, no UDF at any scale. r12: the
    shared-projection form (repetition_counts_df) — one tokenize/ngram
    build per doc instead of per signal, 14x faster measured, values
    identical."""
    from ncagg_spark.pipeline.text import repetition_counts_df

    d = _t(spark, sf_dir, "documents")
    return repetition_counts_df(
        d, "text", keep_cols=["doc_id"]
    ).withColumn("keep", repetition_keep())


def q_doc_len_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus length quantiles WITHOUT a global sort (r12,
    pipeline/stats.py): iterative histogram refinement — each pass is
    one parallel scan + a <= n_quantiles x n_bins histogram agg, so a
    64-bit range resolves in <= 7 passes and no task ever sorts or
    holds the corpus. Semantics are SQL-standard PERCENTILE_DISC
    (rank = max(1, ceil(q*n)) — DuckDB's quantile_disc convention,
    probed); the oracle states it directly as quantile_disc."""
    from ncagg_spark.pipeline.stats import exact_quantiles
    from ncagg_spark.pipeline.text import token_count

    d = _t(spark, sf_dir, "documents")
    return exact_quantiles(
        d, token_count(F.col("text")), [0.25, 0.5, 0.9, 0.99]
    )


def q_doc_winnow_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash (winnowing-style) fingerprint: min hash over 8-token
    shingle windows."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        winnow_fingerprint(tokenize(F.col("text")), window=8).alias("winnow_fp"),
    )


def q_doc_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END near-duplicate removal: SimHash near-dup pairs ->
    connected-components clustering -> keep the min-id representative per
    cluster. The deliverable of the whole dedup pipeline: the kept corpus
    with each survivor's duplicate-cluster size."""
    from ncagg_spark.pipeline.dedup import near_dedup

    d = _t(spark, sf_dir, "documents")
    sigs = simhash_signatures(d)
    pairs = simhash_near_duplicates(sigs, max_hamming=3).select("id_a", "id_b")
    return near_dedup(
        d, pairs, num_partitions=None, unique_pairs=True
    ).select("doc_id", "n_members")


def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination scan: which corpus docs share distinct
    word n-grams with which eval-set docs, and what fraction of each
    eval doc's grams they cover. Eval set = doc_id % 97 == 0 (held out
    of the corpus side). n=3 so genuine cross-doc overlap exists in the
    synthetic corpus; the production default (n=8) is exercised inside
    doc_clean_corpus where the eval docs ARE in the corpus."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return benchmark_overlap(corpus, bench, n=SHINGLE_N).select(
        "doc_id", "bench_id", "n_shared", "bench_frac"
    )


def q_doc_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END corpus cleaning — the one-call product surface a
    training-data user runs: quality gate (>= 0.75) -> exact dedup ->
    MinHash-LSH + Jaccard-verified near dedup -> span gate (drop docs
    sharing a >= 20-token verbatim span) -> decontamination against an
    eval set (doc_id % 97 == 0, which sits IN the corpus, so the decon
    stage provably fires). Returns each survivor with its near-dup
    cluster size."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    out, cached = clean_corpus(
        docs,
        min_quality=0.75,
        jaccard_threshold=0.8,
        shingle_n=SHINGLE_N,
        num_perm=MINHASH_PERMS,
        num_bands=LSH_BANDS,
        rows_per_band=LSH_ROWS,
        benchmark=bench,
        max_bench_frac=0.5,
        bench_ngram_n=8,
        max_shared_span=20,
        span_k=8,
        cc_num_partitions=None,
        keep_cached=True,
    )
    # One-shot path (r16, VERDICT r15 #3): materialize the small
    # (id, n_members) result while the gate+dedup subtree is still
    # cached — ONE gate evaluation per invocation instead of a full
    # recompute at action time — then release the handle in the same
    # call. Paired persist/unpersist per invocation: every repeat
    # recomputes from the parquet inputs.
    res = out.select("doc_id", "n_members")
    from ncagg_spark import plan_probe

    plan_probe.observe("clean-corpus-survivors", res)
    res = res.localCheckpoint(eager=True)
    cached.unpersist()
    return res


def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep one representative (min doc_id) per identical-text group."""
    return exact_dedup(_t(spark, sf_dir, "documents")).select("doc_id")


def q_doc_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs via pigeonhole block keys.
    max_hamming=3 over 8 4-bit blocks leaves >=5 blocks clean, so any
    pair within distance 3 agrees exactly on one of the C(8,5)=56
    5-block combination keys (r16; the r15 form was the degenerate
    >=1-of-4-byte-blocks case) — the sub-quadratic join returns EXACTLY
    what the oracle's quadratic scan finds."""
    sigs = simhash_signatures(_t(spark, sf_dir, "documents"))
    return simhash_near_duplicates(sigs, max_hamming=3)


def q_doc_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 trigrams by document frequency — the contamination /
    boilerplate-detection scan (which n-grams saturate the corpus).
    Distinct-per-doc explode -> map-side-combining count -> top-k with a
    total-order tiebreak (count DESC, gram ASC) so the LIMIT boundary is
    deterministic in both engines."""
    from ncagg_spark.pipeline.text import word_ngrams

    d = _t(spark, sf_dir, "documents")
    grams = d.select(
        F.explode(
            F.array_distinct(word_ngrams(tokenize(F.col("text")), SHINGLE_N))
        ).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("gram").asc())
        .limit(20)
    )


def q_doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clustering: connected components (iterative min-label
    propagation) over the SimHash near-dup pair graph. The oracle is a
    DuckDB recursive CTE over the same pairs — validating a genuinely
    iterative distributed algorithm against closed-form SQL."""
    from ncagg_spark.pipeline.dedup import connected_components

    sigs = simhash_signatures(_t(spark, sf_dir, "documents"))
    pairs = simhash_near_duplicates(sigs, max_hamming=3).select("id_a", "id_b")
    return connected_components(
        pairs, num_partitions=None, unique_pairs=True
    ).select(F.col("node").alias("doc_id"), "cluster_id")


def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= threshold) over a
    bounded corpus slice — the exact-threshold baseline the LSH variants
    approximate. Exact + SQL-expressible, so fully oracle-checked."""
    from ncagg_spark.functions.vectors import dot, l2_norm

    em = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    a = em.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        l2_norm("embedding").alias("na"),
    )
    b = em.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        l2_norm("embedding").alias("nb"),
    )
    pairs = (
        F.broadcast(a)
        .crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(dot("va", "vb") / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("cosine") >= 0.2)
    )
    return pairs.select("id_a", "id_b", "cosine")


SEMDEDUP_SLICE = 2000  # bounds the oracle's within-cell pair join at sf10
SEMDEDUP_THR = 0.3  # the synthetic embeddings top out near cosine 0.51
SEMDEDUP_PROBES = 2  # planted near-dup recall 0.67 -> ~0.96 (see tool)


def q_emb_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cell clustering bounds the
    pairwise cosine scan, then connected components over the within-cell
    near-dup pairs keep the min-id representative — the semantic twin of
    doc_near_dedup. Runs the multi-probe variant (probes=2: pairs found
    in ANY shared top-2 cell — planted-duplicate recall ~0.96 vs ~0.67
    single-cell, tools/semdedup_recall.py). Fully SQL-derivable:
    quantized-integer probe ranking (the IVF oracle trick) + a
    recursive-CTE CC (the doc_dup_clusters oracle trick)."""
    from ncagg_spark.pipeline.similarity import sample_centroids

    em = _t(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < SEMDEDUP_SLICE
    )
    n_cells = max(1, math.ceil(math.sqrt(em.count())))
    cents = sample_centroids(em, n_cells)
    kept = semantic_dedup(
        em,
        cents,
        threshold=SEMDEDUP_THR,
        probes=SEMDEDUP_PROBES,
        # CC round width derives from the measured pair-graph size
        # (connected_components adaptive default)
        num_partitions=None,
    )
    return kept.select("vec_id", "n_members")


def q_doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM scoring: train an add-one bigram model on the
    doc_id%10==0 reference slice, score every document by mean negative
    log-prob (integer micro-nat sums — exact in any partition order)."""
    docs = _t(spark, sf_dir, "documents")
    lm = ngram_lm(docs.filter(F.col("doc_id") % 10 == 0), n=2)
    return lm_score(docs, lm, n=2)


DSIR_BUCKETS = 512
DSIR_K = 50


def q_doc_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): hashed-bigram
    importance weights (target = doc_id%7==0 slice, raw = the rest) and
    a DETERMINISTIC Gumbel top-k resample — noise derived from the
    portable md5 hash, ranking key an integer micro-nat sum, so the
    draw is reproducible and fully oracle-checkable."""
    from ncagg_spark.pipeline.dsir import (
        dsir_sample,
        hashed_ngram_logratios,
    )

    docs = _t(spark, sf_dir, "documents")
    tgt = docs.filter(F.col("doc_id") % 7 == 0)
    raw = docs.filter(F.col("doc_id") % 7 != 0)
    lr = hashed_ngram_logratios(tgt, raw, n=2, buckets=DSIR_BUCKETS)
    return dsir_sample(raw, lr, k=DSIR_K, n=2, buckets=DSIR_BUCKETS)


BM25_TERMS = ["spark", "join", "window", "vector"]


def q_doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval (Lucene idf form): top-25 documents for a fixed
    term set, per-term contributions quantized to integer micro-units so
    the doc score is order-free; ties break to the lower doc_id."""
    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_TERMS, k=25)


def q_emb_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 10)
    # the relational (pair-fold) form: bit-exact vs the DuckDB oracle;
    # the public brute_force_topk delegates to the matmul scale shape
    return brute_force_topk_relational(em, queries, k=5)


def q_emb_srp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH with MULTI-PROBE (round 6): the query's own bucket plus
    its closest-plane flip neighbor — the probe list is re-derived in
    the DuckDB oracle from the same deterministic planes, so the whole
    multi-probe operator is value-hash-gated, not just the probes=1
    degenerate case."""
    em = _t(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 10)
    return srp_lsh_topk(em, queries, k=5, n_planes=8, dim=64, probes=2)


def q_emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with the sqrt(N) cell rule (round 8): n_cells =
    ceil(sqrt(N)) so per-cell candidate lists grow as sqrt(N) instead
    of linearly, n_probe = ceil(n_cells/4) so the probed fraction (and
    hence recall on this clusterless synthetic data) is
    scale-invariant. Assignment and probe ranking use the quantized-
    integer BLAS path (assign_cells method="quantized") — exact
    integers in any summation order, so the DuckDB oracle replicates
    the whole approximation bit-for-bit at every scale; final cosine
    scoring stays the exact relational form."""
    em = _t(spark, sf_dir, "embeddings")
    n_cells = max(1, math.ceil(math.sqrt(em.count())))
    n_probe = max(1, math.ceil(n_cells / 4))
    queries = em.filter(F.col("vec_id") < 10)
    return ivf_topk(
        em,
        queries,
        k=5,
        n_cells=n_cells,
        n_probe=n_probe,
        assign_method="quantized",
    )


PQ_M = 8  # subspaces (dim 64 -> 8 floats each)
PQ_CODES = 16  # codes per subspace
PQ_K, PQ_EXPAND = 5, 4


def q_emb_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN (ADC candidates + exact cosine rerank) in the
    oracle-parity relational form — codebooks are deterministic anchor
    subvectors, every float op left-to-right double (pipeline/pq.py:
    pq_topk_relational; production Arrow path = pq_train/pq_encode/
    pq_topk, measured in SCALE.md)."""
    from ncagg_spark.pipeline.pq import pq_topk_relational

    em = _t(spark, sf_dir, "embeddings")
    queries = em.filter(F.col("vec_id") < 10)
    return pq_topk_relational(
        em, queries, dim=64, m=PQ_M, n_codes=PQ_CODES, k=PQ_K,
        expand=PQ_EXPAND,
    )


def q_emb_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composition (IVFADC, round 10 — VERDICT r9 #4): the
    sqrt(N)-cell coarse quantizer of emb_ivf_topk (quantized-integer
    assignment/probe ranking — exact in any summation order, so the
    oracle replicates it bit-for-bit) routes the anchor-codebook ADC of
    emb_pq_topk to only the probed ~n_probe/n_cells of the codes, then
    the exact cosine rerank restores exact ordering. The composition is
    THE standard big-corpus index: vs the flat ADC scan the scored
    fraction drops by ~sqrt(N) under the sqrt(N) cell rule
    (pipeline/pq.py:ivf_pq_topk_relational; production Arrow path =
    build_ivf_pq_index + ivf_pq_topk)."""
    from ncagg_spark.pipeline.pq import ivf_pq_topk_relational

    em = _t(spark, sf_dir, "embeddings")
    n_cells = max(1, math.ceil(math.sqrt(em.count())))
    n_probe = max(1, math.ceil(n_cells / 4))
    queries = em.filter(F.col("vec_id") < 10)
    return ivf_pq_topk_relational(
        em,
        queries,
        dim=64,
        m=PQ_M,
        n_codes=PQ_CODES,
        n_cells=n_cells,
        n_probe=n_probe,
        k=PQ_K,
        expand=PQ_EXPAND,
    )


KM_CELLS = 8
KM_ITERS = 2
KM_QUANT = 1_000_000


def q_emb_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k with REAL trained centroids: 2 Lloyd iterations of
    distributed spherical k-means, then the probe search. The training is
    cross-engine deterministic by construction — multiplicative-hash
    init + integer-quantized update sums (associative, so partitioning
    cannot change the result) — which is what makes an iterative
    algorithm oracle-checkable at all (and run-to-run reproducible on a
    real cluster)."""
    em = _t(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(
        em,
        KM_CELLS,
        max_iter=KM_ITERS,
        tol=0.0,
        init="mult",
        update_quantization=KM_QUANT,
    )
    queries = em.filter(F.col("vec_id") < 10)
    return ivf_topk(
        em, queries, k=5, n_cells=KM_CELLS, n_probe=3, centroids=cents
    )


def q_mm_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing demo: documents' text bytes as opaque blobs;
    content-hash + size computed engine-side (sha2 on binary)."""
    d = _t(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "utf-8")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.sha2(blob, 256).alias("sha256"),
        F.length(blob).cast("long").alias("n_bytes"),
    )


def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full mapInPandas feature-extraction path (fake decoder) — not SQL
    expressible; driver records rows-only.

    The feature array<float> is posexploded to scalar (media_id, sha256,
    n_bytes, pos, value) rows: the driver's pandas canonicalizer cannot
    sort/hash list cells (r1 doc_minhash_sig, r2 mm_features — same fix
    as agg_multidim)."""
    from ncagg_spark.pipeline.multimodal import extract_features

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("content"),
    )
    feats = extract_features(d)
    return feats.select(
        "media_id",
        "sha256",
        "n_bytes",
        F.posexplode("feature").alias("pos", "value"),
    )


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: bounded cadence-regularized day aggregation at sf0.001."""
    return q_agg_regularize_day(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Canonical query registry (VERDICT r6 #8): ONE table of every declared
# query; ``queries()`` is a view of it. The driver checks only the FIRST
# 50 entries of queries(), so the registry is ordered in-window first
# (at-risk / newest queries lead) and tail after; tools/check_oracle.py
# iterates the whole dict and therefore gates every row including the
# tail. in_window=False rows each keep a driver-checked twin covering
# the same operator family (noted inline) plus pytest coverage —
# rotation history lives in git, not in comments here.
# ---------------------------------------------------------------------------
DRIVER_WINDOW = 50

_REGISTRY: list[tuple[str, _T, bool]] = [
    # (name, fn, in_window)
    # r14 rotation: 9 in / 9 out, window stays 50. IN: the new
    # doc_stratified_split (first oracle pass for the sampling family)
    # + the longest-tail returners agg_regularize_anchored,
    # agg_dedup_phase (tail since r10), emb_ivf_kmeans_topk,
    # mm_hash_features, doc_chunk, doc_ngram_jaccard, doc_token_count
    # (tail since r11), and rel_anti_join (its distinct-first broadcast
    # fix in r13 deserves a fresh driver-window hash). OUT (twins named
    # inline at each entry): agg_coalesce_alt, agg_cf_time,
    # agg_block_diagonal, rel_q5_nation_volume, rel_intersect_except,
    # doc_dup_clusters, emb_pq_topk, doc_exact_dedup, doc_top_ngrams.
    # r13 rotation (VERDICT r12 #8): 8 in / 8 out, window stays 50.
    # IN: rel_cube, rel_exists_subquery, doc_lang_id, doc_minhash_sig,
    # emb_brute_topk (back through the window) + the three r12 tail
    # queries stream_gap_fill_ooo, stream_sessionize, doc_len_quantiles
    # (first driver-gate pass). OUT (each with its in-window twin named
    # inline at its entry): stream_gap_fill, rel_semi_join, rel_rollup,
    # doc_text_stats, doc_lsh_pairs, emb_near_dup, evt_sessionize,
    # doc_quality_filter.
    # -- streaming online gap-fill + composed product surfaces lead:
    #    newest, so a count- or time-capped driver run still covers them
    ("stream_gap_fill", q_stream_gap_fill, False),  # r13 out; twin: stream_gap_fill_ooo (identical DuckDB oracle, stricter out-of-order regime)
    # r11 rotation (VERDICT r10 #8): rel_semi_join / rel_window_agg /
    # rel_union_distinct re-enter the window after 6 tail rounds so
    # every capability re-earns a driver-gate hash; out go three
    # long-green queries whose operator families keep in-window twins:
    # emb_ivf_kmeans_topk (twin emb_ivf_topk — same IVF search; the
    # kmeans trainer also feeds in-window emb_ivfpq_topk),
    # doc_ngram_jaccard (the Jaccard verify runs inside in-window
    # doc_clean_corpus and doc_near_dedup), doc_token_count (twin
    # doc_text_stats — same tokenizer expression family)
    ("rel_semi_join", q_rel_semi_join, False),  # r13 out; twin: rel_exists_subquery (same semi-join semantics)
    ("rel_window_agg", q_rel_window_agg, True),
    ("rel_union_distinct", q_rel_union_distinct, True),
    ("doc_clean_corpus", q_doc_clean_corpus, True),
    ("doc_decontaminate", q_doc_decontaminate, True),
    ("doc_lm_score", q_doc_lm_score, True),  # r11: CCNet-style LM scoring
    ("doc_bm25_topk", q_doc_bm25_topk, True),  # r11: BM25 retrieval
    ("doc_dsir_sample", q_doc_dsir_sample, True),  # r11: DSIR resampling
    # r11 second half: sequence packing (distributed prefix sum) and the
    # Gopher repetition gate enter the window; out go mm_hash_features
    # (twin mm_features — same mapInPandas feature extractor) and
    # doc_chunk (twin doc_pack_sequences — same token-segment-manifest
    # family: explode over token offsets, integer segment arithmetic)
    ("doc_pack_sequences", q_doc_pack_sequences, True),
    ("doc_pack_bpeish", q_doc_pack_bpeish, True),  # r12: count_col packing path
    ("doc_repetition_filter", q_doc_repetition_filter, True),
    ("emb_srp_topk", q_emb_srp_topk, True),
    ("emb_ivfpq_topk", q_emb_ivfpq_topk, True),  # r10: IVFADC composition
    ("emb_ivf_topk", q_emb_ivf_topk, False),  # r15 out (13 rounds); twin: emb_ivfpq_topk (same coarse quantizer, probes, and quantized assignment)
    ("mm_features", q_mm_features, False),  # r15 out (13 rounds); twin: mm_hash_features (same mapInPandas feature extractor)
    ("agg_multidim", q_agg_multidim, True),
    # -- ncagg core (events) --
    ("agg_regularize_day", q_agg_regularize_day, False),  # r15 out after 14 straight green rounds; twin: agg_regularize_anchored (same grid/gapfill operator, G1-G7)
    ("agg_dedup_cadence", q_agg_dedup_cadence, False),  # r15 out (14 rounds); twin: agg_dedup_phase (same overlap-chop operator, G5/G6)
    ("agg_nc_ingest", q_agg_nc_ingest, True),
    ("stream_day_merge", q_stream_day_merge, False),  # r15 out (10 rounds); twins: stream_late_drop (back in-window, same watermark dedup), stream_gap_fill_ooo
    ("agg_bounds_filter", q_agg_bounds_filter, True),
    ("agg_manifest_attrs", q_agg_manifest_attrs, True),
    ("agg_coalesce_alt", q_agg_coalesce_alt, False),  # r14 out; twin: agg_take_dim_index (same operators/projection.py family)
    ("agg_take_dim_index", q_agg_take_dim_index, True),
    ("agg_flatten_by_index", q_agg_flatten_by_index, False),  # r15 out (14 rounds); twin: agg_flatten_overlay (back in-window, same flatten family J2)
    ("agg_promote_dim", q_agg_promote_dim, False),  # r15 out (14 rounds); twin: agg_multidim (same multidim grain family G8)
    ("agg_block_diagonal", q_agg_block_diagonal, False),  # r14 out; twin: agg_multidim (multi-unlimited-dim grain family)
    ("agg_cf_time", q_agg_cf_time, False),  # r14 out; twin: agg_nc_ingest (CF time decode runs inside the granule ingest)
    ("evt_sessionize", q_evt_sessionize, False),  # r13 out; twin: stream_sessionize (same > gap split rule, streaming form)
    ("evt_json_props", q_evt_json_props, True),
    ("evt_asof_purchase", q_evt_asof_purchase, False),  # r15 out (14 rounds); twin: evt_asof_next_error (back in-window, same as-of join operator)
    # -- relational surface --
    ("rel_q1_pricing", q_rel_q1_pricing, False),  # r15 out (14 rounds); twins: rel_grouping_sets (back in-window, same lineitem agg family), rel_cube
    ("rel_q3_topk", q_rel_q3_topk, True),
    ("rel_q5_nation_volume", q_rel_q5_nation_volume, False),  # r14 out; twin: rel_q3_topk (multi-join agg family)
    # r10: rel_cube rotated back IN (VERDICT r9 #8) and emb_ivfpq_topk
    # (new) joins the window; agg_regularize_anchored (twin
    # agg_regularize_day — same grid/gapfill operator, G1-G7) and
    # agg_dedup_phase (twin agg_dedup_cadence — same overlap-chop
    # operator, G5/G6) rotate to the tail after 8 straight green rounds
    # r12 rotation (VERDICT r11 #8): rel_rollup / doc_top_ngrams /
    # doc_simhash_near_dup / emb_near_dup come back through the window
    # (tail since r11) plus the new doc_pack_bpeish; out go rel_cube,
    # rel_exists_subquery, doc_lang_id, doc_minhash_sig,
    # emb_brute_topk — each with its in-window twin named inline
    ("rel_rollup", q_rel_rollup, False),  # r13 out; twin: rel_cube (same grouping-sets family)
    ("rel_cube", q_rel_cube, True),  # r13: back in-window
    ("rel_intersect_except", q_rel_intersect_except, False),  # r14 out; twin: rel_union_distinct (set-op passthroughs)
    ("rel_exists_subquery", q_rel_exists_subquery, True),  # r13: back in-window
    # -- documents (LLM-pipeline text ops) --
    ("doc_exact_dedup", q_doc_exact_dedup, False),  # r14 out; twin: doc_clean_corpus (exact-dedup stage runs inside)
    ("doc_text_stats", q_doc_text_stats, False),  # r13 out; twin: doc_lang_id (same tokenizer expression family)
    ("doc_quality_filter", q_doc_quality_filter, False),  # r13 out; twin: doc_clean_corpus (the quality gate runs inside)
    ("doc_lang_id", q_doc_lang_id, True),  # r13: back in-window
    ("doc_minhash_sig", q_doc_minhash_sig, True),  # r13: back in-window
    ("doc_lsh_pairs", q_doc_lsh_pairs, False),  # r13 out; twins: doc_minhash_sig (same signature kernel), doc_near_dedup (LSH pairs run inside)
    ("doc_simhash_near_dup", q_doc_simhash_near_dup, True),  # r12: back in-window
    ("doc_stratified_split", q_doc_stratified_split, True),  # r14: NEW — deterministic sampling family, first oracle pass
    ("doc_dup_spans", q_doc_dup_spans, True),
    ("doc_top_ngrams", q_doc_top_ngrams, False),  # r14 out; twin: doc_bm25_topk (same tokenizer + bounded_topk idiom)
    ("doc_dup_clusters", q_doc_dup_clusters, False),  # r14 out; twin: doc_near_dedup (CC runs inside end-to-end near-dedup)
    ("doc_near_dedup", q_doc_near_dedup, True),
    ("doc_pii_redact", q_doc_pii_redact, True),
    # -- embeddings (similarity) --
    ("emb_near_dup", q_emb_near_dup, False),  # r13 out; twin: emb_brute_topk (same brute cosine kernel)
    ("emb_semdedup", q_emb_semdedup, True),  # r11: SemDeDup cluster-scoped dedup
    ("emb_brute_topk", q_emb_brute_topk, True),  # r13: back in-window
    ("emb_pq_topk", q_emb_pq_topk, False),  # r14 out; twin: emb_ivfpq_topk (same PQ codebooks + ADC scoring)
    # -- tail (past the driver window; check_oracle gates them all) --
    ("emb_ivf_kmeans_topk", q_emb_ivf_kmeans_topk, True),  # r14: back in-window
    ("mm_hash_features", q_mm_hash_features, True),  # r14: back in-window
    ("doc_chunk", q_doc_chunk, True),  # r14: back in-window
    ("doc_ngram_jaccard", q_doc_ngram_jaccard, True),  # r14: back in-window
    ("doc_token_count", q_doc_token_count, True),  # r14: back in-window
    ("agg_regularize_anchored", q_agg_regularize_anchored, True),  # r14: back in-window
    ("agg_dedup_phase", q_agg_dedup_phase, True),  # r14: back in-window
    ("evt_asof_next_error", q_evt_asof_next_error, True),  # r15: back in-window (tail since r6)
    ("evt_sessionize_skew", q_evt_sessionize_skew, False),  # twin: evt_sessionize (r11: skew-routed strategy)
    ("doc_simhash", q_doc_simhash, False),  # twin: doc_simhash_near_dup
    ("rel_window_topk", q_rel_window_topk, False),  # twin: emb_brute_topk
    ("rel_anti_join", q_rel_anti_join, True),  # r14: back in-window (r13 distinct-first fix)
    ("stream_late_drop", q_stream_late_drop, True),  # r15: back in-window (tail since r8)
    # r12: eventtime-ordered gap fill under out-of-order granule
    # arrival — same oracle as stream_gap_fill (twin), tail slot
    ("stream_gap_fill_ooo", q_stream_gap_fill_ooo, True),  # r13: in-window
    # r12: exact distributed quantiles (no global sort) — tail slot
    ("doc_len_quantiles", q_doc_len_quantiles, True),  # r13: in-window
    # r12: native session-window streaming sessionize — tail slot
    # (twin evt_sessionize: same session rule, batch lag-window form)
    ("stream_sessionize", q_stream_sessionize, True),  # r13: in-window
    # r14: NEW — count-driven corpus mixing, first oracle pass; tail
    # slot (the r12 pattern: new ops enter through the full-registry
    # gate, rotate into the driver window next round). In-window twin:
    # doc_stratified_split (same hash-ticket sampling kernel).
    ("doc_mix_corpora", q_doc_mix_corpora, True),  # r15: in-window (promised at r14 entry; count-driven mixing, now single-scan)
    # r5-retired variants, restored to the checked tail in r7 — their
    # fns + oracles never left; listing them here puts them back under
    # tools/check_oracle.py's full gate at zero new code
    ("agg_flatten_overlay", q_agg_flatten_overlay, True),  # r15: back in-window (tail since r1)
    ("doc_exact_duplicates", q_doc_exact_duplicates, False),
    ("doc_winnow_fp", q_doc_winnow_fp, True),  # r15: back in-window (tail since r1)
    ("rel_distinct_count", q_rel_distinct_count, True),  # r15: back in-window (tail since r4)
    ("rel_grouping_sets", q_rel_grouping_sets, True),  # r15: back in-window (tail since r4)
    ("rel_moving_avg", q_rel_moving_avg, True),  # r15: back in-window (tail since r3)
    ("rel_part_type_revenue", q_rel_part_type_revenue, False),
    ("rel_region_volume", q_rel_region_volume, False),
    ("rel_scalar_subquery", q_rel_scalar_subquery, True),  # r15: back in-window (tail since r4 — staleness rotation, VERDICT r14 #2)
]


def queries() -> dict[str, _T]:
    """Driver view of the registry: in-window entries first (exactly the
    first DRIVER_WINDOW get driver-gated), tail after — one source of
    truth, no hand-maintained ordering."""
    reg = [(n, f, w) for n, f, w in _REGISTRY if f is not None]
    d = {n: f for n, f, w in reg if w}
    if len(d) > DRIVER_WINDOW:  # not assert: survives python -O
        raise ValueError(
            f"{len(d)} in-window queries exceed the driver's "
            f"{DRIVER_WINDOW}-slot check window — rotate one to the tail"
        )
    d.update({n: f for n, f, w in reg if not w})
    return d


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_EV_DAY = f"""
    SELECT *, (epoch_us(ts) - {DAY_LO_US}) // {STEP_US} AS bucket
    FROM events
    WHERE ts IS NOT NULL AND epoch_us(ts) > 0
      AND ts >= make_timestamp({DAY_LO_US}) AND ts < make_timestamp({DAY_HI_US})
"""

_EV_DEDUP = f"""
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY ts, event_id) AS rn
        FROM ({_EV_DAY})
    ) WHERE rn = 1
"""

_GRID = f"SELECT unnest(generate_series(0, {N_BUCKETS - 1})) AS bucket"

_TOKENS = sql_tokenize("text")
_SHINGLES = f"list_distinct({sql_word_ngrams(_TOKENS, SHINGLE_N)})"


def _sql_simhash_sigs(src: str = "documents") -> str:
    """Relational SimHash signature subquery (doc_id, simhash) —
    value-identical to the ``sql_simhash64`` expression form (same
    token hash, same vote rule, empty docs keep simhash 0 via the LEFT
    JOIN) but ~4x faster in DuckDB: the expression form re-renders the
    token-hash list once per bit vote and DuckDB only partially CSEs
    it, so every token is md5-hashed repeatedly; unnesting tokens to
    rows hashes each token ONCE and folds the 32 bit votes into one
    grouped aggregate (VERDICT r14 #1 — the dominant term of the sf10
    simhash-oracle cost)."""
    from ncagg_spark.functions.hashing import SIMHASH_BITS

    h = sql_hash64("tok")
    votes = ", ".join(
        f"SUM((((h >> {j}) & 1) * 2 - 1)) AS v{j}"
        for j in range(SIMHASH_BITS)
    )
    acc = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN {1 << j}::BIGINT ELSE 0 END)"
        for j in range(SIMHASH_BITS)
    )
    return f"""(
        WITH __tok AS (
            SELECT doc_id, {h} AS h
            FROM (SELECT doc_id, unnest({_TOKENS}) AS tok FROM {src})
        ),
        __votes AS (SELECT doc_id, {votes} FROM __tok GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(({acc}), 0::BIGINT) AS simhash
        FROM {src} d LEFT JOIN __votes v ON d.doc_id = v.doc_id
    )"""


def _sql_band_exprs() -> str:
    """DuckDB band-hash list for the shared LSH constants."""
    parts = []
    for i in range(LSH_BANDS):
        cat = " || '_' || ".join(
            f"CAST(sig[{i * LSH_ROWS + j + 1}] AS VARCHAR)"
            for j in range(LSH_ROWS)
        )
        parts.append(sql_hash64(f"({cat})"))
    return "[" + ", ".join(parts) + "]"


def _sql_sigs(src: str = "documents") -> str:
    """MinHash signature fragment over any (doc_id, text) source —
    parameterized so the clean-corpus oracle can run the identical LSH
    on its quality/exact-dedup survivor CTE."""
    return f"""
    SELECT doc_id, {sql_minhash_signature(_SHINGLES, MINHASH_PERMS)} AS sig
    FROM {src}
"""


def _sql_bands(src: str = "documents") -> str:
    return f"""
    SELECT doc_id, band - 1 AS band, bh
    FROM (
        SELECT doc_id, unnest({_sql_band_exprs()}) AS bh,
               generate_subscripts({_sql_band_exprs()}, 1) AS band
        FROM ({_sql_sigs(src)})
    )
"""


def _sql_lsh_pairs(src: str = "documents") -> str:
    return f"""
    WITH bands AS ({_sql_bands(src)}),
    sized AS (
        SELECT *, count(*) OVER (PARTITION BY band, bh) AS n_occ
        FROM bands
    ),
    -- mirror minhash_lsh_candidates' bucket guard: a band bucket with
    -- more than max_bucket_size (default 1000) members is dropped
    -- ENTIRELY on the Spark side, so the oracle must drop it too
    capped AS (SELECT * FROM sized WHERE n_occ <= 1000)
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM capped a JOIN capped b
      ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
"""


_SQL_SIGS = _sql_sigs()
_SQL_LSH_PAIRS = _sql_lsh_pairs()

# quality expression over a `toks` column — shared by doc_text_stats /
# doc_quality_filter / the clean-corpus oracle so the gate can never
# diverge between them
_SQL_QUALITY = f"""round((least(({sql_stopword_hits('toks', 'en')}::DOUBLE
                             / greatest(len(toks), 1)) * 5.0, 1.0)
                      + (CASE WHEN len(toks) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
                      + (CASE WHEN (list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                                    / greatest(len(toks), 1)) BETWEEN 2.0 AND 12.0
                              THEN 1.0 ELSE 0.0 END)) / 3.0, 6)"""

_SQL_LANG_CASE = (
    "CASE "
    + " ".join(
        f"WHEN {sql_stopword_hits('toks', lang)} > 0 AND "
        + " AND ".join(
            f"{sql_stopword_hits('toks', lang)} >= {sql_stopword_hits('toks', other)}"
            for other in LANG_PRECEDENCE
            if other != lang
        )
        + f" THEN '{lang}'"
        for lang in LANG_PRECEDENCE
    )
    + " ELSE 'und' END"
)

_SQL_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "x -> x[1]::DOUBLE * x[2]::DOUBLE))"
)
_SQL_NORM = (
    "sqrt(list_sum(list_transform({a}, v -> v::DOUBLE * v::DOUBLE)))"
)


def _sql_cosine(a: str, b: str) -> str:
    return (
        f"({_SQL_DOT.format(a=a, b=b)} / "
        f"({_SQL_NORM.format(a=a)} * {_SQL_NORM.format(a=b)}))"
    )


def _sql_srp_bucket(vec: str, n_planes: int = 8, dim: int = 64) -> str:
    """DuckDB twin of similarity.srp_bucket: same deterministic planes
    (seed 42), same left-to-right double arithmetic, so the bucket ids are
    bit-identical. Plane literals printed with repr() round-trip exactly."""
    from ncagg_spark.pipeline.similarity import random_hyperplanes

    terms = []
    for i, plane in enumerate(random_hyperplanes(n_planes, dim, 42)):
        lit = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
        dotp = (
            f"list_sum(list_transform(list_zip({vec}, {lit}), "
            "x -> x[1]::DOUBLE * x[2]::DOUBLE))"
        )
        terms.append(f"(CASE WHEN {dotp} > 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def _sql_srp_probe_buckets(
    vec: str, n_planes: int = 8, dim: int = 64, probes: int = 2
) -> str:
    """DuckDB twin of similarity.srp_probe_buckets: the query's own
    bucket plus probes-1 single-bit flips, flipping the planes with the
    smallest |dot| first (ties by plane index) — identical fold order to
    the Spark expression, so the probe LIST is bit-identical."""
    from ncagg_spark.pipeline.similarity import random_hyperplanes

    planes = random_hyperplanes(n_planes, dim, 42)
    dots = []
    for plane in planes:
        lit = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
        dots.append(
            f"list_sum(list_transform(list_zip({vec}, {lit}), "
            "x -> x[1]::DOUBLE * x[2]::DOUBLE))"
        )
    dlist = "[" + ", ".join(dots) + "]"
    idx = "[" + ", ".join(str(i) for i in range(n_planes)) + "]"
    base = "(CAST(0 AS BIGINT) + " + " + ".join(
        f"(CASE WHEN {d} > 0 THEN CAST({1 << i} AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END)"
        for i, d in enumerate(dots)
    ) + ")"
    order = (
        f"list_transform(list_sort(list_zip("
        f"list_transform({dlist}, d -> abs(d)), {idx})), s -> s[2])"
    )
    extra = max(min(probes, n_planes + 1) - 1, 0)
    return (
        f"list_prepend({base}, list_transform({order}[1:{extra}], "
        f"i -> xor({base}, (CAST(1 AS BIGINT) << i))))"
    )


# Heavy-oracle intermediate fragments, (re)filled on each oracle_sql()
# call: name -> standalone SELECT producing the intermediate
# (tools/oracle_cache.py materializes these to fingerprint-keyed
# parquet and re-invokes oracle_sql(_cache=...) with read_parquet
# references). Not part of the driver contract.
_ORACLE_HEAVY: dict[str, str] = {}


def oracle_heavy_fragments() -> dict[str, str]:
    """SQL for the cacheable heavy oracle intermediates (VERDICT r14
    #1). Each value is the CANONICAL computation — the exact CTE text
    oracle_sql() embeds inline when no cache is supplied — wrapped as a
    standalone SELECT, so a cached gate run provably evaluates the same
    SQL, just once instead of per-oracle per-run. ``ivfpq_enc``
    contains a ``{corpus}`` placeholder to be filled with the (already
    materialized) ivf_corpus relation."""
    oracle_sql()
    return dict(_ORACLE_HEAVY)


def oracle_sql(_cache: dict[str, str] | None = None) -> dict[str, str]:
    sqls: dict[str, str] = {}

    sqls["agg_regularize_day"] = f"""
        WITH dedup AS ({_EV_DEDUP}), grid AS ({_GRID})
        SELECT g.bucket,
               coalesce(d.ts, make_timestamp({DAY_LO_US} + g.bucket * {STEP_US})) AS ts,
               d.event_id, d.value, (d.ts IS NULL) AS is_fill
        FROM grid g LEFT JOIN dedup d USING (bucket)
    """

    # anchored fill semantics (operators/gapfill.py anchor="previous"):
    # mid/trailing fills continue from the last real record; LEADING
    # fills (no real record precedes) back-compute from the FIRST real
    # record (the reference's ncagg/aggregator.py:176-191 rule); grid
    # only when the input is empty.
    sqls["agg_regularize_anchored"] = f"""
        WITH dedup AS ({_EV_DEDUP}), grid AS ({_GRID}),
        j AS (
            SELECT g.bucket, d.ts AS real_ts, d.event_id
            FROM grid g LEFT JOIN dedup d USING (bucket)
        ),
        fr AS (
            SELECT min(bucket) AS fr_bkt,
                   min_by(ts, bucket) AS fr_ts
            FROM dedup
        ),
        anch AS (
            SELECT bucket, real_ts, event_id,
                last_value(real_ts IGNORE NULLS) OVER (
                    ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                ) AS last_ts,
                last_value(CASE WHEN real_ts IS NOT NULL THEN bucket END IGNORE NULLS)
                    OVER (ORDER BY bucket
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_bkt
            FROM j
        )
        SELECT a.bucket,
               coalesce(a.real_ts,
                        make_timestamp(epoch_us(a.last_ts) + (a.bucket - a.last_bkt) * {STEP_US}),
                        CASE WHEN f.fr_bkt IS NOT NULL AND a.bucket < f.fr_bkt
                              AND epoch_us(f.fr_ts) - (f.fr_bkt - a.bucket) * {STEP_US} >= {DAY_LO_US}
                             THEN make_timestamp(epoch_us(f.fr_ts) - (f.fr_bkt - a.bucket) * {STEP_US})
                        END,
                        make_timestamp({DAY_LO_US} + a.bucket * {STEP_US})) AS ts,
               a.event_id, (a.real_ts IS NULL) AS is_fill
        FROM anch a CROSS JOIN fr f
    """

    sqls["agg_dedup_cadence"] = f"""
        SELECT bucket, ts, event_id, value FROM ({_EV_DEDUP})
    """

    # the .nc round trip: ts (integer us) -> CF double seconds (us/1e6)
    # in the classic file -> floor(sec*1e6) on decode. Same IEEE ops on
    # both engines, so the decoded grid hash-matches exactly.
    sqls["agg_nc_ingest"] = f"""
        WITH rt AS (
            SELECT make_timestamp(CAST(floor((epoch_us(ts) / 1000000.0)
                       * 1000000.0) AS BIGINT)) AS ts,
                   event_id, value
            FROM events
            WHERE ts IS NOT NULL AND epoch_us(ts) > 0
              AND ts >= make_timestamp({DAY_LO_US})
              AND ts < make_timestamp({DAY_HI_US})
        ),
        bkt AS (
            SELECT *, (epoch_us(ts) - {DAY_LO_US}) // {STEP_US} AS bucket
            FROM rt
        ),
        dedup AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY bucket
                           ORDER BY ts, event_id) AS rn
                FROM bkt
            ) WHERE rn = 1
        ),
        grid AS ({_GRID})
        SELECT g.bucket,
               coalesce(d.ts, make_timestamp({DAY_LO_US} + g.bucket * {STEP_US})) AS ts,
               d.event_id, d.value, (d.ts IS NULL) AS is_fill
        FROM grid g LEFT JOIN dedup d USING (bucket)
    """

    # streaming late-drop: the watermark drops every straggler in the
    # late granule, so the oracle sees ONLY the on-time (%5 != 0) rows —
    # earliest per minute slot over the first half-day
    _HALF_HI_US = DAY_LO_US + (DAY_HI_US - DAY_LO_US) // 2
    sqls["stream_late_drop"] = f"""
        WITH src AS (
            SELECT ts, event_id, value,
                   (epoch_us(ts) - {DAY_LO_US}) // {STEP_US} AS bucket
            FROM events
            WHERE ts IS NOT NULL AND epoch_us(ts) > 0
              AND ts >= make_timestamp({DAY_LO_US})
              AND ts < make_timestamp({_HALF_HI_US})
              AND event_id % 5 <> 0
        )
        SELECT bucket, ts, event_id, value FROM (
            SELECT *, row_number() OVER (
                PARTITION BY bucket ORDER BY ts, event_id) AS rn
            FROM src
        ) WHERE rn = 1
    """

    # incremental (4-micro-batch foreachBatch merge) == one-shot batch:
    # the oracle is simply the batch day-regularization
    sqls["stream_day_merge"] = f"""
        WITH dedup AS ({_EV_DEDUP}), grid AS ({_GRID})
        SELECT coalesce(d.ts, make_timestamp({DAY_LO_US} + g.bucket * {STEP_US})) AS ts,
               d.event_id, d.value, (d.ts IS NULL) AS is_fill
        FROM grid g LEFT JOIN dedup d USING (bucket)
    """

    # online stateful gap fill (applyInPandasWithState) == one-shot
    # batch rule: real rows pass through; per key, every consecutive
    # pair more than dt_max apart emits the missing cadence slots
    # prev + k*step. The engine's slot count uses python round() and
    # the oracle floor(x+0.5) — identical except at exact half-steps,
    # which microsecond-grained event gaps never hit.
    sqls["stream_gap_fill"] = f"""
        WITH src AS (
            SELECT event_type AS key, ts
            FROM events
            WHERE ts IS NOT NULL AND epoch_us(ts) > 0
              AND ts >= make_timestamp({DAY_LO_US})
              AND ts < make_timestamp({GF_HI_US})
        ),
        ordered AS (
            SELECT key, ts,
                   lag(epoch_us(ts)) OVER (
                       PARTITION BY key ORDER BY ts) AS prev_us
            FROM src
        ),
        gaps AS (
            SELECT key, prev_us,
                   least(greatest(1,
                       CAST(floor((epoch_us(ts) - prev_us) / {GF_STEP_US}.0
                                  + 0.5) AS BIGINT) - 1), 10000) AS n
            FROM ordered
            WHERE prev_us IS NOT NULL
              AND epoch_us(ts) - prev_us > {GF_DTMAX_US}
        )
        SELECT key, ts, FALSE AS is_fill FROM src
        UNION ALL
        SELECT g.key,
               make_timestamp(g.prev_us + k.k * {GF_STEP_US}) AS ts,
               TRUE AS is_fill
        FROM gaps g,
             LATERAL (SELECT unnest(generate_series(1, g.n)) AS k) k
    """
    # identical semantics regardless of arrival order — the point of the
    # eventtime mode (r12): one oracle, two ingestion orders
    sqls["stream_gap_fill_ooo"] = sqls["stream_gap_fill"]

    # native session_window streaming sessionize: the batch lag-window
    # session rule over the same slice (merge at diff <= gap — probed
    # equal to session_window's boundary behavior)
    sqls["stream_sessionize"] = f"""
        WITH e AS (
            SELECT event_type AS key, ts FROM events
            WHERE ts IS NOT NULL AND epoch_us(ts) > 0
              AND ts >= make_timestamp({DAY_LO_US})
              AND ts < make_timestamp({GF_HI_US})
        ),
        lagged AS (
            SELECT *, lag(ts) OVER (PARTITION BY key ORDER BY ts) AS prev
            FROM e
        ),
        flagged AS (
            SELECT *, CASE WHEN prev IS NULL
                             OR epoch_us(ts) - epoch_us(prev)
                                > {SESS_STREAM_GAP_US}
                           THEN 1 ELSE 0 END AS is_new
            FROM lagged
        ),
        sessioned AS (
            SELECT *, SUM(is_new) OVER (PARTITION BY key ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING)
                      AS session_idx
            FROM flagged
        )
        SELECT key, min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events
        FROM sessioned GROUP BY key, session_idx
    """

    from ncagg_spark.pipeline.stats import sql_exact_quantiles

    sqls["doc_len_quantiles"] = sql_exact_quantiles(
        "documents", f"len({_TOKENS})", [0.25, 0.5, 0.9, 0.99]
    )

    # nearest-slot assignment: floor(x + 0.5) on the identical IEEE-double
    # expression, clamped into the final slot like operators/regularize.py
    sqls["agg_dedup_phase"] = f"""
        WITH ph AS (
            SELECT *, least(
                CAST(floor((epoch_us(ts) - {DAY_LO_US}) / {STEP_US} + 0.5) AS BIGINT),
                {N_BUCKETS - 1}) AS bucket
            FROM events
            WHERE ts IS NOT NULL AND epoch_us(ts) > 0
              AND ts >= make_timestamp({DAY_LO_US}) AND ts < make_timestamp({DAY_HI_US})
        )
        SELECT bucket, ts, event_id, value FROM (
            SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY ts, event_id) AS rn
            FROM ph
        ) WHERE rn = 1
    """

    # multidim (G8): both real and synthesized fill arrays follow
    # ob_ts = slot/record ts + j * inner_step, so the oracle is the
    # grid-fill join crossed with the inner-sample index.
    sqls["agg_multidim"] = f"""
        WITH dedup AS ({_EV_DEDUP}), grid AS ({_GRID}),
        base AS (
            SELECT coalesce(d.ts, make_timestamp({DAY_LO_US} + g.bucket * {STEP_US})) AS ts,
                   d.event_id, (d.ts IS NULL) AS is_fill
            FROM grid g LEFT JOIN dedup d USING (bucket)
        )
        SELECT ts, event_id, is_fill, j AS inner_idx,
               make_timestamp(epoch_us(ts) + j * {MD_INNER_STEP_US}) AS ob_ts
        FROM base, (SELECT unnest(generate_series(0, {MD_INNER - 1})) AS j)
    """

    sqls["agg_bounds_filter"] = f"""
        SELECT event_id, ts, user_id, event_type, value
        FROM events
        WHERE ts IS NOT NULL AND epoch_us(ts) > 0
          AND ts >= make_timestamp({DAY_LO_US}) AND ts < make_timestamp({DAY_HI_US})
    """

    sqls["agg_manifest_attrs"] = """
        WITH man AS (
            SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS granule,
                   min(ts) AS index_min, max(ts) AS index_max,
                   count(*) AS row_count, min(event_type) AS file_attr
            FROM events GROUP BY 1
        )
        SELECT count(*) AS input_count,
               CAST(sum(row_count) AS BIGINT) AS total_rows,
               arg_min(granule, index_min) AS first_input,
               arg_max(granule, index_max) AS last_input,
               strftime(min(index_min), '%Y-%m-%dT%H:%M:%S.%gZ') AS time_coverage_start,
               strftime(max(index_max), '%Y-%m-%dT%H:%M:%S.%gZ') AS time_coverage_end,
               array_to_string(list_sort(list_distinct(list(file_attr))), ', ') AS unique_attrs
        FROM man
    """

    sqls["agg_coalesce_alt"] = """
        SELECT event_id,
               coalesce(CASE WHEN event_id % 2 = 0 THEN value END,
                        CASE WHEN event_id % 2 = 1 THEN value END) AS value
        FROM events
    """

    sqls["agg_take_dim_index"] = """
        SELECT vec_id, embedding[1] AS e0, embedding[8] AS e7 FROM embeddings
    """

    sqls["agg_promote_dim"] = """
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS pos,
               unnest(embedding) AS embedding
        FROM embeddings WHERE vec_id < 50
    """

    sqls["agg_block_diagonal"] = """
        SELECT event_id, value AS click_value, NULL::DOUBLE AS view_value
        FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT event_id, NULL::DOUBLE AS click_value, value AS view_value
        FROM events WHERE event_type = 'view'
    """

    sqls["agg_flatten_overlay"] = """
        WITH f1 AS (
            SELECT event_id, value,
                   row_number() OVER (ORDER BY event_id) - 1 AS pos
            FROM events
            WHERE ts IS NOT NULL AND event_id < 2000 AND event_id % 2 = 0
        ),
        f2 AS (
            SELECT event_id, value,
                   row_number() OVER (ORDER BY event_id) - 1 AS pos
            FROM events
            WHERE ts IS NOT NULL AND event_id < 2000 AND event_id % 2 = 1
        )
        SELECT coalesce(f1.pos, f2.pos) AS pos,
               coalesce(f1.event_id, f2.event_id) AS event_id,
               coalesce(f1.value, f2.value) AS value
        FROM f1 FULL OUTER JOIN f2 USING (pos)
    """

    sqls["agg_flatten_by_index"] = """
        SELECT coalesce(a.label, b.label) AS label, a.name_a, b.region_b
        FROM (SELECT n_nationkey AS label, n_name AS name_a
              FROM nation WHERE n_nationkey < 15) a
        FULL OUTER JOIN
             (SELECT n_nationkey AS label, n_regionkey AS region_b
              FROM nation WHERE n_nationkey >= 10) b
        USING (label)
    """

    # CF epoch 2000-01-01T12:00:00Z = 946728000 epoch-seconds
    sqls["agg_cf_time"] = """
        SELECT event_id,
               (epoch_us(ts) - 946728000000000) / 1000000.0 AS cf_seconds,
               make_timestamp(CAST(floor(946728000000000 +
                   ((epoch_us(ts) - 946728000000000) / 1000000.0) * 1000000.0)
                   AS BIGINT)) AS ts_roundtrip
        FROM events WHERE ts IS NOT NULL
    """

    sqls["rel_q1_pricing"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                        (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE)
                   AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """

    sqls["rel_q3_topk"] = """
        SELECT l_orderkey, o_orderdate,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                        (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE)
                   AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1998-03-15'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """

    sqls["rel_q5_nation_volume"] = """
        SELECT n_name,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                        (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE)
                   AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE c_nationkey = s_nationkey
        GROUP BY n_name
    """

    sqls["rel_window_topk"] = """
        SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY c_mktsegment
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders JOIN customer ON o_custkey = c_custkey
        ) WHERE rn <= 3
    """

    sqls["rel_rollup"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """

    sqls["rel_grouping_sets"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """

    sqls["rel_anti_join"] = """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1998-01-01')
    """

    sqls["rel_semi_join"] = """
        SELECT s_suppkey, s_name FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey AND l_quantity >= 45)
    """

    sqls["rel_cube"] = """
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
               count(*) AS n_rows
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """

    sqls["rel_intersect_except"] = """
        SELECT nk, 'both' AS tag FROM (
            SELECT c_nationkey AS nk FROM customer
            INTERSECT
            SELECT s_nationkey AS nk FROM supplier
        )
        UNION ALL
        SELECT nk, 'cust_only' AS tag FROM (
            SELECT c_nationkey AS nk FROM customer
            EXCEPT
            SELECT s_nationkey AS nk FROM supplier
        )
    """

    sqls["rel_exists_subquery"] = """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    """

    sqls["rel_scalar_subquery"] = """
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice
        FROM orders
        WHERE o_totalprice > (SELECT avg(CAST(o_totalprice AS DECIMAL(18,4)))
                              FROM orders)
    """

    sqls["rel_region_volume"] = """
        SELECT r_name,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
                        (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE)
                   AS revenue,
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """

    sqls["rel_part_type_revenue"] = """
        SELECT p_type,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS revenue,
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#1'
        GROUP BY p_type
    """

    sqls["rel_window_agg"] = """
        SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
               event_type, count(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
        FROM events WHERE ts IS NOT NULL
        GROUP BY 1, 2
    """

    sqls["rel_distinct_count"] = """
        SELECT event_type,
               count(DISTINCT user_id) AS n_users,
               count(*) AS n_events
        FROM events GROUP BY event_type
    """

    sqls["rel_moving_avg"] = """
        WITH daily AS (
            SELECT o_orderpriority AS prio,
                   CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS total
            FROM orders GROUP BY 1, 2
        )
        SELECT prio, day,
               round(avg(CAST(total AS DOUBLE)) OVER (
                   PARTITION BY prio ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS avg7
        FROM daily
    """

    sqls["rel_union_distinct"] = """
        SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
        UNION
        SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey
    """

    norm_text = f"array_to_string({_TOKENS}, ' ')"
    sqls["doc_exact_duplicates"] = f"""
        SELECT md5({norm_text}) AS fp, count(*) AS n_dups, min(doc_id) AS keep_id
        FROM documents GROUP BY 1
    """

    sqls["doc_text_stats"] = f"""
        WITH t AS (SELECT doc_id, text, {_TOKENS} AS toks FROM documents)
        SELECT doc_id,
               len(toks) AS n_tokens,
               round(list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                     / greatest(len(toks), 1), 6) AS mean_token_len,
               {_SQL_QUALITY} AS quality,
               md5(array_to_string(toks, ' ')) AS fp
        FROM t
    """

    sqls["doc_quality_filter"] = f"""
        WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents)
        SELECT doc_id, quality FROM (
            SELECT doc_id, {_SQL_QUALITY} AS quality
            FROM t
        ) WHERE quality >= 0.75
    """

    from ncagg_spark.pipeline.spans import sql_duplicate_spans

    sqls["doc_dup_spans"] = sql_duplicate_spans(8)

    # CCNet-style LM scoring: the SQL twins live next to the operator
    # (pipeline/lm.py) — train on the doc_id%10==0 slice, score all docs
    sqls["doc_lm_score"] = (
        "WITH "
        + sql_ngram_lm_ctes(n=2, ref_where="doc_id % 10 = 0")
        + sql_lm_score(n=2)
    )

    # DSIR resampling: twins in pipeline/dsir.py — hashed-bigram
    # log-ratios over the %7 target/raw split, deterministic Gumbel
    # top-k (integer micro-nat ranking key)
    from ncagg_spark.pipeline.dsir import sql_dsir_ctes, sql_dsir_sample

    sqls["doc_dsir_sample"] = (
        "WITH "
        + sql_dsir_ctes(
            n=2,
            buckets=DSIR_BUCKETS,
            target_where="doc_id % 7 = 0",
            raw_where="doc_id % 7 <> 0",
        )
        + sql_dsir_sample(
            k=DSIR_K,
            n=2,
            buckets=DSIR_BUCKETS,
            doc_where="doc_id % 7 <> 0",
        )
    )

    # BM25 retrieval: scores twin in pipeline/search.py; rank window
    # replicated here (ties -> lower doc_id, the repo-wide tie-break)
    sqls["doc_bm25_topk"] = f"""
        SELECT doc_id, n_terms, score, rank FROM (
            SELECT doc_id, n_terms, score,
                   row_number() OVER (ORDER BY score DESC, doc_id ASC)
                       AS rank
            FROM ({sql_bm25_scores(BM25_TERMS)})
        ) WHERE rank <= 25
    """

    # decontamination scan: eval set = doc_id % 97 == 0, held out of the
    # corpus side; grams at SHINGLE_N (=3) where cross-doc overlap exists
    sqls["doc_decontaminate"] = f"""
        WITH bg AS (
            SELECT doc_id AS bench_id, unnest({_SHINGLES}) AS gram
            FROM documents WHERE doc_id % 97 = 0
        ),
        bt AS (SELECT bench_id, count(*) AS b_total FROM bg GROUP BY bench_id),
        cg AS (
            SELECT doc_id, unnest({_SHINGLES}) AS gram
            FROM documents WHERE doc_id % 97 <> 0
        ),
        sh AS (
            SELECT doc_id, bench_id, count(*) AS n_shared
            FROM cg JOIN bg USING (gram) GROUP BY doc_id, bench_id
        )
        SELECT doc_id, bench_id, n_shared,
               round(n_shared::DOUBLE / b_total, 6) AS bench_frac
        FROM sh JOIN bt USING (bench_id)
    """

    # the full clean_corpus chain, staged EXACTLY like pipeline/corpus.py:
    # quality gate -> exact dedup -> MinHash-LSH + Jaccard-verified near
    # dedup (recursive-CTE connected components) -> span gate (>=20-token
    # shared span drops the higher id) -> decontamination (eval docs sit
    # IN the corpus, so self-coverage 1.0 >= 0.5 fires the stage)
    _G8 = f"list_distinct({sql_word_ngrams(_TOKENS, 8)})"
    sqls["doc_clean_corpus"] = f"""
        WITH RECURSIVE
        q AS MATERIALIZED (
            SELECT doc_id, text FROM (
                SELECT doc_id, text, {_SQL_QUALITY} AS quality
                FROM (SELECT doc_id, text, {_TOKENS} AS toks FROM documents)
            ) WHERE quality >= 0.75
        ),
        fp AS MATERIALIZED (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       min(doc_id) OVER (
                           PARTITION BY md5(array_to_string({_TOKENS}, ' '))
                       ) AS keep
                FROM q
            ) WHERE doc_id = keep
        ),
        lsh_pairs AS MATERIALIZED ({_sql_lsh_pairs('fp')}),
        shg AS MATERIALIZED (
            SELECT doc_id, {_SHINGLES} AS sh FROM fp
        ),
        ver AS MATERIALIZED (
            SELECT id_a, id_b FROM (
                SELECT p.id_a, p.id_b,
                       round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                             greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1),
                             6) AS jaccard
                FROM lsh_pairs p
                JOIN shg a ON p.id_a = a.doc_id
                JOIN shg b ON p.id_b = b.doc_id
            ) WHERE jaccard >= 0.8
        ),
        edges AS MATERIALIZED (
            SELECT id_a AS src, id_b AS dst FROM ver
            UNION
            SELECT id_b AS src, id_a AS dst FROM ver
        ),
        reach(node, label) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.label
            FROM reach r JOIN edges e ON e.src = r.node
        ),
        cc AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
        sizes AS (
            SELECT cluster_id, count(*) AS n_members FROM cc GROUP BY cluster_id
        ),
        nd AS MATERIALIZED (
            SELECT f.doc_id, f.text,
                   coalesce(s.n_members, 1::BIGINT) AS n_members
            FROM fp f LEFT JOIN cc ON f.doc_id = cc.node
            LEFT JOIN sizes s ON cc.cluster_id = s.cluster_id
            WHERE cc.node IS NULL OR cc.node = cc.cluster_id
        ),
        sp AS (
            SELECT DISTINCT id_b FROM ({sql_duplicate_spans(8, source='nd')})
            WHERE length >= 20
        ),
        span_kept AS MATERIALIZED (
            SELECT doc_id, text, n_members FROM nd
            WHERE doc_id NOT IN (SELECT id_b FROM sp)
        ),
        bg8 AS (
            SELECT doc_id AS bench_id, unnest({_G8}) AS gram
            FROM documents WHERE doc_id % 97 = 0
        ),
        bt8 AS (SELECT bench_id, count(*) AS b_total FROM bg8 GROUP BY bench_id),
        cg8 AS (SELECT doc_id, unnest({_G8}) AS gram FROM span_kept),
        contaminated AS (
            SELECT DISTINCT doc_id FROM (
                SELECT doc_id, bench_id, count(*) AS n_shared
                FROM cg8 JOIN bg8 USING (gram) GROUP BY doc_id, bench_id
            ) sh8 JOIN bt8 USING (bench_id)
            WHERE round(n_shared::DOUBLE / b_total, 6) >= 0.5
        )
        SELECT doc_id, n_members FROM span_kept
        WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    """

    _AUG = (
        "text || ' Contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com or +1 (303) 555-01'"
        " || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')"
        " || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.7 card 4111 1111 1111 1111 ssn 123-45-6789.'"
    )
    _PII_N = sql_pii_counts("aug")
    sqls["doc_pii_redact"] = f"""
        WITH a AS (SELECT doc_id, {_AUG} AS aug FROM documents)
        SELECT doc_id,
               {_PII_N['email']} AS n_email,
               {_PII_N['ip']} AS n_ip,
               {_PII_N['ssn']} AS n_ssn,
               {_PII_N['cc']} AS n_cc,
               {_PII_N['phone']} AS n_phone,
               length({sql_redact_pii('aug')}) AS redacted_len,
               md5({sql_redact_pii('aug')}) AS redacted_fp
        FROM a
    """

    sqls["doc_chunk"] = f"""
        WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
        s AS (
            SELECT doc_id, toks,
                   unnest({sql_chunk_starts('len(toks)', 40, 10)}) AS chunk_start
            FROM t
        )
        SELECT doc_id,
               chunk_start // 30 AS chunk_idx,
               chunk_start,
               coalesce(len(list_slice(toks, chunk_start + 1, chunk_start + 40)),
                        0) AS chunk_tokens,
               coalesce(array_to_string(
                        list_slice(toks, chunk_start + 1, chunk_start + 40), ' '),
                        '') AS chunk_text
        FROM s
    """

    sqls["doc_pack_sequences"] = sql_pack_sequences(
        "documents", seq_len=128, drop_incomplete=True
    )
    # count_col path: the oracle's tokens_expr is the BPE-ish list, so
    # len() of it equals the precomputed bpeish_token_count column
    sqls["doc_pack_bpeish"] = sql_pack_sequences(
        "documents",
        seq_len=128,
        tokens_expr=sql_bpeish_tokens("text"),
        drop_incomplete=True,
    )

    # the Gopher repetition gate: same integer counts; DuckDB computes
    # the 2-gram mode count via explode->groupBy->max (its list lambdas
    # have no struct accumulator for the run-length trick)
    _LINES = sql_lines("text")
    _PARAS = sql_paragraphs("text")
    _G2 = sql_word_ngrams(_TOKENS, 2)
    _G5 = sql_word_ngrams(_TOKENS, 5)
    sqls["doc_repetition_filter"] = f"""
        WITH base AS (
            SELECT doc_id, {_LINES} AS lines, {_PARAS} AS paras,
                   {_G2} AS g2, {_G5} AS g5
            FROM documents
        ),
        top2 AS (
            SELECT doc_id, max(c) AS top_n FROM (
                SELECT doc_id, gram, count(*) AS c
                FROM (SELECT doc_id, unnest(g2) AS gram FROM base)
                GROUP BY doc_id, gram
            ) GROUP BY doc_id
        ),
        cnt AS (
            SELECT b.doc_id,
                   len(lines) AS n_lines,
                   len(list_distinct(lines)) AS n_uniq_lines,
                   len(paras) AS n_paras,
                   len(list_distinct(paras)) AS n_uniq_paras,
                   len(g2) AS n_2grams,
                   coalesce(t.top_n, 0) AS top_2gram_n,
                   len(g5) AS n_5grams,
                   len(list_distinct(g5)) AS n_uniq_5grams
            FROM base b LEFT JOIN top2 t ON b.doc_id = t.doc_id
        )
        SELECT *,
               ((n_lines - n_uniq_lines) * 10 <= n_lines * 3)
               AND ((n_paras - n_uniq_paras) * 10 <= n_paras * 3)
               AND (top_2gram_n * 5 <= n_2grams * 1)
               AND ((n_5grams - n_uniq_5grams) * 10 <= n_5grams * 3) AS keep
        FROM cnt
    """

    sqls["doc_lang_id"] = f"""
        WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents)
        SELECT doc_id, {_SQL_LANG_CASE} AS lang_pred FROM t
    """

    sqls["doc_minhash_sig"] = f"""
        SELECT doc_id,
               generate_subscripts(sig, 1) - 1 AS perm_idx,
               unnest(sig) AS sig_val
        FROM ({_SQL_SIGS})
    """

    sqls["doc_exact_dedup"] = f"""
        SELECT doc_id FROM (
            SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY md5({norm_text})) AS keep
            FROM documents
        ) WHERE doc_id = keep
    """

    sqls["doc_token_count"] = f"""
        SELECT doc_id,
               len({_TOKENS}) AS ws_tokens,
               len({sql_bpeish_tokens('text')}) AS bpeish_tokens
        FROM documents
    """

    sqls["doc_winnow_fp"] = f"""
        SELECT doc_id, {sql_winnow_fingerprint(_TOKENS, 8)} AS winnow_fp
        FROM documents
    """

    # stratified sample + train/val split: the SAME floor(x+0.5) integer
    # cuts the Spark query embeds (computed once from the shared
    # constants), over the portable hash64 ticket — bit-identical row
    # sets by construction. _keep_ticket hashes concat_ws('|', key, salt).
    from ncagg_spark.pipeline.sampling import SAMPLE_MOD as _SMOD

    def _sql_ticket(salt: str) -> str:
        h = sql_hash64(f"(CAST(doc_id AS VARCHAR) || '|{salt}')")
        return f"({h} % {_SMOD})"

    # mix_corpora: count-driven cuts. Mirror pipeline/sampling.py
    # mix_corpora arithmetic step for step — normalized proportions
    # computed HERE with the same Python expression and embedded as
    # repr'd doubles; counts, the min-feasible total, the per-source
    # fraction, and the floor(x+0.5) cut all recompute in SQL with the
    # same IEEE-754 ops in the same order (BIGINT/DOUBLE division,
    # LEAST, FLOOR). int() == FLOOR here because every value is >= 0.
    _mix_total_p = sum(MIX_PROPORTIONS.values())
    _mix_p_case = "CASE lang " + " ".join(
        f"WHEN '{k}' THEN {v / _mix_total_p!r}"
        for k, v in sorted(MIX_PROPORTIONS.items())
    ) + " END"
    _mix_langs = ", ".join(f"'{k}'" for k in sorted(MIX_PROPORTIONS))
    _mix_ticket = sql_hash64(
        "(CAST(d.doc_id AS VARCHAR) || '|mix:' || d.lang)"
    )
    # ADVICE r14 #1: counts come from an explicit list of the
    # MIX_PROPORTIONS langs LEFT JOINed to documents (COALESCE 0), and
    # a zero-count positive-proportion source ERRORS — matching the
    # engine's fail-loud _mix_fractions contract instead of silently
    # omitting the missing lang from MIN(c/p) and returning a wrong
    # non-empty mix. error() is lazily evaluated inside CASE.
    sqls["doc_mix_corpora"] = f"""
        WITH langs AS (SELECT unnest([{_mix_langs}]) AS lang),
        cnt0 AS (
            SELECT lang, count(*) AS c FROM documents
            WHERE lang IN ({_mix_langs}) GROUP BY lang
        ),
        cnt AS (
            SELECT l.lang,
                   CASE WHEN COALESCE(c0.c, 0) = 0
                        THEN CAST(error('mix oracle: source has positive '
                                        'proportion but zero rows') AS BIGINT)
                        ELSE c0.c END AS c
            FROM langs l LEFT JOIN cnt0 c0 USING (lang)
        ),
        pp AS (SELECT lang, c, {_mix_p_case} AS p FROM cnt),
        feas AS (SELECT MIN(c / p) AS t FROM pp),
        cuts AS (
            SELECT lang,
                   CAST(FLOOR(LEAST(1.0, (SELECT t FROM feas) * p / c)
                              * {_SMOD} + 0.5) AS BIGINT) AS cut
            FROM pp
        )
        SELECT d.doc_id, d.lang AS source
        FROM documents d JOIN cuts USING (lang)
        WHERE ({_mix_ticket} % {_SMOD}) < cut
    """

    _strata_case = "CASE lang " + " ".join(
        f"WHEN '{s}' THEN {int(f_ * _SMOD + 0.5)}"
        for s, f_ in sorted(STRATA_FRACTIONS.items())
    ) + f" ELSE {int(STRATA_DEFAULT_FRACTION * _SMOD + 0.5)} END"
    sqls["doc_stratified_split"] = f"""
        SELECT doc_id, lang,
               CASE WHEN {_sql_ticket('split')}
                         < {int(SPLIT_VAL_FRACTION * _SMOD + 0.5)}
                    THEN 'val' ELSE 'train' END AS split
        FROM documents
        WHERE {_sql_ticket('strata')} < {_strata_case}
    """

    # VERDICT r14 #1 (sf10 gate cost): the original oracle was a literal
    # all-pairs self-join (a.doc_id < b.doc_id) — O(N^2) bit_count
    # evaluations, 874 s at sf10. This form is MATHEMATICALLY the same
    # query, via multi-index Hamming search (the HmSearch/multi-probe
    # construction): split the 32-bit signature into 2 disjoint 16-bit
    # halves; by pigeonhole a pair at hamming <= 3 differs by <= 1 bit
    # in SOME half, so probing each doc's exact half-key PLUS its 16
    # single-bit flips against the exact half-key table candidates a
    # superset of all qualifying pairs; the hamming predicate then
    # keeps exactly the same rows and DISTINCT collapses multi-half
    # hits. 16-bit keys (65k buckets) keep skewed natural-text
    # signatures from piling into the few hundred buckets an 8-bit
    # banding allows — measured 8.6x faster than 4x8-bit banding at
    # sf1, identical results. Deliberately a different construction
    # from the engine's contiguous 8-bit block equi-join
    # (pipeline/dedup.py simhash_near_duplicates), so a band/probe
    # extraction bug cannot cancel across engine and oracle. sigs is
    # MATERIALIZED so the signature computation runs once.
    _sh_flips = ", ".join(f"xor(hk, {1 << m})" for m in range(16))
    sqls["doc_simhash_near_dup"] = f"""
        WITH sigs AS MATERIALIZED (
            SELECT * FROM {_sql_simhash_sigs('documents')}
        ),
        halves AS (
            SELECT doc_id, simhash,
                   (h.h * 65536 + ((simhash >> (16 * h.h)) & 65535)) AS hk
            FROM sigs, (VALUES (0), (1)) h(h)
        ),
        probes AS (
            SELECT doc_id, simhash,
                   unnest([hk, {_sh_flips}]) AS pk
            FROM halves
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM probes a JOIN halves b
          ON a.pk = b.hk AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """

    sqls["evt_sessionize"] = f"""
        WITH e AS (
            SELECT user_id, ts, event_id, value FROM events
            WHERE ts IS NOT NULL AND epoch_us(ts) > 0
        ),
        lagged AS (
            SELECT *, lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS prev
            FROM e
        ),
        flagged AS (
            SELECT *, CASE WHEN prev IS NULL
                             OR epoch_us(ts) - epoch_us(prev) > {SESSION_GAP_US}
                           THEN 1 ELSE 0 END AS is_new
            FROM lagged
        ),
        sessioned AS (
            SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_idx
            FROM flagged
        )
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        FROM sessioned GROUP BY user_id, session_idx
    """

    # same sessions, different physical strategy: the hot-key-routed
    # operator must be value-identical to the plain window form
    sqls["evt_sessionize_skew"] = sqls["evt_sessionize"]

    sqls["evt_json_props"] = """
        SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
               event_type,
               count(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
    """

    # as-of oracles: the window formulation (greatest at-or-before /
    # least at-or-after, deterministic tiebreak = max event_id) as an
    # explicit join + row_number — O(n*m) per key is fine at oracle SF.
    sqls["evt_asof_purchase"] = """
        WITH e AS (
            SELECT event_id, user_id, ts FROM events
            WHERE ts IS NOT NULL AND epoch_us(ts) > 0
              AND event_type <> 'purchase'
        ),
        p AS (
            SELECT user_id, ts, event_id, value FROM events
            WHERE ts IS NOT NULL AND epoch_us(ts) > 0
              AND event_type = 'purchase'
        ),
        m AS (
            SELECT e.event_id AS eid, p.event_id AS purchase_id,
                   p.value AS purchase_value, p.ts AS purchase_ts,
                   row_number() OVER (PARTITION BY e.event_id
                                      ORDER BY p.ts DESC, p.event_id DESC) AS rn
            FROM e JOIN p ON p.user_id = e.user_id AND p.ts <= e.ts
        )
        SELECT e.event_id, e.user_id, e.ts,
               m.purchase_id, m.purchase_value, m.purchase_ts
        FROM e LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
          ON e.event_id = m.eid
    """

    sqls["evt_asof_next_error"] = """
        WITH e AS (
            SELECT event_id, user_id, ts FROM events
            WHERE ts IS NOT NULL AND epoch_us(ts) > 0
              AND event_type = 'click'
        ),
        x AS (
            SELECT user_id, ts, event_id FROM events
            WHERE ts IS NOT NULL AND epoch_us(ts) > 0
              AND event_type = 'error'
        ),
        m AS (
            SELECT e.event_id AS eid, x.event_id AS error_id, x.ts AS error_ts,
                   row_number() OVER (PARTITION BY e.event_id
                                      ORDER BY x.ts ASC, x.event_id DESC) AS rn
            FROM e JOIN x ON x.user_id = e.user_id
                         AND x.ts >= e.ts
                         AND x.ts <= e.ts + INTERVAL 7 DAY
        )
        SELECT e.event_id, e.user_id, e.ts, m.error_id, m.error_ts
        FROM e LEFT JOIN (SELECT * FROM m WHERE rn = 1) m
          ON e.event_id = m.eid
    """

    sqls["doc_top_ngrams"] = f"""
        WITH t AS (SELECT doc_id, {_SHINGLES} AS grams FROM documents)
        SELECT gram, count(*) AS n_docs
        FROM (SELECT doc_id, unnest(grams) AS gram FROM t)
        GROUP BY gram
        ORDER BY n_docs DESC, gram ASC
        LIMIT 20
    """

    sqls["doc_dup_clusters"] = f"""
        WITH RECURSIVE sigs AS MATERIALIZED (
            SELECT * FROM {_sql_simhash_sigs('documents')}
        ),
        pairs AS MATERIALIZED (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ),
        edges AS MATERIALIZED (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        reach(node, label) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.label
            FROM reach r JOIN edges e ON e.src = r.node
        )
        SELECT node AS doc_id, min(label) AS cluster_id
        FROM reach GROUP BY node
    """

    sqls["doc_near_dedup"] = f"""
        WITH RECURSIVE sigs AS MATERIALIZED (
            SELECT * FROM {_sql_simhash_sigs('documents')}
        ),
        pairs AS MATERIALIZED (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b
            FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        ),
        edges AS MATERIALIZED (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        reach(node, label) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.label
            FROM reach r JOIN edges e ON e.src = r.node
        ),
        cc AS (
            SELECT node, min(label) AS cluster_id
            FROM reach GROUP BY node
        ),
        sizes AS (
            SELECT cluster_id, count(*) AS n_members
            FROM cc GROUP BY cluster_id
        )
        SELECT d.doc_id,
               coalesce(s.n_members, 1::BIGINT) AS n_members
        FROM documents d
        LEFT JOIN cc ON d.doc_id = cc.node
        LEFT JOIN sizes s ON cc.cluster_id = s.cluster_id
        WHERE cc.node IS NULL OR cc.node = cc.cluster_id
    """

    sqls["doc_lsh_pairs"] = _SQL_LSH_PAIRS

    sqls["doc_ngram_jaccard"] = f"""
        WITH pairs AS ({_SQL_LSH_PAIRS}),
        sh AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents)
        SELECT p.id_a, p.id_b,
               round(len(list_intersect(a.sh, b.sh))::DOUBLE /
                     greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1), 6) AS jaccard
        FROM pairs p
        JOIN sh a ON p.id_a = a.doc_id
        JOIN sh b ON p.id_b = b.doc_id
    """

    sqls["doc_simhash"] = f"""
        SELECT doc_id, simhash FROM {_sql_simhash_sigs('documents')}
    """

    cos_ab = _sql_cosine("a.embedding", "b.embedding")
    sqls["emb_near_dup"] = f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round({cos_ab}, 6) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE a.vec_id < 200 AND b.vec_id < 200
          AND round({cos_ab}, 6) >= 0.2
    """

    cos = _sql_cosine("q.embedding", "c.embedding")
    sqls["emb_brute_topk"] = f"""
        SELECT query_id, neighbor_id, rank, cosine FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round({cos}, 6) AS cosine,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY round({cos}, 6) DESC, c.vec_id ASC) AS rank
            FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
            WHERE q.vec_id < 10
        ) WHERE rank <= 5
    """

    sqls["mm_hash_features"] = """
        SELECT doc_id AS media_id,
               sha256(text) AS sha256,
               strlen(text)::BIGINT AS n_bytes
        FROM documents
    """

    srp = _sql_srp_bucket("embedding")
    sqls["emb_srp_topk"] = f"""
        WITH c AS (SELECT vec_id, embedding, {srp} AS bucket FROM embeddings),
        q AS (
            SELECT vec_id, embedding,
                   unnest({_sql_srp_probe_buckets('embedding', probes=2)})
                       AS bucket
            FROM embeddings WHERE vec_id < 10
        )
        SELECT query_id, neighbor_id, rank, cosine FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round({cos}, 6) AS cosine,
                   row_number() OVER (PARTITION BY q.vec_id
                                      ORDER BY round({cos}, 6) DESC, c.vec_id ASC) AS rank
            FROM q JOIN c
              ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        ) WHERE rank <= 5
    """

    # IVF is fully derivable in SQL: centroids are the ceil(sqrt(N))
    # lowest-id vectors, unit-scaled (norm math identical in both
    # engines); cell assignment = argmax of quantized dots (ties ->
    # larger cell); probes = top-n_probe cells per query (ties ->
    # smaller cell, matching the stable argsort order).
    # quantized-integer dot (round 8): floor(x*1e6)*floor(c*1e6) summed —
    # exact integers below 2^53, so Spark's BLAS matmul and DuckDB's
    # serial list_sum agree bit-for-bit at any scale (the same
    # associativity trick as the kmeans oracle). n_cells/n_probe follow
    # the engine's ceil(sqrt(N)) / ceil(n_cells/4) rule via subqueries.
    qdot_c = (
        "list_sum(list_transform(list_zip({v}, c.cunit), "
        "x -> floor(x[1]::DOUBLE * 1000000.0) "
        "* floor(x[2]::DOUBLE * 1000000.0)))"
    )
    # VERDICT r14 #1 (sf10 gate cost): the nn/cents/assign/corpus prefix
    # (the O(N * sqrt(N)) cell-assignment cross join — ~90M 64-dim
    # quantized dots at sf10, the dominant term of both IVF oracles) is
    # shared VERBATIM by emb_ivf_topk and emb_ivfpq_topk and is pure
    # data -> data, so the gate harness may pre-materialize it to
    # parquet keyed on the embeddings fingerprint (tools/oracle_cache.py)
    # and pass ``_cache={"ivf_corpus": "read_parquet('...')"}``. The
    # driver's contract is unchanged: oracle_sql() with no args embeds
    # the full computation inline.
    _ivf_nn = """nn AS (
            SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS n_cells,
                   CAST(ceil(ceil(sqrt(count(*))) / 4.0) AS BIGINT)
                       AS n_probe
            FROM embeddings
        )"""
    _ivf_cents = """cents AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                   list_transform(embedding,
                       x -> x::DOUBLE / sqrt(list_sum(list_transform(
                            embedding, v -> v::DOUBLE * v::DOUBLE))))
                       AS cunit
            FROM (SELECT vec_id, embedding,
                         row_number() OVER (ORDER BY vec_id) AS rn
                  FROM embeddings)
            WHERE rn <= (SELECT n_cells FROM nn)
        )"""
    _ivf_assign_corpus = f"""assign AS (
            SELECT e.vec_id, e.embedding, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {qdot_c.format(v='e.embedding')} DESC,
                                c.cell DESC) AS rn
            FROM embeddings e CROSS JOIN cents c
        ),
        corpus AS (
            SELECT vec_id AS neighbor_id, embedding, cell
            FROM assign WHERE rn = 1
        )"""
    if _cache and "ivf_corpus" in _cache:
        _ivf_corpus_ctes = f"""{_ivf_nn},
        {_ivf_cents},
        corpus AS (
            SELECT neighbor_id, embedding, cell FROM {_cache['ivf_corpus']}
        )"""
    else:
        _ivf_corpus_ctes = f"""{_ivf_nn},
        {_ivf_cents},
        {_ivf_assign_corpus}"""
    _ORACLE_HEAVY["ivf_corpus"] = f"""
        WITH {_ivf_nn},
        {_ivf_cents},
        {_ivf_assign_corpus}
        SELECT neighbor_id, embedding, cell FROM corpus
    """
    sqls["emb_ivf_topk"] = f"""
        WITH {_ivf_corpus_ctes},
        probes AS (
            SELECT e.vec_id, e.embedding, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {qdot_c.format(v='e.embedding')} DESC,
                                c.cell ASC) AS rn
            FROM embeddings e CROSS JOIN cents c
            WHERE e.vec_id < 10
        )
        SELECT query_id, neighbor_id, rank, cosine FROM (
            SELECT q.vec_id AS query_id, c.neighbor_id,
                   round({_sql_cosine('q.embedding', 'c.embedding')}, 6) AS cosine,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY round({_sql_cosine('q.embedding', 'c.embedding')}, 6) DESC,
                                c.neighbor_id ASC) AS rank
            FROM (SELECT DISTINCT vec_id, embedding, cell
                  FROM probes
                  WHERE rn <= (SELECT n_probe FROM nn)) q
            JOIN corpus c ON c.cell = q.cell AND c.neighbor_id <> q.vec_id
        ) WHERE rank <= 5
    """

    # emb_semdedup: SemDeDup = quantized-integer top-SEMDEDUP_PROBES
    # probe ranking (the emb_ivf_topk oracle's probes CTE — ties ->
    # smaller cell, matching quantized_probe_col's stable argsort —
    # restricted to the bounded slice) + exact-cosine pairs in ANY
    # shared probed cell (DISTINCT collapses multi-cell co-occurrence)
    # + recursive-CTE connected components (the doc_dup_clusters
    # oracle's reach pattern) + the near_dedup keep rule: survivors are
    # nodes outside the pair graph (n_members=1) or cluster
    # representatives (node == min reachable id, n_members = size).
    sd_cos = _sql_cosine("a.embedding", "b.embedding")
    sqls["emb_semdedup"] = f"""
        WITH RECURSIVE nn AS (
            SELECT CAST(ceil(sqrt(count(*))) AS BIGINT) AS n_cells
            FROM embeddings WHERE vec_id < {SEMDEDUP_SLICE}
        ),
        cents AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                   list_transform(embedding,
                       x -> x::DOUBLE / sqrt(list_sum(list_transform(
                            embedding, v -> v::DOUBLE * v::DOUBLE))))
                       AS cunit
            FROM (SELECT vec_id, embedding,
                         row_number() OVER (ORDER BY vec_id) AS rn
                  FROM embeddings WHERE vec_id < {SEMDEDUP_SLICE})
            WHERE rn <= (SELECT n_cells FROM nn)
        ),
        assign AS MATERIALIZED (
            SELECT vec_id, embedding, cell FROM (
                SELECT e.vec_id, e.embedding, c.cell,
                       row_number() OVER (PARTITION BY e.vec_id
                           ORDER BY {qdot_c.format(v='e.embedding')} DESC,
                                    c.cell ASC) AS rn
                FROM (SELECT vec_id, embedding FROM embeddings
                      WHERE vec_id < {SEMDEDUP_SLICE}) e
                CROSS JOIN cents c
            ) WHERE rn <= {SEMDEDUP_PROBES}
        ),
        pairs AS MATERIALIZED (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM assign a JOIN assign b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE round({sd_cos}, 6) >= {SEMDEDUP_THR}
        ),
        edges AS MATERIALIZED (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b AS src, id_a AS dst FROM pairs
        ),
        reach(node, label) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.label
            FROM reach r JOIN edges e ON e.src = r.node
        ),
        labels AS (
            SELECT node, min(label) AS cluster_id FROM reach GROUP BY node
        ),
        sizes AS (
            SELECT cluster_id, count(*)::BIGINT AS n_members
            FROM labels GROUP BY cluster_id
        )
        SELECT e.vec_id, coalesce(s.n_members, 1)::BIGINT AS n_members
        FROM (SELECT vec_id FROM embeddings
              WHERE vec_id < {SEMDEDUP_SLICE}) e
        LEFT JOIN labels l ON l.node = e.vec_id
        LEFT JOIN sizes s ON s.cluster_id = e.vec_id
        WHERE l.node IS NULL OR l.cluster_id = e.vec_id
    """

    # emb_ivf_kmeans_topk: the TRAINED-centroid IVF. The k-means is
    # derivable in SQL because the Spark training is cross-engine
    # deterministic by design (similarity.kmeans_centroids with
    # init="mult", update_quantization): init = the 8 vectors with
    # smallest (vec_id*2654435761)%2^32; each Lloyd iteration is argmax
    # assignment (ties -> larger cell) then INTEGER sums of
    # floor(component*1e6) — associative, so Spark's partitioned
    # aggregation and DuckDB's serial SUM agree bit-for-bit — unit-scaled
    # in identical left-to-right double arithmetic. 2 iterations, tol=0,
    # unrolled here as c0 -> (a1,s1,v1,c1) -> (a2,s2,v2,c2).
    km_dot = (
        "list_sum(list_transform(list_zip(e.embedding, c.cu), "
        "x -> x[1]::DOUBLE * x[2]))"
    )
    km_ctes = [
        f"""ids AS (
            SELECT vec_id, embedding FROM embeddings
            ORDER BY (vec_id*2654435761)%4294967296 ASC, vec_id ASC
            LIMIT {KM_CELLS}
        ), c0 AS (
            SELECT row_number() OVER (
                       ORDER BY (vec_id*2654435761)%4294967296 ASC,
                                vec_id ASC) - 1 AS cell,
                   list_transform(embedding, x -> x::DOUBLE /
                       sqrt(list_sum(list_transform(embedding,
                            v -> v::DOUBLE * v::DOUBLE)))) AS cu
            FROM ids
        )"""
    ]
    for it in range(1, KM_ITERS + 1):
        km_ctes.append(
            f"""a{it} AS (
            SELECT e.vec_id, e.embedding, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {km_dot} DESC, c.cell DESC) AS rn
            FROM embeddings e CROSS JOIN c{it - 1} c
        ), s{it} AS (
            SELECT a.cell, p.pos::INT AS pos,
                   SUM(CAST(floor(a.embedding[p.pos+1]::DOUBLE
                       * {KM_QUANT}.0) AS BIGINT)) AS s
            FROM (SELECT * FROM a{it} WHERE rn = 1) a,
                 (SELECT unnest(range(64)) AS pos) p
            GROUP BY a.cell, p.pos
        ), v{it} AS (
            SELECT cell, list(s::DOUBLE ORDER BY pos) AS comps
            FROM s{it} GROUP BY cell
        ), c{it} AS (
            SELECT p.cell,
                   CASE WHEN v{it}.cell IS NULL THEN p.cu
                        ELSE list_transform(v{it}.comps, x -> x /
                            sqrt(list_sum(list_transform(v{it}.comps,
                                 v -> v * v))))
                   END AS cu
            FROM c{it - 1} p LEFT JOIN v{it} ON v{it}.cell = p.cell
        )"""
        )
    km_cents = f"c{KM_ITERS}"
    sqls["emb_ivf_kmeans_topk"] = f"""
        WITH {",".join(km_ctes)},
        assign AS (
            SELECT e.vec_id, e.embedding, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {km_dot} DESC, c.cell DESC) AS rn
            FROM embeddings e CROSS JOIN {km_cents} c
        ),
        corpus AS (
            SELECT vec_id AS neighbor_id, embedding, cell
            FROM assign WHERE rn = 1
        ),
        probes AS (
            SELECT e.vec_id, e.embedding, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {km_dot} DESC, c.cell ASC) AS rn
            FROM embeddings e CROSS JOIN {km_cents} c
            WHERE e.vec_id < 10
        )
        SELECT query_id, neighbor_id, rank, cosine FROM (
            SELECT q.vec_id AS query_id, c.neighbor_id,
                   round({_sql_cosine('q.embedding', 'c.embedding')}, 6) AS cosine,
                   row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY round({_sql_cosine('q.embedding', 'c.embedding')}, 6) DESC,
                                c.neighbor_id ASC) AS rank
            FROM (SELECT DISTINCT vec_id, embedding, cell
                  FROM probes WHERE rn <= 3) q
            JOIN corpus c ON c.cell = q.cell AND c.neighbor_id <> q.vec_id
        ) WHERE rank <= 5
    """

    # mm_features: the mapInPandas fake decoder derives feature[p] from
    # the blob's sha256 digest — feature[p] = float32(uint32_le(
    # digest_repeated[4p:4p+4]) / 2^32), digest repeating every 32 bytes
    # (pipeline/multimodal.py _fake_decode_features). That is pure hash
    # math, so DuckDB CAN replicate it: parse the 4 little-endian bytes
    # out of sha256()'s hex string with hex-digit arithmetic and apply
    # the identical double-divide + REAL (float32) rounding.
    def _hexbyte(k: str) -> str:
        # byte value at 0-based byte offset k of hex string h
        return (
            f"((strpos('0123456789abcdef', substr(h, 2*({k})+1, 1))-1)*16"
            f" + strpos('0123456789abcdef', substr(h, 2*({k})+2, 1))-1)"
        )

    _u32 = " + ".join(
        f"{_hexbyte(f'(4*p.pos)%32+{j}')} * {256**j}" for j in range(4)
    )
    sqls["mm_features"] = f"""
        WITH base AS (
            SELECT doc_id AS media_id, sha256(text) AS h,
                   strlen(text)::BIGINT AS n_bytes
            FROM documents
        )
        SELECT media_id, h AS sha256, n_bytes, p.pos::INT AS pos,
               CAST(CAST(({_u32})::BIGINT AS DOUBLE) / 4294967296.0
                    AS REAL) AS value
        FROM base, (SELECT unnest(range(16)) AS pos) p
    """

    # emb_pq_topk: product quantization, oracle-parity form (see
    # pipeline/pq.py:pq_topk_relational). Codebooks = subvectors of the
    # PQ_CODES anchor rows with smallest multiplicative id-hash (pure
    # data, no trained floats); encode = first-argmin of left-to-right
    # squared L2 per subspace; ADC = fixed-order sum of per-subspace
    # distances against the decoded anchor; exact cosine rerank of the
    # PQ_K*PQ_EXPAND candidates.
    _sub = 64 // PQ_M

    def _sqd(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(list_zip({a}, {b}), "
            "x -> (x[1]::DOUBLE - x[2]::DOUBLE) * "
            "(x[1]::DOUBLE - x[2]::DOUBLE)))"
        )

    def _slice(v: str, s: int) -> str:
        return f"{v}[{s * _sub + 1}:{s * _sub + _sub}]"

    pq_codes = []
    for s in range(PQ_M):
        dists = (
            f"list_transform(b.bk, a -> {_sqd(_slice('c.embedding', s), _slice('a', s))})"
        )
        pq_codes.append(
            f"(list_position({dists}, list_min({dists})) - 1) AS code_{s}"
        )
    pq_adc = " + ".join(
        _sqd(_slice("q.embedding", s), _slice(f"b.bk[e.code_{s} + 1]", s))
        for s in range(PQ_M)
    )
    _pq_cos = _sql_cosine("q.embedding", "c.embedding")
    sqls["emb_pq_topk"] = f"""
        WITH samp AS (
            SELECT vec_id, embedding,
                   (vec_id * 2654435761) % 4294967296 AS hkey
            FROM embeddings
            ORDER BY hkey ASC, vec_id ASC LIMIT {PQ_CODES}
        ),
        books AS (
            SELECT list(embedding ORDER BY hkey ASC, vec_id ASC) AS bk
            FROM samp
        ),
        enc AS (
            SELECT c.vec_id AS neighbor_id, {', '.join(pq_codes)}
            FROM embeddings c CROSS JOIN books b
        ),
        adc AS (
            SELECT q.vec_id AS query_id, e.neighbor_id,
                   ({pq_adc}) AS dist2
            FROM embeddings q
            JOIN enc e ON e.neighbor_id <> q.vec_id
            CROSS JOIN books b
            WHERE q.vec_id < 10
        ),
        cand AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                           ORDER BY dist2 ASC, neighbor_id ASC) AS rn
                FROM adc
            ) WHERE rn <= {PQ_K * PQ_EXPAND}
        )
        SELECT query_id, neighbor_id, rank, cosine FROM (
            SELECT cand.query_id, cand.neighbor_id,
                   round({_pq_cos}, 6) AS cosine,
                   row_number() OVER (PARTITION BY cand.query_id
                       ORDER BY round({_pq_cos}, 6) DESC,
                                cand.neighbor_id ASC) AS rank
            FROM cand
            JOIN embeddings q ON q.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.neighbor_id
        ) WHERE rank <= {PQ_K}
    """

    # emb_ivfpq_topk (round 10): IVFADC = the emb_ivf_topk coarse
    # quantizer (sqrt(N) cells, quantized-integer assignment ties ->
    # larger cell / probe ties -> smaller cell) composed with the
    # emb_pq_topk anchor-codebook ADC, scoring ONLY candidates whose
    # cell the query probes (e.cell = q.cell — each vector lives in
    # exactly one cell, so no dedup), then the exact cosine rerank of
    # the PQ_K*PQ_EXPAND survivors. Every fragment below is copied
    # verbatim from those two green oracles; only the adc join keys
    # changed.
    # the enc CTE (PQ codes for every corpus vector — the second heavy
    # term) is likewise cacheable via _cache["ivfpq_enc"]; books stays
    # inline either way (top-16 scan, cheap) because the ADC decode
    # needs b.bk.
    _pq_samp_books = f"""samp AS (
            SELECT vec_id, embedding,
                   (vec_id * 2654435761) % 4294967296 AS hkey
            FROM embeddings
            ORDER BY hkey ASC, vec_id ASC LIMIT {PQ_CODES}
        ),
        books AS (
            SELECT list(embedding ORDER BY hkey ASC, vec_id ASC) AS bk
            FROM samp
        )"""
    _pq_enc_body = f"""SELECT c.neighbor_id, c.cell, {', '.join(pq_codes)}
            FROM corpus c CROSS JOIN books b"""
    if _cache and "ivfpq_enc" in _cache:
        _pq_enc_cte = f"enc AS (SELECT * FROM {_cache['ivfpq_enc']})"
    else:
        _pq_enc_cte = f"enc AS (\n            {_pq_enc_body}\n        )"
    _ORACLE_HEAVY["ivfpq_enc"] = f"""
        WITH corpus AS (
            SELECT * FROM {{corpus}}
        ),
        {_pq_samp_books}
        {_pq_enc_body}
    """
    sqls["emb_ivfpq_topk"] = f"""
        WITH {_ivf_corpus_ctes},
        {_pq_samp_books},
        {_pq_enc_cte},
        probes AS (
            SELECT e.vec_id, e.embedding, c.cell,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY {qdot_c.format(v='e.embedding')} DESC,
                                c.cell ASC) AS rn
            FROM embeddings e CROSS JOIN cents c
            WHERE e.vec_id < 10
        ),
        adc AS (
            SELECT q.vec_id AS query_id, e.neighbor_id,
                   ({pq_adc}) AS dist2
            FROM (SELECT DISTINCT vec_id, embedding, cell
                  FROM probes
                  WHERE rn <= (SELECT n_probe FROM nn)) q
            JOIN enc e ON e.cell = q.cell AND e.neighbor_id <> q.vec_id
            CROSS JOIN books b
        ),
        cand AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                           ORDER BY dist2 ASC, neighbor_id ASC) AS rn
                FROM adc
            ) WHERE rn <= {PQ_K * PQ_EXPAND}
        )
        SELECT query_id, neighbor_id, rank, cosine FROM (
            SELECT cand.query_id, cand.neighbor_id,
                   round({_pq_cos}, 6) AS cosine,
                   row_number() OVER (PARTITION BY cand.query_id
                       ORDER BY round({_pq_cos}, 6) DESC,
                                cand.neighbor_id ASC) AS rank
            FROM cand
            JOIN embeddings q ON q.vec_id = cand.query_id
            JOIN embeddings c ON c.vec_id = cand.neighbor_id
        ) WHERE rank <= {PQ_K}
    """
    return sqls
