"""Scoped session tuning shared by iterative/streaming operators.

``scoped_shuffle_partitions`` brackets ``spark.sql.shuffle.partitions``
around a region of EAGER work (an iterative loop's jobs, a streaming
run) and restores the session value afterwards. Two users:

* iterative graph loops (pipeline/dedup.py connected_components):
  every per-round shuffle should be sized to the GRAPH, not the
  corpus-scale session default — and, just as important, sized
  CONSISTENTLY, so the persisted edge table's hash partitioning matches
  the per-round join/groupBy partitioning and is reused instead of
  re-shuffled each round.
* stateful streaming (streaming/tuning.py): state-store partition
  count, see that module's doc.

Lazy plans built inside the bracket but executed after it pick up the
restored session value — only eager work (actions, checkpoints, stream
batches) belongs inside.

THREAD-SAFETY (ADVICE r15): the bracket mutates the session-global
``spark.sql.shuffle.partitions``. Every current caller runs its bracket
on the driver's main thread (the ``_write_granules`` thread pool only
overlaps granule WRITE jobs, never a CC loop or stream bracket), so
brackets never nest or interleave today. If driver-side concurrency
ever overlaps two bracketed regions — or a bracket with unrelated
queries on the same session — the narrowed width would leak across
threads; move to per-thread job-group-scoped configs (or serialize the
brackets with a lock) before doing that.
"""

from __future__ import annotations

import os
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

_KEY = "spark.sql.shuffle.partitions"

# Size gate shared by the "materialize a multiply-consumed subtree once"
# optimizations (operators/gapfill.py anchor="previous",
# pipeline/packing.py token_offsets): only when the optimizer's size
# estimate for the re-derived input subtree says the duplicate
# evaluations are expensive (default 128 MiB, the session's scan
# partition size: at least one full task of redundant scan per extra
# consumer). Below that the extra eager job costs more than it saves
# (measured r16 on agg_regularize_anchored at sf0.1). Env-overridable
# per call site for clusters where storage is tighter than compute.
MATERIALIZE_MIN_BYTES = 128 * 1024 * 1024


def materialize_min_bytes(
    env_var: str, default: int = MATERIALIZE_MIN_BYTES
) -> int:
    """Per-call-site gate threshold. ``default`` is the call site's
    measured crossover: gap_fill keeps 128 MiB (its duplicated subtree
    is a post-shuffle dedup whose re-derivation is cheap below one scan
    task — an unconditional checkpoint REGRESSED at sf0.1), packing
    passes 0 (its duplicated subtree is the corpus tokenize pass; the
    checkpointed arm won or washed at every measured size, 65 KB to
    179 MB source estimate — see OPTIMIZATION_r16.md)."""
    return int(os.environ.get(env_var, default))


def plan_bytes(df: DataFrame) -> int:
    """Optimizer size estimate for ``df``'s plan (bytes). Unknown ->
    huge, so failure to estimate errs on the side of materializing
    (correct at scale, slightly conservative locally)."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return 1 << 62


_INITIAL_KEY = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"


@contextmanager
def scoped_shuffle_partitions(
    spark: SparkSession, n: int | None
) -> Iterator[None]:
    """Set ``spark.sql.shuffle.partitions`` to ``n`` for the block;
    restore the prior value on exit (errors included). ``n=None`` is a
    no-op bracket.

    Also pins AQE's ``initialPartitionNum`` to ``n`` for the block
    (r16): the session sets a high initial width as the adaptive
    ceiling, and with it in force AQE would ignore the bracket's
    narrow ``spark.sql.shuffle.partitions`` — the bracketed regions
    exist precisely because their right width is KNOWN (graph-sized CC
    rounds, key-sized stream state), so both knobs move together."""
    if n is None:
        yield
        return
    old = spark.conf.get(_KEY)
    old_initial = spark.conf.get(_INITIAL_KEY, None)
    spark.conf.set(_KEY, str(int(n)))
    spark.conf.set(_INITIAL_KEY, str(int(n)))
    try:
        yield
    finally:
        spark.conf.set(_KEY, old)
        if old_initial is None:
            spark.conf.unset(_INITIAL_KEY)
        else:
            spark.conf.set(_INITIAL_KEY, old_initial)
