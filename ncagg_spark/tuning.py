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

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

_KEY = "spark.sql.shuffle.partitions"


@contextmanager
def scoped_shuffle_partitions(
    spark: SparkSession, n: int | None
) -> Iterator[None]:
    """Set ``spark.sql.shuffle.partitions`` to ``n`` for the block;
    restore the prior value on exit (errors included). ``n=None`` is a
    no-op bracket."""
    if n is None:
        yield
        return
    old = spark.conf.get(_KEY)
    spark.conf.set(_KEY, str(int(n)))
    try:
        yield
    finally:
        spark.conf.set(_KEY, old)
