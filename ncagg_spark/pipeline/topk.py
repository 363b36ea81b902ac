"""Bounded exact global top-k — the repo-wide replacement for the
single-partition ``Window.orderBy(...)`` idiom (VERDICT r11 #3).

A global window with no partition key sorts the ENTIRE input in one
task: correct, but the task is corpus-sized at 100 TB. This helper
computes the identical result in two phases:

1. local: partition rows by a deterministic hash bucket of the id
   (``pmod(hash64(id), n_buckets)`` — the repo's portable hash, so
   replays and AQE re-plans land rows in the same bucket), rank within
   each bucket by the caller's total order, keep ``k`` per bucket. Any
   global top-k row is top-k within every subset that contains it, so
   the survivor set (<= k x n_buckets rows) is a superset of the
   answer. This window shuffles in parallel (hashpartitioning, not
   SinglePartition).
2. global: rank the survivors with the same total order in one tiny
   window — the only SinglePartition exchange, carrying <= k x
   n_buckets rows by construction (the ``pack_sequences`` bound
   discipline, tests/test_packing.py::
   test_no_corpus_sized_single_partition_window).

The caller's ordering MUST be total (include the unique id as the last
tie-break) — then the two-phase ranks equal the single-window ranks
row for row, so oracle value-hashes are unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from ncagg_spark.functions.hashing import hash64

_BUCKET = "__tkb"
_LOCAL_RANK = "__tklr"


def bounded_topk(
    df: DataFrame,
    order: list[Column],
    k: int,
    *,
    id_col: str,
    n_buckets: int = 32,
    rank_col: str = "rank",
) -> DataFrame:
    """Rows of ``df`` with global rank <= k under ``order`` (a TOTAL
    order — include ``id_col`` as final tie-break), plus ``rank_col``.
    Exactly equals the single global window result, without ever
    sorting more than max(partition, k x n_buckets) rows in one task.
    """
    k = int(k)
    bucket = F.pmod(
        hash64(F.col(id_col).cast("string")), F.lit(int(n_buckets))
    )
    local = Window.partitionBy(_BUCKET).orderBy(*order)
    survivors = (
        df.withColumn(_BUCKET, bucket)
        .withColumn(_LOCAL_RANK, F.row_number().over(local))
        .filter(F.col(_LOCAL_RANK) <= k)
        .drop(_BUCKET, _LOCAL_RANK)
    )
    final = Window.orderBy(*order)
    return survivors.withColumn(
        rank_col, F.row_number().over(final)
    ).filter(F.col(rank_col) <= k)
