"""Multi-grain aggregation: flatten overlays and block-diagonal union
(SURVEY.md §1.2; reference multi-unlimited-dim semantics).

The reference concatenates along every unlimited dim independently by
default, producing a block-diagonal result (test/generic/
test_multi_unlim_dims.py:59-71); a dim flagged ``flatten: true`` is
instead overlaid starting at index 0 per file (ncagg/aggregator.py:307-313,
test :73-100); ``flatten + index_by`` aligns by matching index *values*
across files — documented but UNIMPLEMENTED there
(test/generic/test_flatten_index_by.py:7-20, TODO at
ncagg/aggregator.py:314-324). All three are implemented here:

  * ``block_diagonal_union`` — full outer union with nulls: each input's
    rows keep their own secondary-dim positions; other inputs' columns are
    null there. (Weird but tested reference behavior.)
  * ``flatten_overlay`` — per-file position index (0-based) on the
    flattened dim; rows from different files with the same position land
    on the same output row (first non-null wins, file-order precedence).
  * ``flatten_by_index`` — the reference's TODO: align rows across files
    by the VALUE of a label column (outer join on label), i.e. J2 in
    SURVEY.md §2.4 — a plain outer join in Spark.

Scale notes: flatten_overlay groups by position — one shuffle on a dense
small-int key; flatten_by_index joins on the label — hash join, AQE-sized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def block_diagonal_union(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union with null padding: each input keeps its own columns, others'
    are null — the reference's default multi-unlim-dim aggregation."""
    if not dfs:
        raise ValueError("need at least one DataFrame")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def global_position(
    df: DataFrame,
    order_by: str,
    *,
    position_col: str = "pos",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Dense 0-based global position by ``order_by`` WITHOUT a
    single-task sort: range-repartition on the key, rank within each
    partition, then add the partition's cumulative offset (collected as
    one tiny count-per-partition job). The standard distributed global
    index — every stage is partition-parallel.

    Rows tied on ``order_by`` get arbitrary relative positions unless
    ``tiebreak`` columns are given (same contract as dedup_cadence /
    asof_join: determinism under shuffle requires an explicit total
    order).

    The eager localCheckpoint pins the repartitioned input in executor
    storage (needed so the count job and the returned plan see the SAME
    partitioning); blocks are freed by RDD GC when the result goes out
    of scope — in a long-lived session doing many huge flattens, trigger
    collection or reuse the returned DataFrame rather than re-calling.
    """
    n = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    order_cols = [F.col(order_by).asc()] + [
        F.col(c).asc() for c in tiebreak
    ]
    part = df.repartitionByRange(n, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    part = part.localCheckpoint(eager=True)  # pin partitioning for both uses
    counts = {
        r["__pid"]: r["cnt"]
        for r in part.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        ),
        F.col("__pid"),
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return part.withColumn(
        position_col, F.row_number().over(w) - 1 + off
    ).drop("__pid")


def flatten_overlay(
    dfs: Sequence[DataFrame],
    order_by: str,
    *,
    position_col: str = "pos",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Overlay inputs along a per-input 0-based position index: output row
    p carries, for every column, the first non-null value among inputs at
    their p-th row (earlier inputs win — reference file-order precedence).

    Positions come from ``global_position`` — partition-parallel, no
    single-task sort, so overlay inputs can be arbitrarily large.
    """
    if not dfs:
        raise ValueError("need at least one DataFrame")
    tagged = []
    for i, df in enumerate(dfs):
        tagged.append(
            global_position(
                df, order_by, position_col=position_col, tiebreak=tiebreak
            ).withColumn("__src", F.lit(i))
        )
    u = block_diagonal_union(tagged)
    value_cols = [c for c in u.columns if c not in (position_col, "__src")]
    # first non-null per position in source order: min_by over (src) among
    # rows where the column is non-null
    aggs = [
        F.min_by(F.col(c), F.when(F.col(c).isNotNull(), F.col("__src"))).alias(c)
        for c in value_cols
    ]
    return u.groupBy(position_col).agg(*aggs)


def flatten_by_index(
    dfs: Sequence[DataFrame],
    label_col: str,
) -> DataFrame:
    """Align inputs by the VALUE of a label column (full outer join per
    input): one output row per distinct label, columns coalesced in input
    order. The reference documents this but never implemented it
    (test_flatten_index_by.py @expectedFailure) — in Spark it is a plain
    outer join.
    """
    if not dfs:
        raise ValueError("need at least one DataFrame")
    out = dfs[0]
    for i, df in enumerate(dfs[1:], start=1):
        overlapping = [
            c for c in df.columns if c != label_col and c in out.columns
        ]
        right = df
        for c in overlapping:
            right = right.withColumnRenamed(c, f"__r{i}_{c}")
        out = out.join(right, on=label_col, how="full")
        for c in overlapping:
            out = out.withColumn(
                c, F.coalesce(F.col(c), F.col(f"__r{i}_{c}"))
            ).drop(f"__r{i}_{c}")
    return out
