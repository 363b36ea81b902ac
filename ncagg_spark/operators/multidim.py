"""Multidimensional index handling (G7/G8 in SURVEY.md §2.6).

Reference semantics: the index variable may be 2-D — e.g.
``OB_time(report_number, samples)`` with 1 Hz reports x 10 Hz samples.
Ordering along the unlimited dim uses one configured representative
element, ``other_dim_inds`` (default 0) (ncagg/aggrelist.py:347-386;
config ncagg/config.py:227-231). Fill records synthesize the full 2-D
timestamp block as an outer sum of per-dim linspace offsets
(ncagg/aggrelist.py:140-189).

Spark mapping: the 2-D variable is an ArrayType column; the representative
element is ``element_at(col, i+1)``; fill arrays are
``transform(sequence(...), j -> start + j/hz_inner)`` — all built-in
expressions, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ncagg_spark.config import AggregationConfig
from ncagg_spark.functions.time import epoch_us
from ncagg_spark.operators.gapfill import FILL_FLAG_COL
from ncagg_spark.operators.regularize import regularize


def representative_index(
    array_index_col: Column | str, element: int = 0
) -> Column:
    """The scalar ordering key of a multidim index variable: the value at
    ``other_dim_inds`` (0-based) along the fixed dim."""
    c = (
        F.col(array_index_col)
        if isinstance(array_index_col, str)
        else array_index_col
    )
    return F.element_at(c, element + 1)


def synth_index_array(
    start: Column, n: int, inner_hz: float
) -> Column:
    """Synthesized multidim fill timestamps: element j = start + j/inner_hz
    (the reference's per-dim linspace outer sum for one fill record;
    ncagg/aggrelist.py:159-171). ``start`` is TimestampType."""
    step_us = int(round(1_000_000 / inner_hz))
    return F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda j: F.timestamp_micros(epoch_us(start) + j * step_us),
    )


def regularize_multidim(
    spark: SparkSession,
    df: DataFrame,
    cfg: AggregationConfig,
    *,
    array_index_col: str,
    inner_size: int,
    inner_hz: float,
    element: int = 0,
    anchor: str = "grid",
) -> DataFrame:
    """Regularize a table whose index variable is an ARRAY column.

    The scalar pipeline runs on the representative element (cfg.index_by
    names the derived scalar column); fill rows get a synthesized index
    array continuing the inner cadence from the fill's representative
    timestamp. Real rows keep their original arrays.
    """
    ix = cfg.index_by
    if cfg.cadence_hz is None:
        # regularize without a cadence never produces the fill-flag
        # column referenced below — fail with the real requirement
        # instead of an unresolved-column error deep in Catalyst
        raise ValueError("regularize_multidim requires cfg.cadence_hz")
    work = df.withColumn(ix, representative_index(array_index_col, element))
    out = regularize(spark, work, cfg, anchor=anchor)
    synth = synth_index_array(F.col(ix), inner_size, inner_hz)
    return out.withColumn(
        array_index_col,
        F.when(F.col(FILL_FLAG_COL), synth).otherwise(F.col(array_index_col)),
    )
