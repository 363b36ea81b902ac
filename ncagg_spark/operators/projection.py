"""Schema projection / remapping operators (P1-P4, P10 in SURVEY.md §2.2).

  * template projection (P1): just ``df.select`` — users pass the column
    list; no wrapper needed.
  * rename on output (P2): reference ``map_to`` (ncagg/aggregator.py:378).
  * alt-source coalesce (P3): reference ``copy_from_alt``
    (ncagg/aggrelist.py:553-566) — older granules used a different column
    name; output takes the first non-null among alternates. With
    mergeSchema reads the absent column is null, so F.coalesce reproduces
    the semantics exactly.
  * missing-variable tolerance (P4): mergeSchema=true read already yields
    nulls for columns absent in some granules — nothing to do.
  * take_dim_indices (P10): select one index of a fixed (array) dimension,
    dropping the dim — the reference documents this (README.md:299-317)
    but regressed the implementation; here it is a one-line element_at.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Rename columns per mapping {old: new} (reference map_to)."""
    for old, new in mapping.items():
        df = df.withColumnRenamed(old, new)
    return df


def coalesce_alternates(
    df: DataFrame, alternates: Mapping[str, Sequence[str]]
) -> DataFrame:
    """For each target column, take the first non-null among
    [target, *alternates]; drop the alternate source columns.

    Missing alternates (column absent entirely) are skipped, matching the
    reference's "first name present in the file" resolution.
    """
    for target, alts in alternates.items():
        names = [n for n in [target, *alts] if n in df.columns]
        if not names:
            raise ValueError(
                f"none of {[target, *list(alts)]} present in DataFrame"
            )
        df = df.withColumn(target, F.coalesce(*[F.col(n) for n in names]))
        df = df.drop(*[n for n in names if n != target])
    return df


def take_dim_indices(df: DataFrame, indices: Mapping[str, int]) -> DataFrame:
    """Replace array columns with the element at the given 0-based index
    (drops the fixed dimension). element_at is 1-based, hence the +1.
    """
    for col, i in indices.items():
        df = df.withColumn(col, F.element_at(F.col(col), i + 1))
    return df


def promote_fixed_dim(
    df: DataFrame, array_col: str, *, pos_col: str = "pos"
) -> DataFrame:
    """Promote a fixed (array) dimension to the record axis: one output
    row per array element, with the element's 0-based position.

    The reference's template-driven fixed->unlimited promotion
    (test/exis/EXISL1bSFEU_remapping type1: a dim declared size-N in the
    input becomes unlimited in the output, so every element is its own
    record). Spark-side this is posexplode; all other columns replicate
    across the new rows — the reference's "size 1 per file" broadcast
    semantics for dims a variable lacks (ncagg/aggrelist.py:455-459).
    """
    others = [c for c in df.columns if c != array_col]
    return df.select(
        *others,
        F.posexplode_outer(F.col(array_col)).alias(pos_col, array_col),
    )
