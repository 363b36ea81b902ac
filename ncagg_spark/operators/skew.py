"""Skew mitigation: salted equi-join for hot keys.

AQE's skew-join handles most cases by splitting oversized partitions,
but it only helps sort-merge joins and can't split a single hot KEY on
both sides. The classic remedy: salt the skewed (large) side into
``n_salts`` sub-keys and replicate the other side across all salts —
turning one hot partition into ``n_salts`` even ones at the cost of
replicating the small side n_salts times.

Use when a known-hot key (null-heavy foreign keys, boilerplate dedup
buckets, celebrity users) dominates a shuffle; otherwise prefer plain
joins + AQE (`spark.sql.adaptive.skewJoin.enabled` is on in
session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side
    replicated. Result equals ``skewed.join(other, on, how)`` for
    inner/left joins (each skewed row joins exactly its salt's replica).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    keys = [on] if isinstance(on, str) else list(on)
    s = skewed.withColumn(
        SALT_COL, (F.rand(seed=42) * n_salts).cast("int")
    )
    o = other.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(SALT_COL),
    )
    out = s.join(o, on=keys + [SALT_COL], how=how)
    return out.drop(SALT_COL)
