from ncagg_spark.operators.bounds import apply_bounds
from ncagg_spark.operators.dedup import cadence_bucket, dedup_cadence
from ncagg_spark.operators.gapfill import gap_fill
from ncagg_spark.operators.normalize import drop_invalid_index, normalize_fills
from ncagg_spark.operators.projection import (
    coalesce_alternates,
    rename_columns,
    take_dim_indices,
)
from ncagg_spark.operators.regularize import regularize

__all__ = [
    "apply_bounds",
    "cadence_bucket",
    "dedup_cadence",
    "gap_fill",
    "drop_invalid_index",
    "normalize_fills",
    "coalesce_alternates",
    "rename_columns",
    "take_dim_indices",
    "regularize",
]
