"""ncagg_spark — a PySpark-native time-series aggregation & analytics engine.

A ground-up re-expression of the capabilities of the reference engine
(5tefan/ncagg — NetCDF granule aggregation) as idiomatic Spark DataFrame
pipelines, plus the large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) a 100 TB deployment
needs.

Semantics (see SURVEY.md):
    scan -> union all -> sort -> range filter -> dedup -> gap-fill
    (regularize to an expected cadence) -> project/remap -> write,
plus aggregate "attribute strategies" over the input-file manifest.

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join planning and AQE handles skew/partition sizing at scale.
"""

from ncagg_spark.config import AggregationConfig
from ncagg_spark.operators.regularize import regularize
from ncagg_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["AggregationConfig", "regularize", "get_spark", "__version__"]
