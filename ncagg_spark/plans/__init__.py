from ncagg_spark.plans.attributes import STRATEGIES, reduce_attributes
from ncagg_spark.plans.manifest import build_manifest

__all__ = ["STRATEGIES", "reduce_attributes", "build_manifest"]
