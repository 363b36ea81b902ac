from ncagg_spark.sources.granules import read_granules
from ncagg_spark.sources.writer import write_aggregate

__all__ = ["read_granules", "write_aggregate"]
