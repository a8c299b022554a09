from cdc_algorithms_spark.operators.chunking import fixed_chunks
from cdc_algorithms_spark.operators.dedup import dedup_stats

__all__ = ["fixed_chunks", "dedup_stats"]
