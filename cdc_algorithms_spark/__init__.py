"""cdc_algorithms_spark — a PySpark-native content-defined-chunking (CDC)
deduplication analytics engine.

Re-expresses the capabilities of the reference Rust repository
``letit6E/cdc-algorithms`` (content-defined chunking: Fixed / FastCDC /
Rabin / AE, chunk-hash deduplication metrics, segment-parallel chunking)
as idiomatic Spark DataFrame pipelines, and extends them with the
operations a large-scale training-data pipeline needs (document dedup,
similarity search, text analysis, multimodal plumbing, streaming change
detection).

Design stance (SURVEY.md §7): everything above the chunk-boundary
computation is a declarative DataFrame transformation that Catalyst can
optimize; the chunkers themselves are the custom Arrow-vectorized UDF
surface. No RDDs, no driver-side loops over data.
"""

from cdc_algorithms_spark import api
from cdc_algorithms_spark.session import get_spark
from cdc_algorithms_spark.sources.registry import load_table, load_tables

__all__ = ["api", "get_spark", "load_table", "load_tables"]

__version__ = "0.1.0"
