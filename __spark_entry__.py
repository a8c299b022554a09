"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``cdc_algorithms_spark`` (see SURVEY.md §2 for
the operator inventory this registry covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_algorithms_spark import queries as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Spark restatement of the reference benchmark ``main()`` (main.rs:16-24):
    segment-parallel AE chunking of the corpus blob, chunk-hash dedup,
    one metrics row (TIME is harness-level; COEFF=dedup_coeff,
    AVG=avg_chunk per ae.rs:91).
    """
    return _registry.SPARK_QUERIES["parallel_ae_dedup_stats"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_registry.SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (omitted for non-SQL-expressible ops)."""
    return dict(_registry.ORACLE_SQL)
