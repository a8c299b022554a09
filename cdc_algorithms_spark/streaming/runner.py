"""Staged micro-batch harness: drive a streaming pipeline over a bounded
input split into deterministic stages.

Structured Streaming's file source discovers new files per trigger, so a
bounded fixture becomes a multi-micro-batch stream by writing it to a
staging directory in slices and calling ``processAllAvailable`` between
writes. This is the standard local test pattern; in production the same
pipeline code points at a real append source (cloud storage / Kafka) and
nothing else changes — the transformations are identical DataFrame ops.
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

_QUERY_IDS = itertools.count()


def run_staged_stream(
    spark: SparkSession,
    stages: Sequence[DataFrame],
    build: Callable[[DataFrame], DataFrame],
    output_mode: str = "append",
) -> DataFrame:
    """Run ``build(stream)`` over ``stages`` fed one micro-batch at a time.

    Each stage is a *batch* DataFrame appended to a temp staging dir as
    parquet; the stream reads the dir with the first stage's schema. The
    sink is an in-memory table (test-scale only — it collects to the
    driver); the returned DataFrame is that table read back as a batch
    frame, so callers can aggregate / oracle-check it.

    The query is stopped and the staging dir removed before returning —
    the memory sink's table survives the query.
    """
    if not stages:
        raise ValueError("need at least one stage")
    name = f"staged_sink_{os.getpid()}_{next(_QUERY_IDS)}"
    in_dir = tempfile.mkdtemp(prefix="cdc_stream_in_")
    try:
        stages[0].write.mode("append").parquet(in_dir)
        stream = spark.readStream.schema(stages[0].schema).parquet(in_dir)
        out = build(stream)
        query = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .start()
        )
        try:
            query.processAllAvailable()
            for stage in stages[1:]:
                stage.write.mode("append").parquet(in_dir)
                query.processAllAvailable()
        finally:
            query.stop()
            query.awaitTermination()
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
    return spark.table(name)
