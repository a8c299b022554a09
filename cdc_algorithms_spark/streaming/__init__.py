"""Structured Streaming surface (SURVEY.md §7 Milestone 3).

The reference's incremental pull API (``next_chunk`` carrying unconsumed
bytes between calls — fastcdc.rs:51-52, 86-96) maps to Structured
Streaming: bounded look-back chunker state lives in
``applyInPandasWithState`` (stateful.py), incremental dedup is streaming
``dropDuplicates`` (dedup_stream.py), and the `events` table gets
watermarked gap sessionization (sessions.py). runner.py is the staged
micro-batch harness used by tests and the registry queries.
"""

from cdc_algorithms_spark.streaming.runner import run_staged_stream
from cdc_algorithms_spark.streaming.dedup_stream import (
    incremental_unique_chunks,
    streaming_dedup_stats,
)
from cdc_algorithms_spark.streaming.sessions import sessionize
from cdc_algorithms_spark.streaming.stateful import stateful_cdc_chunks
from cdc_algorithms_spark.streaming.change_feed import chunk_change_feed

__all__ = [
    "run_staged_stream",
    "incremental_unique_chunks",
    "streaming_dedup_stats",
    "sessionize",
    "stateful_cdc_chunks",
    "chunk_change_feed",
]
