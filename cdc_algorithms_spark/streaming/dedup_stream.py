"""Incremental chunk-level dedup over a document stream.

The batch pipeline's ``HashSet`` analogue (ae.rs:69, 80-84) becomes
streaming ``dropDuplicates`` — Spark keeps the seen-hash set as managed
operator state, partitioned by hash across executors, so at 100 TB the
state shards horizontally instead of living in one process's heap. With
an event-time column + watermark the state is additionally bounded in
time (late arrivals beyond the delay are dropped); without one it grows
with the unique-hash count — 8 bytes a hash, the same asymptotics as the
reference's in-memory set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.chunking import fixed_chunks, with_chunk_hash


def incremental_unique_chunks(
    docs_stream: DataFrame,
    chunk_size: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming first-occurrence chunk feed: fixed chunks → xxhash64 →
    ``dropDuplicates(["hash"])``.

    Emits each distinct chunk exactly once, at its first appearance
    across all micro-batches — the incremental twin of the batch dedup
    pipeline, same chunk schema plus ``hash``. Chunking is the same
    declarative operator as batch (`fixed_chunks` works unchanged on a
    streaming frame — this symmetry is the point of the DataFrame-first
    design).

    Pass ``ts_col`` to bound dedup state with a watermark: the time
    column rides through the chunk projection (``keep_cols`` — the
    watermark doesn't survive a projection that drops it) and state is
    evicted via ``dropDuplicatesWithinWatermark(["hash"])``, which
    dedups BY HASH while aging out entries older than the delay —
    ``dropDuplicates(["hash", ts])`` would instead re-emit a chunk for
    every distinct timestamp.
    """
    if ts_col is not None:
        chunked = with_chunk_hash(
            fixed_chunks(
                docs_stream, chunk_size, id_col, text_col, keep_cols=(ts_col,)
            )
        )
        return chunked.withWatermark(
            ts_col, watermark_delay
        ).dropDuplicatesWithinWatermark(["hash"])
    chunked = with_chunk_hash(fixed_chunks(docs_stream, chunk_size, id_col, text_col))
    return chunked.dropDuplicates(["hash"])


def streaming_dedup_stats(unique_chunks: DataFrame) -> DataFrame:
    """Running dedup totals over the unique-chunk feed (complete/update
    mode): unique chunk count and unique bytes per algo. Total-bytes
    accounting stays with the pre-dedup stream; this aggregate tracks
    the survivor side, i.e. the numerator of the dedup coefficient
    (ae.rs:91)."""
    return unique_chunks.groupBy("algo").agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum("length").alias("unique_bytes"),
    )
