"""Streaming maintenance of the durable DSIR term-count store
(foreachBatch).

The selection twin of streaming/text_index.py: the unigram language
models behind dsir_importance_weights seed on an initial corpus
(operators/selection.py::write_dsir_counts); new documents then stream
in and each micro-batch is tokenized and appended as a bucket-
partitioned count delta plus an exact token-total meta row
(extend_dsir_counts). Scoring (dsir_weights_indexed) folds base +
deltas at read time.

Convergence contract — the BM25 store's, verbatim: the store holds
nothing but exact integer counts and the probe derives every model
quantity (c_raw, c_tgt, totals, vocabulary size) from what it reads,
so the streamed store scores every document BIT-IDENTICALLY to the
batch dsir_importance_weights over seed ∪ batches. The
``streaming_dsir_weights`` driver row therefore shares the batch DSIR
oracle verbatim (no approximation tier).

``foreachBatch`` + per-epoch overwrite keeps at-least-once replay
idempotent, same as every epoch store in this repo.

Scale posture: per-batch work is batch-proportional (one tokenize + one
bucket-hash exchange of the batch's term counts); nothing resident is
re-read on ingest. This closes the selection tier's streaming loop —
every standing pipeline here (near-dup, ANN, BM25, sketches, layout,
selection) now has both a batch and a maintained form.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import Column, DataFrame, SparkSession


def run_streaming_dsir_counts(
    spark: SparkSession,
    seed_docs: DataFrame,
    batch_stages: list[DataFrame],
    path: str,
    target_pred: Column,
    buckets: int | None = None,
) -> str:
    """Build + write the base count store on ``seed_docs``, then stream
    the stages' (doc_id, text, lang, …) rows through
    :func:`~cdc_algorithms_spark.operators.selection.extend_dsir_counts`
    one micro-batch per stage. Returns ``path`` ready for
    ``dsir_weights_indexed``. doc_ids must be unique across seed and
    stages (a doc arrives exactly once — the dedup operators own the
    other case)."""
    from cdc_algorithms_spark.operators.selection import (
        extend_dsir_counts,
        write_dsir_counts,
    )

    if not batch_stages:
        raise ValueError("need at least one batch stage")
    # buckets=None → write_dsir_counts derives a size-adaptive count and
    # records it in the store meta; the per-epoch extends below resolve
    # it from there (passing None), so writer/extender agreement is
    # structural either way
    b = buckets
    shutil.rmtree(path, ignore_errors=True)
    write_dsir_counts(seed_docs, target_pred, path, buckets=b)

    in_dir = tempfile.mkdtemp(prefix="cdc_dsirstream_in_")
    try:
        batch_stages[0].write.mode("append").parquet(in_dir)
        stream = spark.readStream.schema(batch_stages[0].schema).parquet(
            in_dir
        )
        query = (
            stream.writeStream.foreachBatch(
                lambda batch, bid: extend_dsir_counts(
                    spark, path, batch, target_pred, bid, buckets=b
                )
            )
            .outputMode("append")
            .start()
        )
        try:
            query.processAllAvailable()
            for stage in batch_stages[1:]:
                stage.write.mode("append").parquet(in_dir)
                query.processAllAvailable()
        finally:
            query.stop()
            query.awaitTermination()
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)
    return path


__all__ = ["run_streaming_dsir_counts"]
