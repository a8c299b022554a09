"""End-to-end streaming ingest: near-dup dedup → keep → compaction
manifest, as ONE continuous foreachBatch pipeline.

Composes the two already-verified streaming pieces into the standing
ingest loop a training-data pipeline actually runs (the streaming
sibling of ``training_manifest``'s batch composition):

1. **Probe + extend the near-dup index** (streaming/near_dup.py's
   settle pattern): each micro-batch's MinHash bands probe the
   persisted band index, candidates are exact-Jaccard verified, and
   the index + doc store extend under the batch's epoch key.
2. **Greedy keep-first dedup**: a batch document is KEPT iff it pairs
   with no smaller-id document (corpus ids precede batch ids because
   arrival is id-ordered — the same monotone-arrival contract as the
   stateful funnel's ts ordering). Dropped docs still extend the
   index, so later chains (c dup-of b dup-of a) resolve exactly like
   the batch rule.
3. **Cross-batch compaction routing**: kept docs bin-pack into
   ~``target_bytes`` files per source with the SAME running-sum rule as
   ``compaction_plan`` — the carried per-source byte total is read back
   from the previously written manifest rows (state lives in the store,
   so replay of an epoch recomputes, never double-counts).

Convergence contract (the oracle): because arrival order is doc_id
order and every pair is discovered when its later member arrives, the
converged keep set equals "documents that are not the greater id of
any exact J≥t pair", and the converged manifest equals
``compaction_plan`` over exactly that keep set in doc_id order — one
plain SQL statement over the source table, regardless of how the
stream was micro-batched (within the id-ordered stage contract).

Scale posture: per-batch work is candidate-proportional (band-index
probe, semi-joined verification) plus one ≤#sources-row totals read;
nothing corpus-sized shuffles per batch. All stores are epoch-keyed
overwrites (``batch_<id>`` subdirectories) so foreachBatch's
at-least-once replay rewrites instead of double-appending, exactly as
streaming/sync.py and streaming/near_dup.py document.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_algorithms_spark.streaming.sync import _list_store_subdirs


def ingest_pipeline_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    docs_dir: str,
    pairs_dir: str,
    manifest_dir: str,
    batch_id: int,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    max_bucket: int | None = None,
    target_bytes: int = 4096,
) -> None:
    """Settle one micro-batch of (doc_id, text, source, n_chars) rows —
    IDEMPOTENT per ``batch_id``: probe the band index for near-dup
    pairs, keep the batch docs that pair with no smaller id, route the
    kept docs into the cross-batch compaction manifest, then extend the
    index and doc store. Every write lands under this batch's epoch
    subdirectory; every read excludes it at the PATH level (replay
    safety, see streaming/sync.py::sync_batch)."""
    from cdc_algorithms_spark.operators.dedup_docs import (
        incremental_minhash_pairs,
        minhash_band_index,
    )

    me = f"batch_{batch_id}"
    index = spark.read.parquet(
        *_list_store_subdirs(spark, index_dir, exclude=me)
    )
    corpus = spark.read.parquet(
        *_list_store_subdirs(spark, docs_dir, exclude=me)
    )
    batch = batch.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    pairs = incremental_minhash_pairs(
        corpus,
        batch.select("doc_id", "text"),
        n=n,
        num_hashes=num_hashes,
        bands=bands,
        threshold=threshold,
        corpus_index=index,
        max_bucket=max_bucket,
    )
    # settle the pairs first, then derive the drop set from the WRITTEN
    # store — one execution of the probe plan, and the kept computation
    # survives replay identically
    pairs.write.mode("overwrite").parquet(os.path.join(pairs_dir, me))
    dropped = (
        spark.read.parquet(os.path.join(pairs_dir, me))
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    kept = batch.join(dropped, "doc_id", "left_anti")

    # carried per-source byte totals = what the manifest already holds
    # (state lives in the store: one ≤#sources-row aggregate per batch)
    prev_dirs = _list_store_subdirs(spark, manifest_dir, exclude=me)
    if prev_dirs:
        carried = (
            spark.read.parquet(*prev_dirs)
            .groupBy("source")
            .agg(F.sum("n_chars").alias("__carried"))
        )
        kept = kept.join(F.broadcast(carried), "source", "left")
    else:
        kept = kept.withColumn("__carried", F.lit(None).cast("long"))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = kept.withColumn(
        "file_seq",
        F.floor(
            (
                F.coalesce(F.col("__carried"), F.lit(0))
                + F.coalesce(F.sum("n_chars").over(w), F.lit(0))
            ).cast("double")
            / F.lit(float(int(target_bytes)))
        ).cast("long"),
    )
    assigned.select("source", "file_seq", "doc_id", "n_chars").write.mode(
        "overwrite"
    ).parquet(os.path.join(manifest_dir, me))

    # extend the index and doc store with the FULL batch — dropped docs
    # stay probe-able so duplicate chains resolve like the batch rule
    minhash_band_index(
        batch.select("doc_id", "text"), n, num_hashes, bands
    ).write.mode("overwrite").parquet(os.path.join(index_dir, me))
    batch.select("doc_id", "text").write.mode("overwrite").parquet(
        os.path.join(docs_dir, me)
    )


def run_streaming_ingest_pipeline(
    spark: SparkSession,
    batch_stages: list[DataFrame],
    workdir: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    max_bucket: int | None = None,
    target_bytes: int = 4096,
) -> DataFrame:
    """Stream the stages' (doc_id, text, source, n_chars) documents
    through :func:`ingest_pipeline_batch` (empty seed — EVERYTHING is
    ingested through the loop) and return the converged doc-level
    manifest rows ``(source, file_seq, doc_id, n_chars)``.

    Stages must be doc_id-ordered (every id in stage k smaller than
    every id in stage k+1) — the arrival-order contract under which the
    greedy keep-first rule converges to the batch keep set.
    """
    if not batch_stages:
        raise ValueError("need at least one batch stage")
    index_dir = os.path.join(workdir, "band_index")
    docs_dir = os.path.join(workdir, "docs")
    pairs_dir = os.path.join(workdir, "pairs")
    manifest_dir = os.path.join(workdir, "manifest")
    for d in (index_dir, docs_dir, pairs_dir, manifest_dir):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
    # empty seeds with the store schemas: the first batch probes an
    # empty index, exactly like a pipeline bootstrapping from nothing
    first = batch_stages[0]
    from cdc_algorithms_spark.operators.dedup_docs import minhash_band_index

    empty_docs = first.select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    ).limit(0)
    minhash_band_index(empty_docs, n, num_hashes, bands).write.parquet(
        os.path.join(index_dir, "seed")
    )
    empty_docs.write.parquet(os.path.join(docs_dir, "seed"))

    in_dir = tempfile.mkdtemp(prefix="cdc_ingest_in_")
    try:
        batch_stages[0].write.mode("append").parquet(in_dir)
        stream = spark.readStream.schema(batch_stages[0].schema).parquet(in_dir)
        query = (
            stream.writeStream.foreachBatch(
                lambda b, bid: ingest_pipeline_batch(
                    spark, b, index_dir, docs_dir, pairs_dir, manifest_dir,
                    bid, n=n, num_hashes=num_hashes, bands=bands,
                    threshold=threshold, max_bucket=max_bucket,
                    target_bytes=target_bytes,
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

    return spark.read.parquet(os.path.join(manifest_dir, "*"))
