"""Incremental delta-sync against a content-addressed store (foreachBatch).

The streaming twin of ``operators/diff.py::sync_plan``: the new
snapshot's chunks arrive as a stream, and each micro-batch settles
against a persistent chunk store — identities the old snapshot already
holds cost nothing (``reused_old``), first-seen new identities are
"shipped" (``transfer``) and added to the store, every other occurrence
of a new identity deduplicates within the transfer (``dedup_new``)
whether it repeats inside one batch or across batches. ``foreachBatch``
is the right tool because each batch must both read and extend the
store — a sink with feedback, which pure streaming operators can't
express.

Store rows carry their origin ('old' seed vs 'new' added mid-run) so the
reused/dedup split is batch-boundary-invariant and the converged totals
equal the batch plan's — the DuckDB oracle for the batch sync_plan
(global totals form) checks this stream exactly.

Scale posture: the store holds identities (at 100 TB, 8-byte
``xxhash64`` keys, not payloads) partitioned by hash prefix; the
per-batch anti-join shuffles only the micro-batch side because the
store read is pruned to the batch's hash-prefix partitions. Metrics are
1-row-per-batch writes — no driver-side accumulation.

Recovery semantics: foreachBatch is at-least-once — after a failure the
last uncommitted batch REPLAYS with the same batch_id — so both sinks
are epoch-keyed overwrites (``.../batch_<id>`` subdirectories) and the
store read excludes the current batch_id. Replay rewrites the same
files instead of appending duplicates; totals are exactly-once.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _list_store_subdirs(
    spark: SparkSession, store_dir: str, exclude: str
) -> list[str]:
    """Enumerate the store's epoch subdirectories via the Hadoop
    FileSystem API, so the sink works against any Spark-supported store
    path (``hdfs://``, ``s3a://``, local) — ``os.listdir`` would couple
    it to a driver-local filesystem. Only the names this module writes
    (``seed``, ``batch_<id>``) are returned: a stray ``_SUCCESS`` marker
    or temp directory in ``store_dir`` must not end up in a
    ``read.parquet`` call. Generations recorded as folded by the
    store's ``_folded_epochs.json`` manifest (written by
    storeio.compact_epoch_store) are skipped — including a folded
    ``batch_<id>`` re-created by an at-least-once replay AFTER the
    compaction that subsumed it."""
    from cdc_algorithms_spark.operators.storeio import read_folded_epochs

    folded = read_folded_epochs(spark, store_dir)
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(store_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    out = []
    for st in fs.listStatus(path):
        if not st.isDirectory():
            continue
        name = st.getPath().getName()
        if name == exclude or name in folded or not (
            name == "seed" or name.startswith("batch_")
        ):
            continue
        out.append(st.getPath().toString())
    return sorted(out)


def sync_batch(
    spark: SparkSession,
    batch: DataFrame,
    store_dir: str,
    metrics_dir: str,
    batch_id: int = 0,
) -> None:
    """Settle one micro-batch of chunks against the store — IDEMPOTENT
    per ``batch_id``.

    ``batch`` needs columns (chunk_text, length). Writes first-seen
    identities to ``store_dir/batch_<id>`` and one metrics row to
    ``metrics_dir/batch_<id>``, both with ``mode("overwrite")``: after a
    failure, Structured Streaming REPLAYS the last uncommitted batch
    with the same batch_id, so an append sink would double-count its
    metrics and duplicate its store rows. The epoch-keyed overwrite
    makes the replay a no-op-equivalent rewrite, and the store read
    EXCLUDES the current batch_id's subdirectory so a half-written
    first attempt can't make its own identities look pre-existing
    (which would flip transfer→reused and corrupt the totals).
    """
    per_key = batch.groupBy("chunk_text").agg(
        F.sum("length").alias("bytes_all"),
        F.max("length").alias("bytes_one"),
    )
    # exclude the current batch's subdir at the PATH level, not with a
    # data filter: the overwrite below deletes batch_<id>'s files, and
    # if they were in this read's lineage a post-failure recompute (lost
    # executor between the metrics and store writes) would re-read files
    # the overwrite just removed — FileNotFound in exactly the recovery
    # path this sink exists to survive.
    prior = _list_store_subdirs(spark, store_dir, f"batch_{batch_id}")
    store = spark.read.parquet(*prior)
    classified = per_key.join(store, "chunk_text", "left").persist()
    unseen = F.col("origin").isNull()
    metrics = classified.agg(
        F.coalesce(F.sum("bytes_all"), F.lit(0)).cast("long").alias("total_bytes"),
        F.coalesce(
            F.sum(F.when(F.col("origin") == "old", F.col("bytes_all"))), F.lit(0)
        ).cast("long").alias("reused_old_bytes"),
        F.coalesce(F.sum(F.when(unseen, F.col("bytes_one"))), F.lit(0))
        .cast("long")
        .alias("transfer_bytes"),
        F.coalesce(
            F.sum(
                F.when(unseen, F.col("bytes_all") - F.col("bytes_one")).when(
                    F.col("origin") == "new", F.col("bytes_all")
                )
            ),
            F.lit(0),
        ).cast("long").alias("dedup_new_bytes"),
    )
    metrics.withColumn("batch_id", F.lit(batch_id).cast("long")).write.mode(
        "overwrite"
    ).parquet(os.path.join(metrics_dir, f"batch_{batch_id}"))
    classified.where(unseen).select(
        "chunk_text",
        F.lit("new").alias("origin"),
        F.lit(batch_id).cast("long").alias("batch_id"),
    ).write.mode("overwrite").parquet(
        os.path.join(store_dir, f"batch_{batch_id}")
    )
    classified.unpersist()


def run_incremental_sync(
    spark: SparkSession,
    old_chunks: DataFrame,
    new_chunk_stages: list[DataFrame],
    workdir: str,
) -> DataFrame:
    """Seed the store with the old snapshot's identities, stream the new
    snapshot's chunks through ``sync_batch``, return total transfer
    metrics (1 row). Which occurrence of a duplicate set ships is
    arrival-order-dependent; the byte totals are not (identical text has
    identical length), so the converged totals are deterministic."""
    if not new_chunk_stages:
        raise ValueError("need at least one new-chunk stage")
    store_dir = os.path.join(workdir, "store")
    metrics_dir = os.path.join(workdir, "metrics")
    # a reused workdir must not leak a prior run's batch_* subdirs into
    # this run's store or totals (both are per-batch-id subdirectories
    # now, so overwriting the seed alone would not clear them)
    shutil.rmtree(metrics_dir, ignore_errors=True)
    shutil.rmtree(store_dir, ignore_errors=True)
    old_chunks.select("chunk_text").distinct().select(
        "chunk_text",
        F.lit("old").alias("origin"),
        F.lit(-1).cast("long").alias("batch_id"),
    ).write.mode("overwrite").parquet(os.path.join(store_dir, "seed"))

    in_dir = tempfile.mkdtemp(prefix="cdc_sync_in_")
    try:
        new_chunk_stages[0].write.mode("append").parquet(in_dir)
        stream = spark.readStream.schema(new_chunk_stages[0].schema).parquet(in_dir)
        query = (
            stream.writeStream.foreachBatch(
                lambda b, bid: sync_batch(spark, b, store_dir, metrics_dir, bid)
            )
            .outputMode("append")
            .start()
        )
        try:
            query.processAllAvailable()
            for stage in new_chunk_stages[1:]:
                stage.write.mode("append").parquet(in_dir)
                query.processAllAvailable()
        finally:
            query.stop()
            query.awaitTermination()
    finally:
        shutil.rmtree(in_dir, ignore_errors=True)

    return spark.read.parquet(os.path.join(metrics_dir, "*")).agg(
        F.sum("total_bytes").cast("long").alias("total_bytes"),
        F.sum("reused_old_bytes").cast("long").alias("reused_old_bytes"),
        F.sum("transfer_bytes").cast("long").alias("transfer_bytes"),
        F.sum("dedup_new_bytes").cast("long").alias("dedup_new_bytes"),
    )


def compact_epoch_store(spark: SparkSession, store_dir: str) -> int:
    """Fold an epoch-keyed store's subdirectories (``seed`` +
    ``batch_<id>``) into ONE new ``seed`` — the maintenance verb every
    foreachBatch store in this package eventually needs (band index,
    doc store, manifests, watermarks): each settled micro-batch adds a
    directory, and after 10k batches every reader's listing and scan
    carries 10k branches. Returns the number of directories folded.

    Delegates to :func:`cdc_algorithms_spark.operators.storeio.
    compact_epoch_store` — the single implementation with the
    ``_folded_epochs.json`` manifest (replay-after-compaction
    dead-lettering), concurrent-extend rescue, and install-failure
    rollback. This module used to carry its own manifest-less compactor;
    the two are now one so every caller (including the public
    ``api.compact_stream_store`` verb) gets the same guarantees. Run
    with readers quiesced (between micro-batches) — see the storeio
    docstring for the exact contract."""
    from cdc_algorithms_spark.operators.storeio import (
        compact_epoch_store as _compact,
    )

    return _compact(spark, store_dir)
