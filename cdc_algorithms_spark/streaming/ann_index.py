"""Streaming maintenance of the durable IVF-PQ index (foreachBatch).

Completes the standing-ANN-service story: the model (coarse centroids +
PQ codebooks) is trained ONCE on a seed corpus and persisted
(operators/similarity.py::write_pq_index); new vectors then stream in
and each micro-batch is ENCODED with the frozen model and appended as a
cell-partitioned epoch delta (extend_pq_index) — no Lloyd iteration, no
corpus re-read, ever. Probes (pq_topk_indexed) read base + deltas with
the same statically pruned cell scans.

``foreachBatch`` is the right tool for the same reason as
streaming/near_dup.py: each batch extends persistent state. Per-epoch
overwrites keep at-least-once replay idempotent.

Convergence contract (pinned in tests/test_ann_streaming.py): encoding
is a pure per-row function of the frozen model, so the streamed index
is bit-identical to a one-shot encode of seed ∪ all batches — probe
results are batching-invariant. Recall against the FULL corpus is
gated by the ``streaming_pq_index`` driver check (the model saw only
the seed, so this also measures codebook generalization; a drifting
stream degrades recall, never correctness — the re-train is periodic,
like layout re-planning).

Scale posture: per-batch work is batch-proportional (one map-side
encode + one cell-hash exchange of m-byte codes); driver traffic is the
few-KB model row per batch. At 1B+ vectors raise nlist — same plan.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def run_streaming_pq_index(
    spark: SparkSession,
    seed_corpus: DataFrame,
    batch_stages: list[DataFrame],
    index_path: str,
    dim: int = 64,
    m: int = 8,
    ksub: int = 16,
    nlist: int = 16,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Train + write the index on ``seed_corpus``, then stream the
    stages' (vec_id, embedding) rows through
    :func:`~cdc_algorithms_spark.operators.similarity.extend_pq_index`
    one micro-batch per stage. Returns ``index_path`` ready for
    :func:`~cdc_algorithms_spark.operators.similarity.read_pq_index` /
    ``pq_topk_indexed``. vec_ids must be unique across seed and stages.
    """
    from cdc_algorithms_spark.operators.similarity import (
        extend_pq_index,
        write_pq_index,
    )

    if not batch_stages:
        raise ValueError("need at least one batch stage")
    shutil.rmtree(index_path, ignore_errors=True)
    write_pq_index(
        seed_corpus, index_path, dim=dim, m=m, ksub=ksub, nlist=nlist,
        corpus_id=corpus_id, vec_col=vec_col,
    )

    in_dir = tempfile.mkdtemp(prefix="cdc_pqstream_in_")
    try:
        batch_stages[0].write.mode("append").parquet(in_dir)
        stream = spark.readStream.schema(batch_stages[0].schema).parquet(
            in_dir
        )
        query = (
            stream.writeStream.foreachBatch(
                lambda b, bid: extend_pq_index(
                    spark, index_path, b, bid,
                    corpus_id=corpus_id, vec_col=vec_col,
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
    return index_path


__all__ = ["run_streaming_pq_index"]
