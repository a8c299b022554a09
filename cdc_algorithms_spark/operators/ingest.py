"""Incremental ingest against an existing chunk index.

The 100 TB operating mode the one-shot dedup queries don't cover: the
corpus is already chunked and indexed (a content-addressed store keyed by
chunk hash — the persistent output of ``sources/sinks.py``), and a NEW
batch arrives. The ingest question is "how many of the batch's bytes are
genuinely novel vs already present?", answered WITHOUT re-reading the
existing corpus — only its hash index (8-byte keys + lengths, ~1/1000th
of corpus bytes) participates.

Reference lineage: this is the reference's dedup accounting (ae.rs:75-91
``HashSet`` membership + byte counters) split across time — the HashSet
becomes a persisted index DataFrame, membership becomes a hash-keyed
join. The reference itself has no incremental mode (every run re-chunks
its input, main.rs:16-24); the index formulation is what makes the same
accounting work when the already-seen side no longer fits a re-scan.

Scale shape: the batch side collapses to per-hash groups map-side before
any exchange; the join is a hash-partitioned equi-join on the 8-byte
key (never broadcast — BOTH sides can be huge; AQE handles skewed hot
hashes). The index update is a union of two already-distinct frames
(``dropDuplicates`` on the join key they're both partitioned by).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_index(chunks: DataFrame, key_col: str = "hash") -> DataFrame:
    """Distinct ``(hash, length)`` index of a chunk table — the metadata
    face of a content-addressed store (one row per stored chunk)."""
    return chunks.groupBy(F.col(key_col).alias("hash")).agg(
        # MAX, not first(): first() is partition-order-dependent, so a
        # hash that ever mapped to differing lengths (collision / dirty
        # input) would make the index non-deterministic across runs and
        # diverge from the MAX-based oracle.
        F.max("length").alias("length")
    )


def ingest_batch(
    index: DataFrame, batch_chunks: DataFrame, key_col: str = "hash"
) -> DataFrame:
    """Per-batch-chunk novelty marking: the batch's per-hash groups
    ``(hash, occurrences, bytes_all, length)`` with ``known`` = whether
    the hash is already in the index. Building block for
    ``ingest_stats`` and the store append path (append exactly the
    ``~known`` rows).

    ``key_col`` names the key column of the BATCH side only; the index
    side must already expose the canonical ``(hash, length)`` schema —
    i.e. come from :func:`chunk_index` (which renames whatever key it
    was given to ``hash``)."""
    per_key = batch_chunks.groupBy(F.col(key_col).alias("hash")).agg(
        F.count(F.lit(1)).alias("occurrences"),
        F.sum("length").alias("bytes_all"),
        F.max("length").alias("length"),
    )
    return per_key.join(
        index.select("hash", F.lit(True).alias("known")), "hash", "left"
    ).withColumn("known", F.coalesce("known", F.lit(False)))


def ingest_accounting(marked: DataFrame) -> DataFrame:
    """Fold a marked per-key frame — ``(known, occurrences, bytes_all,
    length, ...)``, the shape :func:`ingest_batch` emits — into the one
    accounting row. Shared by the batch path (:func:`ingest_stats`) and
    the streaming front-end (``streaming_ingest_novelty``), so the six
    sum definitions live in exactly one place. coalesce(0): an EMPTY
    batch must yield a zeros row (novel_frac NULL via try_divide — ANSI
    mode raises on 0/0), not a row of NULL sums."""
    return marked.agg(
        F.coalesce(F.sum("bytes_all"), F.lit(0)).cast("long").alias("batch_bytes"),
        F.coalesce(F.sum("occurrences"), F.lit(0)).cast("long").alias("batch_chunks"),
        F.coalesce(
            F.sum(F.when(~F.col("known"), F.col("length")).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("novel_bytes"),
        F.coalesce(F.sum(F.when(~F.col("known"), 1).otherwise(0)), F.lit(0))
        .cast("long")
        .alias("novel_chunks"),
        F.coalesce(
            F.sum(F.when(F.col("known"), F.col("bytes_all")).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("dup_index_bytes"),
        F.coalesce(
            F.sum(
                F.when(
                    ~F.col("known"), F.col("bytes_all") - F.col("length")
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("dup_batch_bytes"),
    ).withColumn(
        "novel_frac",
        F.round(F.try_divide(F.col("novel_bytes"), F.col("batch_bytes")), 6),
    )


def ingest_stats(
    index: DataFrame, batch_chunks: DataFrame, key_col: str = "hash"
) -> DataFrame:
    """One accounting row for ingesting a batch against an index:

    * ``batch_bytes`` / ``batch_chunks`` — raw arrival volume;
    * ``novel_bytes`` / ``novel_chunks`` — distinct chunks absent from
      the index: exactly what the store must persist (the incremental
      ``unique_bytes`` of the reference's coefficient, ae.rs:91);
    * ``dup_index_bytes`` — batch bytes whose chunk already existed
      (transfer/storage saved by the index);
    * ``dup_batch_bytes`` — bytes saved by repeats WITHIN the batch;
    * ``novel_frac`` — novel_bytes / batch_bytes (1.0 = all-new data,
      →0 as the corpus saturates; NULL for an empty batch).
    """
    return ingest_accounting(ingest_batch(index, batch_chunks, key_col=key_col))


def updated_index(
    index: DataFrame, batch_chunks: DataFrame, key_col: str = "hash"
) -> DataFrame:
    """The index after the batch lands: old index ∪ the batch's novel
    hashes. Both inputs arrive hash-distinct, so the union dedups with
    one exchange on the key both sides are already grouped by."""
    novel = (
        ingest_batch(index, batch_chunks, key_col=key_col)
        .where(~F.col("known"))
        .select("hash", "length")
    )
    return index.select("hash", "length").unionByName(novel).dropDuplicates(["hash"])
