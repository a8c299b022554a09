"""Chunk sinks: persist chunk tables and content-addressed chunk stores.

The reference's sink is ``output.write_all(&self.buffer[..i+1])`` — chunk
bytes appended to a caller-supplied buffer (SURVEY.md §2.1 S4;
fastcdc.rs:107-110, ae.rs:123-126). The Spark restatement is a parquet
write of the chunk DataFrame; these helpers pin the two layouts that
stay healthy at 100 TB:

* ``write_chunk_table`` — the full (src_id, chunk_idx, …) table,
  partitioned by ``algo`` so per-algorithm scans prune directories;
  repartitioned on the partition columns first so each output dir gets
  a bounded number of files instead of (num_tasks × num_algos).
* ``write_chunk_store`` — the DEDUPLICATED content-addressed store
  (one row per distinct hash, the "HashSet" of ae.rs:75-84 made
  durable). Laid out by 2-hex-digit hash prefix: 256 balanced
  directories (xxhash64 is uniform), so point lookups prune 255/256 of
  the data and incremental loads append without rewriting history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_chunk_table(
    chunks: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_cols: tuple[str, ...] = ("algo",),
) -> None:
    """Persist a chunk table partitioned by ``partition_cols``."""
    (
        chunks.repartition(*[F.col(c) for c in partition_cols])
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_chunk_store(
    chunks: DataFrame,
    path: str,
    hash_col: str = "hash",
    mode: str = "overwrite",
) -> None:
    """Persist the distinct-chunk content store, hash-prefix partitioned.

    ``dropDuplicates`` on the hash keeps the first-seen payload per
    content id (any is equivalent — equal hash ⇒ equal bytes for our
    64-bit identity model, collisions accepted like the reference's
    DefaultHasher dedup, ae.rs:75-84).
    """
    prefix = F.lpad(F.hex(F.col(hash_col)), 16, "0").substr(1, 2)
    (
        chunks.dropDuplicates([hash_col])
        .withColumn("hash_prefix", F.lower(prefix))
        .repartition(F.col("hash_prefix"))
        .write.mode(mode)
        .partitionBy("hash_prefix")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    n_buckets: int,
    bucket_col: str = "hash",
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table hash-bucketed on ``bucket_col``.

    Bucketing is the durable form of co-located joins: two tables
    bucketed on the same key with the same bucket count join (and
    groupBy on that key aggregates) WITHOUT a shuffle — the scan itself
    reports ``HashPartitioning(key, n)`` so Catalyst drops the Exchange
    on both sides. At 100 TB that removes the single largest network
    step from every snapshot-diff / chunk-store join; the price is paid
    once at write time. ``sortBy`` additionally orders within buckets so
    sort-merge joins skip their Sort when files-per-bucket is 1.
    """
    (
        df.repartition(n_buckets, F.col(bucket_col))
        .write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table_name)
    )


def read_chunk_store(spark, path: str) -> DataFrame:
    """Load a chunk store written by :func:`write_chunk_store`; the
    ``hash_prefix`` partition column comes back for pruned lookups."""
    return spark.read.parquet(path)


def append_novel_chunks(
    spark, chunks: DataFrame, path: str, hash_col: str = "hash"
) -> None:
    """Incrementally extend a :func:`write_chunk_store` store with ONLY
    the chunks whose hashes it does not already hold.

    The durable half of the incremental-ingest loop
    (operators/ingest.py): a blind ``mode("append")`` of a new batch
    would duplicate every already-stored identity (the store's one-row-
    per-hash contract would silently break, and reconstruction joins
    would fan out). Here the batch is deduplicated internally, then
    anti-joined against the store's hash column — a column-pruned read
    of 8-byte keys, never the payloads — and only the novel rows land,
    hash-prefix partitioned like the seed write. First call (no store
    yet) degrades to a plain store write.
    """
    from pyspark.errors import AnalysisException

    try:
        existing = spark.read.parquet(path).select(F.col(hash_col))
    except AnalysisException as e:
        # ONLY the missing-path case may seed. Any other analysis error
        # (wrong hash_col → UNRESOLVED_COLUMN, unreadable/empty dir →
        # UNABLE_TO_INFER_SCHEMA, …) must raise: reaching the seed path
        # there would mode("overwrite") a store that actually exists.
        cond = e.getCondition() or ""
        if "PATH_NOT_FOUND" not in cond:
            raise
        write_chunk_store(chunks, path, hash_col=hash_col)
        return
    novel = chunks.dropDuplicates([hash_col]).join(
        existing, hash_col, "left_anti"
    )
    # same layout as the seed write — one body to maintain (the store's
    # dropDuplicates inside is a no-op on the already-deduped frame)
    write_chunk_store(novel, path, hash_col=hash_col, mode="append")
