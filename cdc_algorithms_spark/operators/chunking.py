"""Chunking operators: byte/char streams → chunk rows.

Central fact-table schema (SURVEY.md §1.2)::

    chunks(src_id: long, algo: string, chunk_idx: long,
           offset: long, length: long, chunk_text: string)

``chunk_text`` is retained for correctness-checkable pipelines; the scale
path derives ``hash = xxhash64(chunk_text)`` and drops the payload before
any shuffle, so only 8-byte fingerprints move between executors.

Fixed chunking (reference: fixed.rs:20-52) is pure declarative SQL — no
UDF — so Catalyst folds it into the scan stage: ``sequence`` generates the
cut offsets, ``posexplode`` turns them into rows, ``substring`` slices the
payload. Filters/projections above it still push down to parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fixed_chunks(
    docs: DataFrame,
    chunk_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document's text into fixed-size chunks.

    Mirrors ``FixedChunker::next_chunk`` (fixed.rs:20-52): cut every
    ``chunk_size`` bytes, final chunk keeps the remainder. Expressed with
    built-ins only (``sequence``/``posexplode``/``substring``) so the whole
    operator stays inside whole-stage codegen and is DuckDB-oracle-checkable.
    """
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    n = F.length(F.col(text_col))
    return (
        docs.select(
            F.col(id_col).cast("long").alias("src_id"),
            F.col(text_col),
            F.posexplode(
                F.sequence(F.lit(0), n - F.lit(1), F.lit(chunk_size))
            ).alias("chunk_idx", "offset"),
        )
        .select(
            "src_id",
            F.lit(f"fixed{chunk_size}").alias("algo"),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("offset").cast("long").alias("offset"),
            F.least(
                F.lit(chunk_size),
                F.length(text_col) - F.col("offset"),
            ).cast("long").alias("length"),
            F.expr(
                f"substring({text_col}, offset + 1, {chunk_size})"
            ).alias("chunk_text"),
        )
    )


def with_chunk_hash(chunks: DataFrame, text_col: str = "chunk_text") -> Column | DataFrame:
    """64-bit content fingerprint, the Spark analogue of the reference's
    ``DefaultHasher`` over chunk bytes (ae.rs:75-78, rabin.rs:111-114).

    ``xxhash64`` is a JVM built-in (codegen'd, no Python roundtrip); at
    100 TB only these 8-byte hashes shuffle, never chunk payloads.
    """
    return chunks.withColumn("hash", F.xxhash64(F.col(text_col)))
