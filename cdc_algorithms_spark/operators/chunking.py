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

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_algorithms_spark.chunkers import ae_cuts, fastcdc_cuts, rabin_cuts
from cdc_algorithms_spark.chunkers.params import make_params

CHUNK_SCHEMA = (
    "src_id long, algo string, chunk_idx long, "
    "offset long, length long, chunk_text string"
)

_CUT_FNS = {"ae": ae_cuts, "rabin": rabin_cuts, "fastcdc": fastcdc_cuts}


def fixed_chunks(
    docs: DataFrame,
    chunk_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split each document's text into fixed-size chunks.

    Mirrors ``FixedChunker::next_chunk`` (fixed.rs:20-52): cut every
    ``chunk_size`` bytes, final chunk keeps the remainder. Expressed with
    built-ins only (``sequence``/``posexplode``/``substring``) so the whole
    operator stays inside whole-stage codegen and is DuckDB-oracle-checkable.

    ``keep_cols`` pass extra source columns through to every chunk row
    (e.g. an event-time column a streaming consumer needs for its
    watermark — watermarks don't survive a projection that drops the
    time column).
    """
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    keep_cols = tuple(keep_cols)
    n = F.length(F.col(text_col))
    # empty text yields no chunks (FixedChunker returns Finished on an
    # exhausted input, fixed.rs:29-37); without the guard ANSI mode
    # rejects sequence(0, -1).
    return (
        docs.where(n > 0).select(
            F.col(id_col).cast("long").alias("src_id"),
            F.col(text_col),
            *keep_cols,
            F.posexplode(
                F.sequence(F.lit(0), n - F.lit(1), F.lit(chunk_size))
            ).alias("chunk_idx", "offset"),
        )
        .select(
            "src_id",
            *keep_cols,
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


def cdc_chunks(
    docs: DataFrame,
    algo: str,
    expected_size: int,
    seed: int = 0,
    window_size: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking of each document (AE / Rabin / FastCDC).

    The custom-operator surface of the engine (SURVEY.md §2.2 C2-C4):
    boundary computation runs as an Arrow-batched ``mapInPandas`` UDF —
    one task per input split, zero shuffles; everything downstream
    (seam filters, hashing, dedup) is declarative Spark SQL.

    Inputs are projected to ``(id, text)`` before the UDF because column
    pruning does not reach through ``mapInPandas`` (SURVEY.md §4.1), so
    the parquet scan reads exactly two columns.

    Chunk identity: bytes are the UTF-8 encoding of ``text_col``
    (reference operates on raw bytes, chunker.rs:31-37); offsets/lengths
    are byte-based. The test corpus is ASCII so they equal char offsets.
    """
    if algo not in _CUT_FNS:
        raise ValueError(f"unknown CDC algo {algo!r}; one of {sorted(_CUT_FNS)}")
    params = make_params(algo, expected_size, seed, window_size=window_size)
    cut_fn = _CUT_FNS[algo]
    label = f"{algo}{expected_size}"

    def chunk_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            src_ids: list[int] = []
            idxs: list[int] = []
            offsets: list[int] = []
            lengths: list[int] = []
            texts: list[str] = []
            for sid, text in zip(pdf["__src_id"], pdf["__text"]):
                if text is None:
                    continue
                data = text.encode("utf-8")
                prev = -1
                for idx, cut in enumerate(cut_fn(data, params)):
                    src_ids.append(sid)
                    idxs.append(idx)
                    offsets.append(prev + 1)
                    lengths.append(cut - prev)
                    texts.append(data[prev + 1 : cut + 1].decode("utf-8", "replace"))
                    prev = cut
            yield pd.DataFrame(
                {
                    "src_id": pd.Series(src_ids, dtype="int64"),
                    "algo": label,
                    "chunk_idx": pd.Series(idxs, dtype="int64"),
                    "offset": pd.Series(offsets, dtype="int64"),
                    "length": pd.Series(lengths, dtype="int64"),
                    "chunk_text": texts,
                }
            )

    narrow = docs.select(
        F.col(id_col).cast("long").alias("__src_id"), F.col(text_col).alias("__text")
    )
    return narrow.mapInPandas(chunk_batches, CHUNK_SCHEMA)


def with_chunk_hash(chunks: DataFrame, text_col: str = "chunk_text") -> Column | DataFrame:
    """64-bit content fingerprint, the Spark analogue of the reference's
    ``DefaultHasher`` over chunk bytes (ae.rs:75-78, rabin.rs:111-114).

    ``xxhash64`` is a JVM built-in (codegen'd, no Python roundtrip); at
    100 TB only these 8-byte hashes shuffle, never chunk payloads.
    """
    return chunks.withColumn("hash", F.xxhash64(F.col(text_col)))
