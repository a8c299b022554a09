"""Degenerate-input behavior: empty tables, empty documents, identical
snapshots. Operators must return empty/zero results, not throw — at
100 TB a partition with no matching rows is routine, not exceptional."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.chunking import cdc_chunks, fixed_chunks
from cdc_algorithms_spark.operators.dedup import dedup_stats
from cdc_algorithms_spark.operators.diff import snapshot_diff
from cdc_algorithms_spark.sources.registry import load_table

SF_DIR = "/root/testdata/sf0.001"


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_fixed_chunks_empty_input(spark):
    assert fixed_chunks(_empty_docs(spark), 64).count() == 0


def test_cdc_chunks_empty_input(spark):
    assert cdc_chunks(_empty_docs(spark), "ae", 320).count() == 0


def test_empty_text_document_yields_no_chunks(spark):
    docs = spark.createDataFrame([(1, ""), (2, "abc")], "doc_id long, text string")
    rows = fixed_chunks(docs, 64).collect()
    assert {r["src_id"] for r in rows} == {2}


def test_dedup_stats_empty_chunks(spark):
    stats = dedup_stats(fixed_chunks(_empty_docs(spark), 64))
    assert stats.count() == 0  # no groups — empty frame, not a div-by-zero


def test_snapshot_diff_identical_corpora_is_all_unchanged(spark):
    docs = load_table(spark, "documents", SF_DIR).limit(50)
    chunks = fixed_chunks(docs, 64)
    d = snapshot_diff(chunks, chunks)
    assert d.where(F.col("status") != "unchanged").count() == 0


def test_distributed_chunking_single_tiny_blob(spark):
    """A blob smaller than one segment: one chunk path end-to-end."""
    from cdc_algorithms_spark.operators.distributed import parallel_chunk_blob

    blobs = spark.createDataFrame(
        [(1, bytes(range(200)))], "src_id long, content binary"
    )
    rows = parallel_chunk_blob(
        blobs, "ae", 320, segment_len=1 << 20, window_size=64
    ).collect()
    assert sum(r["length"] for r in rows) == 200
    assert [r["offset"] for r in sorted(rows, key=lambda r: r["chunk_idx"])][0] == 0
