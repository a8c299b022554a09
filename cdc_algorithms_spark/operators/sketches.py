"""Mergeable HLL sketches over chunk identities — the incremental
dedup-estimation path for the 100 TB posture.

The exact dedup aggregate (``operators/dedup.py``) shuffles every chunk
row on its key; correct, but answering "what is the dedup coefficient of
<any subset of the corpus>" re-scans that subset each time. The
mergeable-sketch shape fixes that at scale: sketch each group (ingest
batch / partition / language / source) ONCE with ``hll_sketch_agg``
(Apache DataSketches HllSketch, JVM-side, a few KiB per group), persist
the sketch rows, and answer any-subset unique-chunk questions later by
``hll_union_agg`` over just the sketch rows — the data itself is never
read again, and new data only sketches its own delta before the union.

HLL register *contents* merge by max and are order-independent, but the
DataSketches estimator is not bit-for-bit order-stable: a sketch built in
one pass uses the HIP estimator (insert-order-sensitive in its last few
counts), while unions fall back to the composite estimate. Estimates on
a repartitioned corpus therefore agree only to within a hair (<0.1%,
asserted in tests/test_sketches.py), which is the honest contract of an
approximate tier anyway.

Reference parity: the ``HashSet`` of chunk hashes (ae.rs:80-84,
rabin.rs:116-118) is the exact-set equivalent; SURVEY.md §2.5 names
``approx_count_distinct`` as the approximate tier — sketches are that
tier made *mergeable and incremental*. DuckDB cannot reproduce
DataSketches register values, so sketch queries take rows-only driver
checks; accuracy (< a few % vs exact at lg_k=14) is pinned in tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# log2 of the HLL register count: 2^14 registers ≈ 16 KiB dense sketch,
# ~0.8% relative standard error — small enough to keep thousands of
# per-group sketches, tight enough for dedup-ratio planning.
DEFAULT_LG_K = 14


def chunk_sketches(
    chunks: DataFrame,
    group_cols: Sequence[str] = ("algo",),
    key_col: str = "chunk_text",
    length_col: str = "length",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Per-group mergeable dedup sketch plus exact byte/chunk tallies.

    One partial-aggregating shuffle on ``group_cols`` (same plan shape as
    a sum — sketches merge map-side). Output per group:
    ``(… group_cols …, sketch: binary, n_chunks, total_bytes,
    est_unique_chunks)``.
    """
    key = F.xxhash64(F.col(key_col))
    out = chunks.groupBy(*group_cols).agg(
        F.hll_sketch_agg(key, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(length_col).cast("long").alias("total_bytes"),
    )
    return out.withColumn(
        "est_unique_chunks", F.hll_sketch_estimate("sketch").cast("long")
    )


def sketch_rollup(
    sketches: DataFrame,
    rollup_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge persisted sketch rows to a coarser grouping — no data re-read.

    Input is ``chunk_sketches`` output (or a stored table of it); the
    union touches only the few-KiB sketch column. With empty
    ``rollup_cols`` this produces the single global row.
    """
    aggs = [
        F.hll_union_agg("sketch").alias("sketch"),
        F.sum("n_chunks").cast("long").alias("n_chunks"),
        F.sum("total_bytes").cast("long").alias("total_bytes"),
    ]
    merged = (
        sketches.groupBy(*rollup_cols).agg(*aggs)
        if rollup_cols
        else sketches.agg(*aggs)
    )
    return merged.withColumn(
        "est_unique_chunks", F.hll_sketch_estimate("sketch").cast("long")
    )


def sketch_dedup_report(
    chunks: DataFrame,
    group_cols: Sequence[str] = ("lang",),
    key_col: str = "chunk_text",
    length_col: str = "length",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Per-group + global ('*') estimated-dedup report from one sketch pass.

    Demonstrates the incremental contract end-to-end: the global row is
    computed purely by unioning the per-group sketches. Columns:
    ``(group, n_chunks, total_bytes, est_unique_chunks,
    est_dup_ratio)`` where ``est_dup_ratio = 1 − est_unique/n_chunks``
    (share of chunk occurrences that are repeats, per the sketch).

    The group column is cast to string so the global row's ``'*'``
    label unions cleanly with non-string group keys (e.g. an int
    partition id).
    """
    if len(group_cols) != 1:
        raise ValueError("sketch_dedup_report takes exactly one group column")
    per = chunk_sketches(chunks, group_cols, key_col, length_col, lg_k)
    glob = sketch_rollup(per).withColumn("group", F.lit("*"))
    per = per.withColumn("group", F.col(group_cols[0]).cast("string"))
    cols = ["group", "n_chunks", "total_bytes", "est_unique_chunks"]
    out = per.select(*cols).unionByName(glob.select(*cols))
    return out.withColumn(
        "est_dup_ratio",
        F.round(1 - F.col("est_unique_chunks") / F.col("n_chunks"), 6),
    )
