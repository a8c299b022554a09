"""Streaming change-feed query: stateful per-source chunk diff between
two corpus versions, oracle-checked against the SQL multiset diff.

The stream carries (src_id, version, text): version 0 = the documents
table, version 1 = the deterministically perturbed copy (diff.py's
PERTURB_SQL), in separate micro-batches so the diff state crosses a
batch boundary. The DuckDB oracle recomputes both versions' fixed-chunk
multisets and the same inserted/deleted/unchanged accounting per
(src_id, version).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.diff import PERTURB_SQL, perturb_documents
from cdc_algorithms_spark.queries import register
from cdc_algorithms_spark.sources.registry import load_table
from cdc_algorithms_spark.streaming import chunk_change_feed, run_staged_stream

_SIZE = 64

_CHANGE_FEED_ORACLE = f"""
WITH new_docs AS ({PERTURB_SQL}),
oc AS (
  SELECT d.doc_id AS src_id,
         substring(d.text, CAST(u.off + 1 AS INT), {_SIZE}) AS chunk_text,
         CAST(LEAST({_SIZE}, d.n_chars - u.off) AS BIGINT) AS len
  FROM documents d, UNNEST(range(0, d.n_chars, {_SIZE})) AS u(off)
),
nc AS (
  SELECT d.doc_id AS src_id,
         substring(d.text, CAST(u.off + 1 AS INT), {_SIZE}) AS chunk_text,
         CAST(LEAST({_SIZE}, d.n_chars - u.off) AS BIGINT) AS len
  FROM new_docs d, UNNEST(range(0, d.n_chars, {_SIZE})) AS u(off)
),
o AS (SELECT src_id, chunk_text, COUNT(*) AS n, MAX(len) AS len
      FROM oc GROUP BY src_id, chunk_text),
n AS (SELECT src_id, chunk_text, COUNT(*) AS n, MAX(len) AS len
      FROM nc GROUP BY src_id, chunk_text),
v0 AS (
  SELECT src_id, CAST(0 AS BIGINT) AS version,
         CAST(SUM(n) AS BIGINT) AS n_inserted,
         CAST(0 AS BIGINT) AS n_deleted,
         CAST(0 AS BIGINT) AS n_unchanged,
         CAST(SUM(n * len) AS BIGINT) AS inserted_bytes,
         1.0 AS change_ratio
  FROM o GROUP BY src_id
),
v1 AS (
  SELECT COALESCE(o.src_id, n.src_id) AS src_id, CAST(1 AS BIGINT) AS version,
         CAST(SUM(GREATEST(COALESCE(n.n, 0) - COALESCE(o.n, 0), 0)) AS BIGINT) AS n_inserted,
         CAST(SUM(GREATEST(COALESCE(o.n, 0) - COALESCE(n.n, 0), 0)) AS BIGINT) AS n_deleted,
         CAST(SUM(LEAST(COALESCE(o.n, 0), COALESCE(n.n, 0))) AS BIGINT) AS n_unchanged,
         CAST(SUM(GREATEST(COALESCE(n.n, 0) - COALESCE(o.n, 0), 0)
                  * COALESCE(n.len, o.len)) AS BIGINT) AS inserted_bytes,
         ROUND(SUM(GREATEST(COALESCE(n.n, 0) - COALESCE(o.n, 0), 0)
                   * COALESCE(n.len, o.len)) * 1.0
               / GREATEST(SUM(COALESCE(n.n, 0) * COALESCE(n.len, 0)), 1), 6)
           AS change_ratio
  FROM o FULL OUTER JOIN n
    ON o.src_id = n.src_id AND o.chunk_text = n.chunk_text
  GROUP BY COALESCE(o.src_id, n.src_id)
)
SELECT * FROM v0 UNION ALL SELECT * FROM v1
"""


@register("streaming_change_feed", _CHANGE_FEED_ORACLE)
def streaming_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    v0 = docs.select(
        F.col("doc_id").cast("long").alias("src_id"),
        F.lit(0).cast("long").alias("version"),
        "text",
    )
    v1 = perturb_documents(docs).select(
        F.col("doc_id").cast("long").alias("src_id"),
        F.lit(1).cast("long").alias("version"),
        "text",
    )
    return run_staged_stream(
        spark, [v0, v1], lambda s: chunk_change_feed(s, _SIZE)
    )


# --- foreachBatch incremental delta-sync -----------------------------------

_SYNC_TOTALS_ORACLE = f"""
WITH new_docs AS ({PERTURB_SQL}),
old_chunks AS (
  SELECT substring(d.text, CAST(u.off + 1 AS INT), {_SIZE}) AS chunk_text
  FROM documents d, UNNEST(range(0, d.n_chars, {_SIZE})) AS u(off)
),
new_chunks AS (
  SELECT substring(d.text, CAST(u.off + 1 AS INT), {_SIZE}) AS chunk_text,
         CAST(LEAST({_SIZE}, d.n_chars - u.off) AS BIGINT) AS length
  FROM new_docs d, UNNEST(range(0, d.n_chars, {_SIZE})) AS u(off)
),
store AS (SELECT DISTINCT chunk_text FROM old_chunks),
per_key AS (
  SELECT n.chunk_text, SUM(n.length) AS bytes_all, MAX(n.length) AS bytes_one,
         s.chunk_text IS NOT NULL AS in_store
  FROM new_chunks n LEFT JOIN store s USING (chunk_text)
  GROUP BY n.chunk_text, in_store
)
SELECT CAST(SUM(bytes_all) AS BIGINT) AS total_bytes,
  CAST(COALESCE(SUM(CASE WHEN in_store THEN bytes_all END), 0) AS BIGINT)
    AS reused_old_bytes,
  CAST(COALESCE(SUM(CASE WHEN NOT in_store THEN bytes_one END), 0) AS BIGINT)
    AS transfer_bytes,
  CAST(COALESCE(SUM(CASE WHEN NOT in_store THEN bytes_all - bytes_one END), 0) AS BIGINT)
    AS dedup_new_bytes
FROM per_key
"""


@register("streaming_sync_totals", _SYNC_TOTALS_ORACLE)
def streaming_sync_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch incremental delta-sync (streaming/sync.py): the new
    snapshot's chunks stream in 3 micro-batches against a persistent
    content store seeded with the old snapshot; converged totals must
    equal the batch sync plan's global byte accounting."""
    import tempfile

    from cdc_algorithms_spark.operators.chunking import fixed_chunks
    from cdc_algorithms_spark.streaming.sync import run_incremental_sync

    docs = load_table(spark, "documents", sf_dir)
    old = fixed_chunks(docs, _SIZE)
    new = fixed_chunks(perturb_documents(docs), _SIZE).select(
        "src_id", "chunk_text", "length"
    )
    stages = [new.where(F.col("src_id") % 3 == i).drop("src_id") for i in range(3)]
    workdir = tempfile.mkdtemp(prefix="cdc_sync_store_")
    try:
        result = run_incremental_sync(spark, old, stages, workdir)
        # materialize before the store dirs vanish — safe to collect:
        # run_incremental_sync returns GLOBAL TOTALS (a fixed handful of
        # aggregate rows, independent of corpus size), never per-chunk
        # rows; a corpus-proportional result would have to be written
        # out instead (sinks.py) before the tempdir cleanup
        rows = result.collect()
    finally:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(rows, result.schema)


# --- streaming novel-chunk detection vs a static baseline -------------------
# Incremental corpus ingest: new documents stream in, each micro-batch's
# chunks are anti-joined against the baseline corpus's (static,
# broadcast) chunk set, and the running novel-content tally converges to
# the batch set difference. This is delta-ingest change detection — the
# streaming face of snapshot_diff — and fully oracle-checkable because
# the join key is the chunk text itself (fixed chunking is pure SQL).
# At scale the static side is a bucketed chunk-store table (sinks.py)
# instead of a broadcast; the stream side is unchanged.

_NOVEL_SIZE = 64

_NOVEL_ORACLE = f"""
WITH base AS (
  SELECT DISTINCT substring(d.text, CAST(u.off + 1 AS INT), {_NOVEL_SIZE}) AS chunk_text
  FROM documents d, UNNEST(range(0, d.n_chars, {_NOVEL_SIZE})) AS u(off)
  WHERE d.doc_id % 2 = 0
),
novel AS (
  SELECT d.lang,
         substring(d.text, CAST(u.off + 1 AS INT), {_NOVEL_SIZE}) AS chunk_text,
         CAST(LEAST({_NOVEL_SIZE}, d.n_chars - u.off) AS BIGINT) AS length
  FROM documents d, UNNEST(range(0, d.n_chars, {_NOVEL_SIZE})) AS u(off)
  WHERE d.doc_id % 2 = 1
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_novel_chunks,
       CAST(SUM(length) AS BIGINT) AS novel_bytes
FROM novel
WHERE chunk_text NOT IN (SELECT chunk_text FROM base)
GROUP BY lang
"""


@register("streaming_novel_chunks_by_lang", _NOVEL_ORACLE)
def streaming_novel_chunks_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.operators.chunking import fixed_chunks
    from cdc_algorithms_spark.streaming import run_staged_stream

    docs = load_table(spark, "documents", sf_dir)
    baseline = (
        fixed_chunks(docs.where(F.col("doc_id") % 2 == 0), _NOVEL_SIZE)
        .select("chunk_text")
        .distinct()
    )
    lang_map = docs.select(F.col("doc_id").cast("long").alias("m_id"), "lang")
    incoming = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    stages = [incoming.where(F.col("doc_id") % 6 == 2 * i + 1) for i in range(3)]

    def build(stream: DataFrame) -> DataFrame:
        chunks = fixed_chunks(stream, _NOVEL_SIZE)
        novel = chunks.join(F.broadcast(baseline), "chunk_text", "left_anti")
        return (
            novel.join(F.broadcast(lang_map), novel.src_id == F.col("m_id"))
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_novel_chunks"),
                F.sum("length").cast("long").alias("novel_bytes"),
            )
        )

    return run_staged_stream(spark, stages, build, output_mode="complete")


# --- streaming near-dup index maintenance ------------------------------------
# Ingest → near-dup-index → dedup as one continuous pipeline
# (streaming/near_dup.py): the batch docs (doc_id % 3 == 0) arrive in 3
# micro-batches, each probing the persisted MinHash band index seeded
# from the corpus and extending it. The converged pair set must equal
# the one-shot incremental join — the same exact-Jaccard oracle as
# incremental_jaccard_pairs — no matter how the stream is batched.


from cdc_algorithms_spark.queries_text import _INCR_JACCARD_ORACLE


@register("streaming_near_dup_index", _INCR_JACCARD_ORACLE)
def streaming_near_dup_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convergence oracle: the accumulated streaming pair set equals
    the EXACT Jaccard pairs touching the streamed docs — valid for the
    same reason incremental_minhash_pairs shares this oracle
    (verification makes precision exact; the 32/8 banding misses zero
    J≥0.8 pairs on the driver corpus), plus the find-once argument in
    streaming/near_dup.py for cross-micro-batch pairs."""
    import tempfile

    from cdc_algorithms_spark.queries_text import (
        JACCARD_N,
        JACCARD_THRESHOLD,
        LSH_MAX_BUCKET,
    )
    from cdc_algorithms_spark.streaming.near_dup import (
        run_streaming_near_dup_index,
    )

    docs = load_table(spark, "documents", sf_dir)
    corpus = docs.where(F.col("doc_id") % 3 != 0).select("doc_id", "text")
    incoming = docs.where(F.col("doc_id") % 3 == 0).select("doc_id", "text")
    stages = [incoming.where(F.col("doc_id") % 9 == 3 * i) for i in range(3)]
    workdir = tempfile.mkdtemp(prefix="cdc_neardup_store_")
    try:
        result = run_streaming_near_dup_index(
            spark,
            corpus,
            stages,
            workdir,
            n=JACCARD_N,
            num_hashes=32,
            bands=8,
            threshold=JACCARD_THRESHOLD,
            max_bucket=LSH_MAX_BUCKET,
        )
        rows = result.collect()  # small pair frame; outlives the tempdir
        schema = result.schema
    finally:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)
    return spark.createDataFrame(rows, schema)
