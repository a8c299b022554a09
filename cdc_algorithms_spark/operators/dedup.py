"""Chunk-level deduplication analytics.

Spark restatement of the reference's merge/dedup/metrics stage
(ae.rs:68-91, rabin.rs:104-127, parallel.rs:101-119): a ``HashSet`` of
chunk hashes plus byte counters becomes one shuffle on the dedup key and
a tiny global aggregate.

Both of the reference's (inconsistent) "average chunk size" definitions
are exposed explicitly (SURVEY.md §2.4 A3):

* ``avg_chunk``        = total_bytes / n_unique   (ae.rs:91, rabin.rs:127)
* ``avg_chunk_unique`` = unique_bytes / n_unique  (parallel.rs:119,153)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_stats(
    chunks: DataFrame,
    key_col: str = "chunk_text",
    algo_col: str = "algo",
    round_to: int = 6,
) -> DataFrame:
    """Dedup metrics per algorithm.

    ``key_col`` is the identity of a chunk: ``chunk_text`` for
    oracle-checkable runs (content equality — collision-free by
    construction), ``hash`` for the 100 TB path where only fingerprints
    shuffle. One partial-aggregating shuffle on (algo, key), then a global
    agg over group summaries — never a row-per-chunk sort or window.
    """
    per_key = chunks.groupBy(algo_col, key_col).agg(
        F.count(F.lit(1)).alias("occurrences"),
        F.sum("length").alias("bytes_all"),
        F.first("length").alias("bytes_one"),
    )
    return (
        per_key.groupBy(algo_col)
        .agg(
            F.sum("bytes_all").cast("long").alias("total_bytes"),
            F.sum("bytes_one").cast("long").alias("unique_bytes"),
            F.sum("occurrences").cast("long").alias("n_chunks"),
            F.count(F.lit(1)).cast("long").alias("n_unique"),
        )
        .select(
            F.col(algo_col).alias("algo"),
            "total_bytes",
            "unique_bytes",
            "n_chunks",
            "n_unique",
            F.round(F.col("unique_bytes") / F.col("total_bytes"), round_to).alias(
                "dedup_coeff"
            ),
            F.round(F.col("total_bytes") / F.col("n_unique"), round_to).alias(
                "avg_chunk"
            ),
            F.round(F.col("unique_bytes") / F.col("n_unique"), round_to).alias(
                "avg_chunk_unique"
            ),
        )
    )


def dedup_stats_by(
    chunks: DataFrame,
    group_cols: list[str],
    key_col: str = "chunk_text",
    round_to: int = 6,
) -> DataFrame:
    """Dedup metrics per arbitrary grouping (e.g. per source, per lang).

    Note: a chunk duplicated *across* groups counts as unique in each —
    per-group dedup scope, matching how the reference scopes its HashSet
    to one run.
    """
    per_key = chunks.groupBy(*group_cols, key_col).agg(
        F.count(F.lit(1)).alias("occurrences"),
        F.sum("length").alias("bytes_all"),
        F.first("length").alias("bytes_one"),
    )
    return (
        per_key.groupBy(*group_cols)
        .agg(
            F.sum("bytes_all").cast("long").alias("total_bytes"),
            F.sum("bytes_one").cast("long").alias("unique_bytes"),
            F.sum("occurrences").cast("long").alias("n_chunks"),
            F.count(F.lit(1)).cast("long").alias("n_unique"),
        )
        .withColumn(
            "dedup_coeff",
            F.round(F.col("unique_bytes") / F.col("total_bytes"), round_to),
        )
        .withColumn(
            "avg_chunk", F.round(F.col("total_bytes") / F.col("n_unique"), round_to)
        )
    )


def chunk_size_histogram(
    chunks: DataFrame,
    bucket_width: int = 16,
    algo_col: str = "algo",
) -> DataFrame:
    """Chunk-size distribution: fixed-width buckets of ``length``.

    The paper-level diagnostic for CDC tuning (normalized chunking
    exists precisely to narrow this distribution, fastcdc.rs:23-48).
    One partial-aggregating shuffle on (algo, bucket); bucket bounds are
    ``[bucket_lo, bucket_lo + bucket_width)``.
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    bucket_lo = (F.floor(F.col("length") / bucket_width) * bucket_width).cast("long")
    return (
        chunks.groupBy(F.col(algo_col).alias("algo"), bucket_lo.alias("bucket_lo"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum("length").cast("long").alias("bytes"),
        )
    )


def approx_dedup_stats(
    chunks: DataFrame,
    key_col: str = "chunk_text",
    algo_col: str = "algo",
    rsd: float = 0.01,
) -> DataFrame:
    """Cheap estimate path for 100 TB: HyperLogLog++ distinct-chunk count
    (``approx_count_distinct``) — single pass, no per-key shuffle state.

    ``unique_bytes`` is estimated as ``n_unique_est * avg(length)``; exact
    unique-byte accounting needs the per-key pass in :func:`dedup_stats`.
    """
    return (
        chunks.groupBy(algo_col)
        .agg(
            F.sum("length").cast("long").alias("total_bytes"),
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.approx_count_distinct(key_col, rsd).alias("n_unique_est"),
            F.avg("length").alias("avg_len"),
        )
        .select(
            F.col(algo_col).alias("algo"),
            "total_bytes",
            "n_chunks",
            "n_unique_est",
            F.round(
                F.col("n_unique_est") * F.col("avg_len") / F.col("total_bytes"), 6
            ).alias("dedup_coeff_est"),
        )
    )


def reconstruct_docs(
    recipes: DataFrame,
    store: DataFrame,
    id_col: str = "src_id",
    hash_col: str = "hash",
    text_col: str = "chunk_text",
) -> DataFrame:
    """The dedup READ path: rebuild each source from its chunk-hash
    recipe plus the content-addressed store — the inverse of chunk →
    hash → dropDuplicates, proving the store losslessly round-trips
    (what a delta-sync consumer does after `sync_plan` ships only novel
    chunks).

    ``recipes``: (id, chunk_idx, hash) — per-source hash sequence, the
    only per-source state a dedup system persists. ``store``:
    (hash, chunk_text) — one row per unique chunk.

    Shuffle profile at scale: one join keyed on the hash (store side is
    unique-chunk-sized — broadcast when it fits, shuffle otherwise) and
    one grouping by source; assembly is array_sort + array_join inside
    codegen, no Python, no window, no per-row UDF.

    The join is LEFT so an incomplete store cannot silently truncate a
    document: recipe entries whose hash is absent from the store are
    counted in ``n_missing`` (and still counted in ``n_chunks``), so
    ``n_missing > 0`` is the loud corruption signal — an inner join
    would just drop the chunks and make the short ``restored_text``
    look consistent with its own ``n_chunks``.
    """
    joined = recipes.join(store, hash_col, "left")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.col(text_col).isNull().cast("long")).cast("long").alias(
            "n_missing"
        ),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", F.col(text_col)))
                ),
                lambda s: s[text_col],
            ),
            "",
        ).alias("restored_text"),
    )


def store_refcounts(
    store: DataFrame,
    recipes: DataFrame,
    key_col: str = "hash",
    length_col: str = "length",
) -> DataFrame:
    """Per-chunk reference accounting for a content-addressed store:
    ``(key, bytes, refcount)`` with ``refcount = 0`` for orphans — store
    entries no live recipe references (left behind after their last
    referencing snapshot was dropped). The maintenance read every chunk
    store needs before reclaiming space.

    ``store``: one row per unique chunk identity with its byte size.
    ``recipes``: live references, one row per (source, position, key).

    Scale shape: refcounts are a key-grouped aggregate of the recipe
    table (map-side combine absorbs hot chunks — a zero block referenced
    by millions of recipes arrives at the shuffle as one partial row per
    map task), then ONE left join keyed on the chunk identity; both
    sides are unique-chunk-sized. No window, no Python.
    """
    refs = recipes.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("refcount")
    )
    return store.join(refs, key_col, "left").select(
        key_col,
        F.col(length_col).cast("long").alias("bytes"),
        F.coalesce("refcount", F.lit(0)).cast("long").alias("refcount"),
    )


def store_gc_plan(
    store: DataFrame,
    recipes: DataFrame,
    key_col: str = "hash",
    length_col: str = "length",
) -> DataFrame:
    """One-row garbage-collection plan for a content-addressed chunk
    store: how much of it is still referenced by live recipes and how
    many bytes a GC pass reclaims.

    Output: ``(n_store, store_bytes, n_live, live_bytes, n_orphan,
    orphan_bytes, reclaim_ratio)`` where reclaim_ratio =
    orphan_bytes / store_bytes (0 for an empty store).

    Use ``key_col="chunk_text"`` for small/oracle-checkable runs and the
    8-byte ``xxhash64`` identity at scale (same identity model as
    sync_plan / the persistent sinks, ae.rs:75-84 collision stance).
    """
    rc = store_refcounts(store, recipes, key_col, length_col)
    live = F.col("refcount") > 0
    return rc.agg(
        F.count(F.lit(1)).cast("long").alias("n_store"),
        F.coalesce(F.sum("bytes"), F.lit(0)).cast("long").alias("store_bytes"),
        F.coalesce(F.sum(live.cast("long")), F.lit(0)).cast("long").alias("n_live"),
        F.coalesce(F.sum(F.when(live, F.col("bytes"))), F.lit(0))
        .cast("long")
        .alias("live_bytes"),
        F.coalesce(F.sum((~live).cast("long")), F.lit(0))
        .cast("long")
        .alias("n_orphan"),
        F.coalesce(F.sum(F.when(~live, F.col("bytes"))), F.lit(0))
        .cast("long")
        .alias("orphan_bytes"),
        F.round(
            F.coalesce(F.sum(F.when(~live, F.col("bytes"))), F.lit(0))
            / F.greatest(F.sum("bytes"), F.lit(1)),
            6,
        ).alias("reclaim_ratio"),
    )


def duplicated_spans(
    chunks: DataFrame,
    min_chunks: int = 2,
    id_col: str = "src_id",
    key_col: str = "chunk_text",
) -> DataFrame:
    """Maximal runs of consecutive corpus-duplicated chunks per source:
    ``(src_id, span_start, span_bytes, n_chunks)`` — the chunk-granular
    form of substring-level training-data dedup (find long stretches a
    document shares with the rest of the corpus — licenses, templated
    sections, wholesale copies — and strip just those, keeping the
    unique remainder).

    Plan: a chunk-key AGGREGATE (count + min/max source — partial,
    map-side) joined back marks chunks whose key occurs under a
    different source (no self-matches); then a gaps-and-islands window
    per source (chunk_idx minus a running dup-rank is constant within a
    run) folds runs into span rows. Nothing pairwise is ever
    materialized — cost stays O(chunks), not O(doc pairs).

    The marking is deliberately aggregate+join rather than a
    chunk-key window: a hot boilerplate chunk (millions of occurrences
    at corpus scale) would pin a window's whole partition on one task,
    while the aggregate combines map-side and AQE can split the skewed
    probe side of the join.
    """
    key_stats = chunks.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("__occ"),
        F.min(id_col).alias("__src_min"),
        F.max(id_col).alias("__src_max"),
    )
    marked = chunks.join(key_stats, key_col).withColumn(
        "__dup",
        (F.col("__occ") > 1)
        & (
            (F.col("__src_min") != F.col(id_col))
            | (F.col("__src_max") != F.col(id_col))
        ),
    )
    w_doc = Window.partitionBy(id_col).orderBy("chunk_idx")
    islands = (
        marked.where("__dup")
        .withColumn("__grp", F.col("chunk_idx") - F.row_number().over(w_doc))
    )
    return (
        islands.groupBy(id_col, "__grp")
        .agg(
            F.min("offset").cast("long").alias("span_start"),
            F.sum("length").cast("long").alias("span_bytes"),
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
        )
        .where(F.col("n_chunks") >= min_chunks)
        .select(id_col, "span_start", "span_bytes", "n_chunks")
    )
