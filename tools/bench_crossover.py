#!/usr/bin/env python
"""Empirical crossover benchmark for the r03 plan restructures.

Three queries were deliberately restructured for scale in round 3 and
re-pinned slower-or-equal at sf0.1 (bench.py BASELINE_SF01 comments):

* ``sync_plan`` — first-occurrence per chunk identity moved from a
  ``row_number`` window PARTITIONED BY chunk content to a
  ``min(struct(src_id, offset))`` hash aggregate + join-back
  (operators/diff.py:149).
* ``stratified_sample_docs`` — per-language rank moved from a
  whole-language ``row_number`` partition to the bounded two-phase
  prefix sum (operators/prefix.py::bounded_running_sum).
* ``tfidf_top_terms`` — the raw exploded token stream (consumed twice:
  TF and DF) was replaced by one persisted deduped
  ``(doc_id, lang, term, tf)`` frame feeding both aggregates.

At sf0.1 the old shapes are equal or faster — the fixture corpus has no
hot keys and every window partition fits one task. This script builds
ADVERSARIAL-BUT-REALISTIC synthetic inputs (a hot duplicate chunk, a
dominant language, a Zipf-headed vocabulary) at sizes where the old
shapes' single-task partitions actually bind, and times old vs new in
the same session. Results go into SCALING.md §"Crossover evidence".

Usage::

    python tools/bench_crossover.py             # default ~4M-row scale
    python tools/bench_crossover.py --rows 1000000

Old variants are restated inline from git history (commits a6b1728 and
c5a8e8c) — they are the measured baselines, not live code paths.
"""

from __future__ import annotations

import argparse
import math
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import DataFrame, SparkSession, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _time(df_fn, runs: int = 2) -> tuple[float, float]:
    """(first-run, median) seconds, forcing FULL evaluation through the
    noop sink. ``count()`` is NOT a valid forcing action here: Catalyst
    prunes columns the count doesn't need, which deletes e.g. the old
    sync_plan's entire window (its rank only feeds aggregate VALUES) —
    an early version of this harness reported the old plan 17x faster
    than its real cold time because of exactly that. First run pays
    every exchange cold; later runs may reuse shuffle outputs (stage
    skipping), the steady state of a repeatedly-issued plan."""
    out = []
    for _ in range(runs):
        t = time.time()
        df_fn().write.format("noop").mode("overwrite").save()
        out.append(time.time() - t)
    return out[0], statistics.median(out)


# --- sync_plan: hot duplicate chunk ----------------------------------------


def _hot_chunks(spark: SparkSession, n: int, hot_pct: int = 30) -> DataFrame:
    """n chunk rows of ~1 KiB INCOMPRESSIBLE payload (32 chained md5 hex
    segments — real chunk content does not compress away in shuffle, and
    a compressible synthetic hides the window plan's payload-shuffle
    cost entirely); hot_pct% share ONE identity (a zero block / common
    header — the shape that pins a content-keyed window on one task)."""
    seg = [F.md5(F.concat((F.col("id") * 37 + j).cast("string"))) for j in range(32)]
    hot = F.concat_ws("", *[F.md5(F.lit(f"hot{j}")) for j in range(32)])
    return spark.range(n).select(
        (F.col("id") % 64).cast("long").alias("src_id"),
        F.col("id").alias("offset"),
        F.when(F.col("id") % 100 < hot_pct, hot)
        .otherwise(F.concat_ws("", *seg))
        .alias("chunk_text"),
    ).withColumn("length", F.length("chunk_text").cast("long"))


def _sync_plan_old(old_chunks: DataFrame, new_chunks: DataFrame) -> DataFrame:
    """Pre-a6b1728 shape: content-keyed row_number window + store join."""
    store = old_chunks.select("chunk_text").distinct().withColumn(
        "in_store", F.lit(True)
    )
    w = Window.partitionBy("chunk_text").orderBy("src_id", "offset")
    classified = (
        new_chunks.withColumn("rn", F.row_number().over(w))
        .join(store, "chunk_text", "left")
        .withColumn(
            "status",
            F.when(F.col("in_store").isNotNull(), "reused_old")
            .when(F.col("rn") == 1, "transfer")
            .otherwise("dedup_new"),
        )
    )
    zero = F.lit(0)
    return classified.groupBy("src_id").agg(
        F.sum("length").cast("long").alias("total_bytes"),
        F.coalesce(
            F.sum(F.when(F.col("status") == "reused_old", F.col("length"))), zero
        ).cast("long").alias("reused_old_bytes"),
        F.coalesce(
            F.sum(F.when(F.col("status") == "transfer", F.col("length"))), zero
        ).cast("long").alias("transfer_bytes"),
        F.coalesce(
            F.sum(F.when(F.col("status") == "dedup_new", F.col("length"))), zero
        ).cast("long").alias("dedup_new_bytes"),
    )


def _sync_inputs(spark: SparkSession, rows: int, hot_pct: int):
    new_chunks = _hot_chunks(spark, rows, hot_pct)
    old_chunks = new_chunks.where(F.col("offset") % 7 == 0).select("chunk_text")
    return old_chunks, new_chunks


def sync_old(spark: SparkSession, rows: int, hot_pct: int = 60) -> DataFrame:
    return _sync_plan_old(*_sync_inputs(spark, rows, hot_pct))


def sync_new(spark: SparkSession, rows: int, hot_pct: int = 60) -> DataFrame:
    from cdc_algorithms_spark.operators.diff import sync_plan

    return sync_plan(*_sync_inputs(spark, rows, hot_pct))


# --- stratified sample: dominant language ----------------------------------


def _lang_docs(spark: SparkSession, n: int) -> DataFrame:
    """n docs; 90% in one language — the whole-language window partition
    is a single 0.9·n-row task in the old shape."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, F.lit("en"))
        .otherwise(F.concat(F.lit("l"), (F.col("id") % 7).cast("string")))
        .alias("lang"),
    )


_SAMPLE_FRAC = 0.1


def _stratified_old(docs: DataFrame) -> DataFrame:
    """Pre-c5a8e8c shape: whole-language row_number + count windows."""
    w = Window.partitionBy("lang").orderBy("doc_id")
    ranked = docs.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    )
    return ranked.where(
        F.col("rn") <= F.ceil(_SAMPLE_FRAC * F.col("n"))
    ).select("doc_id", "lang")


def _stratified_new(docs: DataFrame) -> DataFrame:
    """Current registered shape (queries_text.py::q_stratified_sample)."""
    from cdc_algorithms_spark.operators.prefix import bounded_running_sum

    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    ranked = bounded_running_sum(
        docs.withColumn("__one", F.lit(1)),
        ["lang"],
        "doc_id",
        "__one",
        bucket=4096,
        out_col="rn",
    )
    return (
        ranked.join(F.broadcast(counts), "lang")
        .where(F.col("rn") <= F.ceil(_SAMPLE_FRAC * F.col("n")))
        .select("doc_id", "lang")
    )


def stratified_old(spark: SparkSession, rows: int) -> DataFrame:
    return _stratified_old(_lang_docs(spark, rows))


def stratified_new(spark: SparkSession, rows: int) -> DataFrame:
    return _stratified_new(_lang_docs(spark, rows))


# --- tfidf: raw-token double consumption vs deduped persisted frame --------


def _synth_docs(spark: SparkSession, n: int, toks: int = 20) -> DataFrame:
    """n docs × toks tokens, Zipf-headed vocabulary: token j of doc i is
    vocabulary word ((i·31 + j·17) mod (j+1)·997) — low-j positions draw
    from small vocabularies, so a head of very frequent terms emerges."""
    parts = [
        F.concat(
            F.lit("w"),
            ((F.col("id") * 31 + j * 17) % ((j + 1) * 997)).cast("string"),
        )
        for j in range(toks)
    ]
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 9, F.lit("en"))
        .otherwise(F.concat(F.lit("l"), (F.col("id") % 7).cast("string")))
        .alias("lang"),
        F.concat_ws(" ", *parts).alias("text"),
    )


_TFIDF_K = 10


def _tfidf_rollup(tf: DataFrame, df: DataFrame, n_docs: int) -> DataFrame:
    scored = tf.join(df, "term").select(
        "lang",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("tfidf"), "term")
    return scored.select(
        "lang", F.row_number().over(w).alias("rank"), "term", "tfidf"
    ).where(F.col("rank") <= _TFIDF_K)


def _tfidf_old(docs: DataFrame, n_docs: int) -> DataFrame:
    """Pre-c5a8e8c shape: the raw exploded token stream is consumed
    TWICE — once for TF, once for DF's countDistinct — so the corpus
    explodes twice and the DF aggregate shuffles doc_id-level rows."""
    tokens = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower("text"), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    tf = tokens.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tokens.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    return _tfidf_rollup(tf, df, n_docs)


def _tfidf_new(docs: DataFrame, n_docs: int) -> DataFrame:
    """Current shape: one persisted deduped (doc_id, lang, term, tf0)
    frame feeds both aggregates; DF is a plain count over it."""
    per_doc = (
        docs.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy("doc_id", "lang", "term")
        .agg(F.count(F.lit(1)).alias("tf0"))
        .persist()
    )
    tf = per_doc.groupBy("lang", "term").agg(F.sum("tf0").alias("tf"))
    df = per_doc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    out = _tfidf_rollup(tf, df, n_docs)
    return out


def tfidf_old(spark: SparkSession, rows: int) -> DataFrame:
    return _tfidf_old(_synth_docs(spark, rows), rows)


def tfidf_new(spark: SparkSession, rows: int) -> DataFrame:
    return _tfidf_new(_synth_docs(spark, rows), rows)




# --- incremental near-dup: per-batch rebuild vs persisted-index probe -------


def _njd_docs(spark: SparkSession, n: int, offset: int = 0,
              words: int = 40, vocab: int = 50_000) -> DataFrame:
    """n synthetic docs of `words` pseudorandom vocab words (deterministic
    off doc_id). A sparse 50k vocabulary keeps prefix joins realistic;
    the first 10 batch docs verbatim-copy corpus docs so the exact
    verification path does real work."""
    word = lambda i: F.concat(
        F.lit("w"), F.pmod(F.xxhash64(F.col("doc_id"), F.lit(i)), F.lit(vocab))
    )
    return spark.range(n).select(
        (F.col("id") + offset).alias("doc_id")
    ).select(
        "doc_id",
        F.array_join(
            F.array(*[word(i) for i in range(words)]), " "
        ).alias("text"),
    )


def _njd_batch(spark: SparkSession) -> DataFrame:
    """500 new docs; the first 10 verbatim-copy corpus docs 0-9 (J=1
    pairs), so candidate generation AND exact verification both fire."""
    fresh = _njd_docs(spark, 490, offset=10_000_000)
    copies = _njd_docs(spark, 10).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
    )
    return fresh.unionByName(copies)


_NJD_INDEX_CACHE: dict = {}


def njd_rebuild(spark: SparkSession, corpus_n: int) -> DataFrame:
    """The r04-weak shape: every batch call re-aggregates shingle
    document frequencies over corpus UNION batch — per-batch cost grows
    with the corpus."""
    from cdc_algorithms_spark.operators.dedup_docs import (
        incremental_jaccard_pairs,
    )

    corpus = _njd_docs(spark, corpus_n)
    batch = _njd_batch(spark)
    return incremental_jaccard_pairs(corpus, batch, n=3, threshold=0.8)


def njd_indexed(spark: SparkSession, corpus_n: int) -> DataFrame:
    """The persisted-index shape: jaccard_prefix_index built ONCE per
    (session, corpus) — the cold run pays build+probe (the once-per-
    corpus cost), the median run is the steady-state batch probe."""
    from cdc_algorithms_spark.operators.dedup_docs import (
        incremental_jaccard_pairs_indexed,
        jaccard_prefix_index,
    )

    key = (spark.sparkContext.applicationId, corpus_n)
    index = _NJD_INDEX_CACHE.get(key)
    if index is None:
        _NJD_INDEX_CACHE.clear()
        index = jaccard_prefix_index(_njd_docs(spark, corpus_n), n=3,
                                     threshold=0.8)
        _NJD_INDEX_CACHE[key] = index
    return incremental_jaccard_pairs_indexed(index, _njd_batch(spark),
                                             n=3, threshold=0.8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=32_000_000,
                    help="sync_plan row count; stratified uses 2x, tfidf rows/4")
    ap.add_argument("--only", choices=["sync_plan", "stratified_sample",
                                       "tfidf_top_terms",
                                       "incremental_jaccard"], default=None,
                    help="run a single benchmark (fits CI time slots)")
    args = ap.parse_args()

    from cdc_algorithms_spark.session import get_spark

    # one SparkSession PER VARIANT: shared-session runs contaminate each
    # other (shuffle-file reuse and JVM/page-cache warmth made the old
    # sync_plan appear 150x faster than its true isolated cold time)
    plan = [
        ("sync_plan", "old", sync_old, args.rows),
        ("sync_plan", "new", sync_new, args.rows),
        ("stratified_sample", "old", stratified_old, args.rows * 2),
        ("stratified_sample", "new", stratified_new, args.rows * 2),
        ("tfidf_top_terms", "old", tfidf_old, args.rows // 4),
        ("tfidf_top_terms", "new", tfidf_new, args.rows // 4),
        # old = per-batch corpus re-aggregation; new = persisted-index
        # probe (new-cold includes the once-per-corpus index build,
        # new-med is the steady-state batch probe)
        ("incremental_jaccard", "old", njd_rebuild, args.rows // 400),
        ("incremental_jaccard", "new", njd_indexed, args.rows // 400),
    ]
    results: dict[str, dict] = {}
    if args.only:
        plan = [p for p in plan if p[0] == args.only]
    for bname, vname, fn, rows in plan:
        spark = get_spark("crossover-bench")
        spark.sparkContext.setLogLevel("ERROR")
        results.setdefault(bname, {})[vname] = _time(lambda: fn(spark, rows))
        spark.stop()
    print(
        f"\nsync_plan: {args.rows:,} x ~1KiB chunks (60% one hot identity); "
        f"stratified: {args.rows * 2:,} docs; "
        f"tfidf: {args.rows // 4:,} docs x 20 tokens; "
        f"incr-jaccard: {args.rows // 400:,}-doc corpus, 500-doc batch "
        f"(new-cold = index build + probe, new-med = steady-state probe)"
    )
    print(
        f"{'query':20} {'old cold':>9} {'old med':>9} {'new cold':>9}"
        f" {'new med':>9} {'speedup(med)':>13}"
    )
    for name, r in results.items():
        oc, om = r["old"]
        nc_, nm = r["new"]
        print(
            f"{name:20} {oc:9.2f} {om:9.2f} {nc_:9.2f} {nm:9.2f}"
            f" {om / nm:12.2f}x"
        )


if __name__ == "__main__":
    main()
