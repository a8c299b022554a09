"""Round-trip tests for the chunk sinks (SURVEY.md §2.1 S4)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.chunking import fixed_chunks
from cdc_algorithms_spark.sources.registry import load_table
from cdc_algorithms_spark.sources.sinks import (
    read_chunk_store,
    write_chunk_store,
    write_chunk_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_chunk_table_roundtrip(spark, tmp_path):
    chunks = fixed_chunks(load_table(spark, "documents", SF_DIR), 64)
    out = str(tmp_path / "chunk_table")
    write_chunk_table(chunks, out)
    back = spark.read.parquet(out)
    assert back.count() == chunks.count()
    # algo became a partition directory, values survive the round trip
    assert os.path.isdir(os.path.join(out, "algo=fixed64"))
    a = chunks.agg(F.sum("length"), F.count(F.lit(1))).collect()[0]
    b = back.agg(F.sum("length"), F.count(F.lit(1))).collect()[0]
    assert tuple(a) == tuple(b)


def test_chunk_store_dedups_and_prunes(spark, tmp_path):
    chunks = fixed_chunks(load_table(spark, "documents", SF_DIR), 64).withColumn(
        "hash", F.xxhash64("chunk_text")
    )
    out = str(tmp_path / "chunk_store")
    write_chunk_store(chunks, out)
    store = read_chunk_store(spark, out)
    n_unique = chunks.select("hash").distinct().count()
    assert store.count() == n_unique
    assert store.select("hash").distinct().count() == n_unique
    # hash-prefix layout: partition dirs exist and a prefix-filtered scan
    # returns exactly that prefix's rows
    some = store.select("hash_prefix").first()["hash_prefix"]
    assert os.path.isdir(os.path.join(out, f"hash_prefix={some}"))
    pruned = store.where(F.col("hash_prefix") == some)
    assert pruned.count() == store.where(
        F.lower(F.lpad(F.hex(F.col("hash")), 16, "0").substr(1, 2)) == some
    ).count()


def test_bucketed_tables_join_and_agg_without_shuffle(spark, tmp_path):
    """Co-located joins: same key, same bucket count -> scans come back
    HashPartitioning(hash, n), so neither the join nor a groupBy on the
    bucket column needs an Exchange."""
    from cdc_algorithms_spark.plans.inspect import exchange_count
    from cdc_algorithms_spark.sources.sinks import write_bucketed

    docs = load_table(spark, "documents", SF_DIR)
    chunks = fixed_chunks(docs, 64).withColumn("hash", F.xxhash64("chunk_text"))
    perturbed = fixed_chunks(
        docs.withColumn("text", F.concat(F.col("text"), F.lit(" tail"))), 64
    ).withColumn("hash", F.xxhash64("chunk_text"))

    write_bucketed(chunks, "t_bucket_a", str(tmp_path / "a"), 8)
    write_bucketed(perturbed, "t_bucket_b", str(tmp_path / "b"), 8)
    a = spark.table("t_bucket_a")
    b = spark.table("t_bucket_b")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "hash").select(a["src_id"], b["src_id"], "hash")
        assert exchange_count(joined) == 0
        agg = a.groupBy("hash").agg(F.count(F.lit(1)).alias("n"))
        assert exchange_count(agg) == 0
        # and the co-located join is still correct
        expect = (
            chunks.select("hash").join(perturbed.select("hash"), "hash").count()
        )
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_partitioned_sink_enables_dynamic_partition_pruning(spark, tmp_path):
    """The 100 TB payoff of a partitioned chunk/event layout: a join
    against a filtered dimension prunes fact partitions at RUNTIME
    (dynamic partition pruning — the filter value is only known after
    the dim side runs), so the scan never touches excluded directories.
    Asserted on the plan: the parquet scan's partition filters carry a
    dynamicpruning subquery."""
    ev = load_table(spark, "events", SF_DIR)
    path = str(tmp_path / "events_by_type")
    ev.repartition("event_type").write.partitionBy("event_type").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("purchase", 1), ("view", 0), ("click", 0), ("error", 0)],
        ["event_type", "keep"],
    ).where(F.col("keep") == 1)
    joined = fact.join(dim, "event_type").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    rows = joined.collect()
    assert [r["event_type"] for r in rows] == ["purchase"]
    exact = ev.where(F.col("event_type") == "purchase").count()
    assert rows[0]["n"] == exact


def test_bucketed_index_makes_ingest_join_index_side_shuffle_free(spark, tmp_path):
    """The recurring 100 TB ingest join: a chunk index persisted
    bucketed on hash joins each arriving batch with NO exchange on the
    index side (only the batch shuffles into the index's bucketing),
    and the accounting equals the unbucketed path."""
    from cdc_algorithms_spark.operators.ingest import chunk_index, ingest_stats
    from cdc_algorithms_spark.plans.inspect import exchange_count
    from cdc_algorithms_spark.sources.sinks import write_bucketed

    docs = load_table(spark, "documents", SF_DIR)
    chunks = fixed_chunks(docs, 64).withColumn("hash", F.xxhash64("chunk_text"))
    old = chunks.where(F.col("src_id") % 3 != 0)
    batch = chunks.where(F.col("src_id") % 3 == 0)

    write_bucketed(chunk_index(old), "t_ingest_idx", str(tmp_path / "idx"), 8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        idx = spark.table("t_ingest_idx")
        stats = ingest_stats(idx, batch)
        # plain path: batch agg shuffle + join exchanges on BOTH sides +
        # the final single-row agg; bucketed index removes its side.
        plain = ingest_stats(chunk_index(old), batch)
        assert exchange_count(stats) < exchange_count(plain)
        assert stats.collect() == plain.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_ingest_idx")


def test_append_novel_chunks_never_duplicates_identities(spark, tmp_path):
    """Incremental store extension: overlapping batches must add only
    never-seen hashes (one row per identity stays invariant), and the
    first call on an empty path degrades to a plain store write."""
    from cdc_algorithms_spark.sources.sinks import append_novel_chunks

    docs = load_table(spark, "documents", SF_DIR)
    c1 = fixed_chunks(docs.where(F.col("doc_id") % 2 == 0), 64).withColumn(
        "hash", F.xxhash64("chunk_text")
    )
    c_all = fixed_chunks(docs, 64).withColumn("hash", F.xxhash64("chunk_text"))
    path = str(tmp_path / "store")

    append_novel_chunks(spark, c1, path)  # seed via first-call fallback
    n1 = spark.read.parquet(path).count()
    assert n1 == c1.select("hash").distinct().count()

    append_novel_chunks(spark, c_all, path)  # overlaps c1 heavily
    store = spark.read.parquet(path)
    want = c_all.select("hash").distinct().count()
    assert store.count() == want, "append duplicated or dropped identities"
    assert store.select("hash").distinct().count() == want

    append_novel_chunks(spark, c1, path)  # pure replay: a no-op
    assert spark.read.parquet(path).count() == want
