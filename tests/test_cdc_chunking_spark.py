"""Spark-level tests for the CDC chunk operator (mapInPandas path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_algorithms_spark.chunkers import ae_cuts, fastcdc_cuts, rabin_cuts
from cdc_algorithms_spark.chunkers.params import make_params
from cdc_algorithms_spark.operators.chunking import cdc_chunks
from cdc_algorithms_spark.queries import CDC_CONFIGS
from cdc_algorithms_spark.sources.registry import load_table
from tests.oracle import compare_with_oracle

ALGOS = list(CDC_CONFIGS)


@pytest.mark.parametrize("name", ALGOS)
def test_concat_property(spark, sf_dir, name):
    docs = load_table(spark, "documents", sf_dir)
    chunks = cdc_chunks(docs, **CDC_CONFIGS[name])
    bad = (
        chunks.groupBy("src_id")
        .agg(F.sum("length").alias("total"), F.count(F.lit(1)).alias("n"))
        .join(docs, F.col("src_id") == F.col("doc_id"))
        .where(F.col("total") != F.col("n_chars"))
    )
    assert bad.count() == 0


@pytest.mark.parametrize("name", ALGOS)
def test_chunk_text_consistent(spark, sf_dir, name):
    chunks = cdc_chunks(load_table(spark, "documents", sf_dir), **CDC_CONFIGS[name])
    assert chunks.where(F.length("chunk_text") != F.col("length")).count() == 0


@pytest.mark.parametrize("name", ALGOS)
def test_determinism_across_partitioning(spark, sf_dir, name):
    """Same cuts regardless of how input rows are partitioned (invariant 3)."""
    docs = load_table(spark, "documents", sf_dir)
    a = cdc_chunks(docs.repartition(1), **CDC_CONFIGS[name])
    b = cdc_chunks(docs.repartition(13), **CDC_CONFIGS[name])
    sig = lambda df: df.agg(
        F.expr("bit_xor(xxhash64(src_id, chunk_idx, offset, length))")
    ).collect()[0][0]
    assert sig(a) == sig(b)
    assert a.count() == b.count()


def test_spark_matches_local_cuts(spark, sf_dir):
    """The distributed operator reproduces the local algorithms exactly."""
    docs = load_table(spark, "documents", sf_dir).limit(50)
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    for name, conf in CDC_CONFIGS.items():
        params = make_params(
            conf["algo"], conf["expected_size"], conf.get("seed", 0),
            window_size=conf.get("window_size"),
        )
        fn = {"ae": ae_cuts, "rabin": rabin_cuts, "fastcdc": fastcdc_cuts}[conf["algo"]]
        got = (
            cdc_chunks(docs, **conf)
            .groupBy("src_id")
            .agg(F.sort_array(F.collect_list("offset")).alias("offs"))
            .collect()
        )
        for r in got:
            data = rows[r["src_id"]].encode()
            cuts = fn(data, params)
            expected_offsets = [0] + [c + 1 for c in cuts[:-1]]
            assert r["offs"] == expected_offsets, (name, r["src_id"])


@pytest.mark.parametrize("name", ALGOS)
def test_concat_check_oracle(spark, name):
    compare_with_oracle(spark, f"{name}_concat_check", "/root/testdata/sf0.001")


def test_all_algos_comparison_consistent(spark):
    """One row per algorithm; every branch accounts for the same corpus
    bytes (FIXTURES.md invariant 1 across algorithms at once)."""
    from cdc_algorithms_spark.queries import SPARK_QUERIES

    rows = SPARK_QUERIES["dedup_stats_all_algos"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 4
    assert len({r["algo"] for r in rows}) == 4
    assert len({r["total_bytes"] for r in rows}) == 1  # same corpus everywhere
    for r in rows:
        assert 0 < r["dedup_coeff"] <= 1.0
        assert r["n_unique"] <= r["n_chunks"]


def test_tiling_check_catches_cancelling_defects(spark):
    """The coverage-derivative tiling invariant must fail on defects
    whose byte totals AND overall span cancel — invisible to both the
    concat byte-sum check and a naive span==sum test — and pass on a
    perfect partition. (A span==sum formulation was tried first and
    this very test's cancelling case defeated it.)"""
    from cdc_algorithms_spark.queries import _tiling_check

    def check(rows):
        df = spark.createDataFrame(rows, "offset long, length long")
        r = _tiling_check(df, per_src=False).collect()[0]
        return (
            r.n_source_pos == 1
            and r.n_sink_pos == 1
            and r.n_bad_pos == 0
            and r.start_pos == 0
        ), r

    ok, r = check([(0, 10), (10, 5), (15, 10)])
    assert ok and r.end_pos == 25

    # 5-byte overlap + 5-byte gap: byte sum 25 == doc bytes (concat
    # passes), span 25 == sum (span test passes) — tiling fails
    ok, r = check([(0, 10), (5, 10), (20, 5)])
    assert not ok

    # duplicate chunk whose twin's absence cancels the byte sum
    ok, r = check([(0, 10), (0, 10), (20, 5)])
    assert not ok

    # simple gap and simple overlap also fail
    assert not check([(0, 10), (15, 10)])[0]
    assert not check([(0, 10), (5, 15)])[0]
