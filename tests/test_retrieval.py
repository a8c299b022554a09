"""Retrieval + selection operators: BM25 (batch and durable-index),
cross-doc duplicate fraction, DSIR weights.

The oracle queries are value-checked by the driver replica
(tools/driver_check.py); these tests pin the properties the oracle
can't see — indexed==batch identity, static bucket pruning, score
determinism under repartitioning, and planted-structure behavior.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_indexed,
    query_terms,
    write_text_index,
)
from cdc_algorithms_spark.operators.selection import (
    cross_doc_dup_fraction,
    dsir_importance_weights,
)
from cdc_algorithms_spark.plans import inspect as P
from tests.conftest import SF_DIR

QUERIES = [(1, "spark window agg"), (2, "customer stream query")]


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_bm25_batch_shape_and_ranking(spark):
    docs = _docs(spark)
    out = bm25_topk(docs, query_terms(spark, QUERIES), k=5).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 5
        # scores non-increasing with rank; doc_id tiebreak ascending
        for a, b in zip(rows, rows[1:]):
            assert (a["score"], -a["doc_id"]) >= (b["score"], -b["doc_id"])
        assert all(r["score"] > 0 for r in rows)


def test_bm25_deterministic_under_repartition(spark):
    """The quantized-sum contract: partition-order of summation must not
    move a single rank or score."""
    docs = _docs(spark)
    qt = query_terms(spark, QUERIES)
    a = sorted(bm25_topk(docs, qt, k=10).collect())
    b = sorted(bm25_topk(docs.repartition(17, "lang"), qt, k=10).collect())
    assert a == b


def test_bm25_indexed_equals_batch(spark, tmp_path):
    docs = _docs(spark)
    qt = query_terms(spark, QUERIES)
    write_text_index(docs, str(tmp_path), buckets=8)
    got = sorted(
        bm25_topk_indexed(spark, str(tmp_path), qt, k=10, buckets=8).collect()
    )
    expect = sorted(bm25_topk(docs, qt, k=10).collect())
    assert got == expect


def test_bm25_index_probe_prunes_buckets(spark, tmp_path):
    """100 TB contract: the probe's posting scan carries PartitionFilters
    on the bucket column and never re-scans the documents table."""
    docs = _docs(spark)
    qt = query_terms(spark, [(1, "spark")])
    write_text_index(docs, str(tmp_path), buckets=8)
    probe = bm25_topk_indexed(spark, str(tmp_path), qt, k=10, buckets=8)
    plan = P.physical_plan(probe)
    assert "PartitionFilters: [isnotnull(bucket" in plan, plan
    assert "PartitionFilters: []" not in plan
    assert "documents.parquet" not in plan


def test_cross_doc_dup_fraction_planted_clone(spark):
    """A verbatim clone scores dup_fraction == 1.0 on every n-gram; a
    doc made of unique nonsense tokens scores 0.0."""
    docs = _docs(spark).limit(20)
    base = docs.select("doc_id", "text")
    clone = base.limit(1).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    unique = spark.createDataFrame(
        [(2_000_000, " ".join(f"zq{i}x" for i in range(40)))],
        "doc_id long, text string",
    )
    frame = base.unionByName(clone).unionByName(unique)
    out = {r["doc_id"]: r for r in cross_doc_dup_fraction(frame, n=8).collect()}
    cloned_src = base.limit(1).collect()[0]["doc_id"]
    assert out[cloned_src + 1_000_000]["dup_fraction"] == 1.0
    assert out[cloned_src]["dup_fraction"] == 1.0
    assert out[2_000_000]["dup_fraction"] == 0.0
    # accounting: n_dup <= n_ngrams everywhere
    assert all(
        r["n_dup_ngrams"] <= r["n_ngrams"] for r in out.values()
    )


def test_dsir_weights_prefer_target_like_docs(spark):
    """Weights are a log-likelihood ratio toward the target slice: the
    mean weight of target-language docs must exceed the mean weight of
    the rest (the fixture languages have distinct marker tokens)."""
    docs = _docs(spark)
    out = dsir_importance_weights(docs, F.col("lang") == "en")
    stats = (
        out.join(docs.select("doc_id"), "doc_id")
        .groupBy(F.col("lang") == "en")
        .agg(F.avg("weight").alias("w"))
        .collect()
    )
    by_tgt = {r[0]: r["w"] for r in stats}
    assert by_tgt[True] > by_tgt[False]


def test_dsir_deterministic_under_repartition(spark):
    docs = _docs(spark)
    a = sorted(dsir_importance_weights(docs, F.col("lang") == "en").collect())
    b = sorted(
        dsir_importance_weights(
            docs.repartition(13, "source"), F.col("lang") == "en"
        ).collect()
    )
    assert a == b
