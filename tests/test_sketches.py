"""Mergeable HLL sketch dedup estimation (operators/sketches.py).

DuckDB can't reproduce DataSketches registers, so the driver check for
`dedup_sketch_report_fixed` is rows-only; these tests pin what the
oracle can't: estimate accuracy vs exact distinct counts, determinism
under repartitioning, and that the global row really is the union of the
per-group sketches (the incremental contract).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.chunking import fixed_chunks
from cdc_algorithms_spark.operators.sketches import (
    chunk_sketches,
    sketch_dedup_report,
    sketch_rollup,
)
from cdc_algorithms_spark.sources.registry import load_table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def chunks(spark):
    docs = load_table(spark, "documents", SF_DIR)
    return (
        fixed_chunks(docs, 64)
        .join(docs.select(F.col("doc_id").alias("src_id"), "lang"), "src_id")
        .persist()
    )


def test_estimates_within_tolerance(spark, chunks):
    exact = {
        r["lang"]: r["exact"]
        for r in chunks.groupBy("lang")
        .agg(F.countDistinct("chunk_text").alias("exact"))
        .collect()
    }
    exact["*"] = chunks.select("chunk_text").distinct().count()
    report = sketch_dedup_report(chunks, group_cols=("lang",)).collect()
    assert {r["group"] for r in report} == set(exact)
    for r in report:
        rel_err = abs(r["est_unique_chunks"] - exact[r["group"]]) / exact[r["group"]]
        assert rel_err < 0.02, (r["group"], r["est_unique_chunks"], exact[r["group"]])


def test_stable_under_repartition(spark, chunks):
    """Register merge is order-free but the DataSketches estimator mixes
    HIP (order-sensitive tail) and composite modes, so estimates on a
    repartitioned input agree to <0.1%, not bit-for-bit."""
    a = {
        r["group"]: r
        for r in sketch_dedup_report(chunks, group_cols=("lang",)).collect()
    }
    b = {
        r["group"]: r
        for r in sketch_dedup_report(
            chunks.repartition(7, "chunk_idx"), group_cols=("lang",)
        ).collect()
    }
    assert set(a) == set(b)
    for g in a:
        assert a[g]["n_chunks"] == b[g]["n_chunks"]
        assert a[g]["total_bytes"] == b[g]["total_bytes"]
        ea, eb = a[g]["est_unique_chunks"], b[g]["est_unique_chunks"]
        assert abs(ea - eb) / max(ea, 1) < 0.001, (g, ea, eb)


def test_rollup_equals_direct_global_sketch(spark, chunks):
    """Union-of-group-sketches must equal sketching the whole input once —
    the property that makes persisted sketches answer future queries."""
    per_lang = chunk_sketches(chunks, group_cols=("lang",))
    via_rollup = sketch_rollup(per_lang).collect()[0]
    direct = chunk_sketches(chunks.withColumn("g", F.lit(1)), group_cols=("g",)).collect()[0]
    ea, eb = via_rollup["est_unique_chunks"], direct["est_unique_chunks"]
    # union path reports the composite estimate, one-pass the HIP one —
    # they agree to within sketch error (~2x the 0.8% RSE at lg_k=14)
    assert abs(ea - eb) / max(eb, 1) < 0.02, (ea, eb)
    assert via_rollup["n_chunks"] == direct["n_chunks"]
    assert via_rollup["total_bytes"] == direct["total_bytes"]


def test_incremental_delta_union(spark, chunks):
    """Sketch old corpus once; a new batch only sketches its own delta and
    unions against the stored sketch — estimate matches full re-sketch."""
    old = chunks.where(F.col("src_id") % 2 == 0)
    new = chunks.where(F.col("src_id") % 2 == 1)
    old_s = chunk_sketches(old.withColumn("g", F.lit("all")), group_cols=("g",))
    new_s = chunk_sketches(new.withColumn("g", F.lit("all")), group_cols=("g",))
    merged = sketch_rollup(old_s.unionByName(new_s), rollup_cols=("g",)).collect()[0]
    full = chunk_sketches(
        chunks.withColumn("g", F.lit("all")), group_cols=("g",)
    ).collect()[0]
    ea, eb = merged["est_unique_chunks"], full["est_unique_chunks"]
    assert abs(ea - eb) / max(eb, 1) < 0.02, (ea, eb)
