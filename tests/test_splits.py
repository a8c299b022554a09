"""Train/val/test split assignment + near-dup leakage (operators/splits.py).

Oracle comparisons at sf0.001/sf0.01 plus the structural invariants:
determinism, partitioning independence, map-only assignment plan, and
the cluster-safe zero-leakage guarantee.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cdc_algorithms_spark import plans as P
from cdc_algorithms_spark.operators.splits import (
    DEFAULT_FRACTIONS,
    cluster_safe_split_assignment,
    split_assignment,
    split_leakage,
    split_thresholds,
)
from cdc_algorithms_spark.queries import SPARK_QUERIES
from cdc_algorithms_spark.sources.registry import load_table

from tests.conftest import SF_DIR
from tests.oracle import compare_with_oracle


@pytest.mark.parametrize(
    "name",
    ["split_assignment_summary", "split_leakage_pairs", "cluster_safe_split_check"],
)
def test_split_queries_match_oracle(spark, name, sf_dir):
    compare_with_oracle(spark, name, sf_dir)


def test_split_thresholds_validation():
    with pytest.raises(ValueError):
        split_thresholds([])
    with pytest.raises(ValueError):
        split_thresholds([("train", 0.5), ("test", 0.4)])  # sums to 0.9
    with pytest.raises(ValueError):
        split_thresholds([("train", -0.1), ("test", 1.1)])
    bounds = split_thresholds(DEFAULT_FRACTIONS)
    assert bounds[-1][1] == 1 << 31  # last bound forced to ring size


def test_split_assignment_total_and_deterministic(spark):
    docs = load_table(spark, "documents", SF_DIR)
    a1 = split_assignment(docs, seed=3).select("doc_id", "split")
    # every doc gets exactly one split, independent of partitioning
    a2 = split_assignment(docs.repartition(13), seed=3).select("doc_id", "split")
    assert a1.count() == docs.count()
    assert a1.exceptAll(a2).count() == 0 and a2.exceptAll(a1).count() == 0
    names = {r["split"] for r in a1.select("split").distinct().collect()}
    assert names <= {"train", "val", "test"}
    # different seed → different carve (same census sizes would be a
    # coincidence; assignment itself must move)
    a3 = split_assignment(docs, seed=4).select("doc_id", "split")
    assert a1.exceptAll(a3).count() > 0


def test_split_assignment_proportions(spark):
    docs = load_table(spark, "documents", SF_DIR)
    n = docs.count()
    counts = {
        r["split"]: r["n"]
        for r in split_assignment(docs, seed=0)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # hash thresholding: exact in expectation; allow generous slack at
    # this corpus size (binomial ±4σ)
    for name, frac in DEFAULT_FRACTIONS:
        got = counts.get(name, 0)
        sigma = (n * frac * (1 - frac)) ** 0.5
        assert abs(got - n * frac) <= 4 * sigma + 1, (name, got, n * frac)


def test_split_assignment_plan_is_map_only(spark):
    df = SPARK_QUERIES["split_assignment_summary"](spark, SF_DIR)
    # one partial-agg shuffle for the summary; the assignment itself
    # adds NO exchange and NO python stage
    assert P.exchange_count(df) == 1
    assert P.python_eval_count(df) == 0
    raw = split_assignment(load_table(spark, "documents", SF_DIR), seed=0)
    assert P.exchange_count(raw) == 0
    assert P.python_eval_count(raw) == 0


def test_split_leakage_reuses_cached_assignment_slice(spark):
    """Both broadcast sides of the leakage join must read the PERSISTED
    pair-touched assignment slice (InMemoryTableScan), not re-execute
    its lineage — an unpersisted slice scans the corpus once per side."""
    docs = load_table(spark, "documents", SF_DIR)
    pairs = spark.createDataFrame(
        [(0, 1, 1.0)], "id_a long, id_b long, jaccard double"
    )
    out = split_leakage(split_assignment(docs, seed=11), pairs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2


def test_cluster_safe_assignment_never_leaks(spark):
    docs = load_table(spark, "documents", SF_DIR)
    # synthetic pair graph: chain 0-1-2 plus island 7-8 forces
    # multi-doc components across whatever splits the LCG would pick
    pairs = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (7, 8, 1.0)],
        "id_a long, id_b long, jaccard double",
    )
    assignment = cluster_safe_split_assignment(docs, pairs, seed=5)
    assert split_leakage(assignment, pairs).count() == 0
    # co-component docs share a split
    splits = {
        r["doc_id"]: r["split"]
        for r in assignment.where(F.col("doc_id").isin(0, 1, 2, 7, 8))
        .select("doc_id", "split")
        .collect()
    }
    assert splits[0] == splits[1] == splits[2]
    assert splits[7] == splits[8]
    # docs outside the pair graph still got assigned
    assert assignment.where(F.col("split").isNull()).count() == 0
    assert assignment.count() == docs.count()


def test_split_assignment_stable_under_corpus_growth(spark):
    """A doc's split depends only on its own id: carving a grown corpus
    must reproduce every pre-existing doc's split exactly (the property
    that lets a production corpus extend without re-carving). The
    cluster-safe variant deliberately trades this for zero leakage —
    see its docstring."""
    docs = load_table(spark, "documents", SF_DIR)
    half = docs.where(F.col("doc_id") % 2 == 0)
    a_half = {
        r["doc_id"]: r["split"]
        for r in split_assignment(half, seed=9).select("doc_id", "split").collect()
    }
    a_full = {
        r["doc_id"]: r["split"]
        for r in split_assignment(docs, seed=9).select("doc_id", "split").collect()
    }
    assert all(a_full[k] == v for k, v in a_half.items())


def test_split_leakage_restricted_to_pair_list(spark):
    docs = load_table(spark, "documents", SF_DIR)
    assignment = split_assignment(docs, seed=11)
    pairs = spark.createDataFrame(
        [(0, 1, 0.9)], "id_a long, id_b long, jaccard double"
    )
    out = split_leakage(assignment, pairs).collect()
    want = {
        r["doc_id"]: r["split"]
        for r in assignment.where(F.col("doc_id").isin(0, 1)).collect()
    }
    if want[0] == want[1]:
        assert out == []
    else:
        assert len(out) == 1 and out[0]["id_a"] == 0 and out[0]["id_b"] == 1


# --- property tests (pure functions, no Spark) ------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    @st.composite
    def _fraction_lists(draw):
        n = draw(st.integers(min_value=1, max_value=6))
        raw = draw(
            st.lists(
                st.floats(min_value=0.01, max_value=1.0),
                min_size=n,
                max_size=n,
            )
        )
        total = sum(raw)
        return [(f"s{i}", x / total) for i, x in enumerate(raw)]

    @given(_fraction_lists())
    @settings(max_examples=200, deadline=None)
    def test_thresholds_partition_the_ring(fractions):
        """Bounds are nonnegative-monotone and end exactly at 2^31, so
        every possible LCG key maps to exactly one split."""
        bounds = split_thresholds(fractions)
        uppers = [u for _, u in bounds]
        assert sorted(uppers) == uppers  # cumulative → monotone
        assert uppers[-1] == 1 << 31
        assert all(0 <= u <= 1 << 31 for u in uppers)
        # proportional sizing: each slice width within 1 of frac * M
        prev = 0
        for (name, frac), upper in zip(fractions, uppers):
            width = upper - prev
            if upper != 1 << 31:  # last bound absorbs float remainder
                assert abs(width - frac * (1 << 31)) <= 1.0 + 1e-6 * (1 << 31)
            prev = upper

    @given(st.integers(min_value=0, max_value=(1 << 31) - 1), _fraction_lists())
    @settings(max_examples=200, deadline=None)
    def test_every_key_maps_to_exactly_one_split(key, fractions):
        bounds = split_thresholds(fractions)
        hits = [name for name, upper in bounds if key < upper]
        assert hits, f"key {key} above every bound"
        # first-match semantics: the CASE picks hits[0]; uniqueness of
        # the mapping is exactly "bounds are cumulative"
        assert hits[0] == next(
            name for name, upper in bounds if key < upper
        )
