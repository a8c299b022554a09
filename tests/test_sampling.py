"""PPS systematic sampling (operators/sampling.py).

Oracle comparison plus the exact mathematical guarantees the module
docstring claims: total picks == k, per-row multiplicity within the
systematic-sampling inclusion bound, determinism / seed sensitivity,
and the guard rails.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.sampling import pps_systematic_sample
from cdc_algorithms_spark.sources.registry import load_table

from tests.conftest import SF_DIR, SF_DIR_MID
from tests.oracle import compare_with_oracle


@pytest.mark.parametrize("sf", [SF_DIR, SF_DIR_MID])
def test_pps_sample_docs_matches_oracle(spark, sf):
    compare_with_oracle(spark, "pps_sample_docs", sf)


def _docs(spark):
    return load_table(spark, "documents", SF_DIR)


@pytest.mark.parametrize("k", [1, 7, 100, 450])
def test_total_picks_exactly_k(spark, k):
    picked = pps_systematic_sample(_docs(spark), "n_chars", k, seed=3)
    assert picked.agg(F.sum("n_picks")).collect()[0][0] == k


def test_multiplicity_within_inclusion_bound(spark):
    """n_picks ∈ {floor(w*k/W), floor(w*k/W)+1} for every picked row,
    and every unpicked row has floor(w*k/W) == 0 — the systematic-PPS
    inclusion property (cnt(x) ∈ [x*k/W, x*k/W + 1))."""
    docs = _docs(spark)
    k = 120
    total_w = docs.agg(F.sum("n_chars")).collect()[0][0]
    picked = {
        r["id"]: r["n_picks"]
        for r in pps_systematic_sample(docs, "n_chars", k, seed=11).collect()
    }
    for row in docs.select("doc_id", "n_chars").collect():
        lo = (row["n_chars"] * k) // total_w
        got = picked.get(row["doc_id"], 0)
        assert got in (lo, lo + 1), (row["doc_id"], got, lo)


def test_heavy_rows_always_picked(spark):
    """Any row with w > W/k has floor(w*k/W) >= 1 ⇒ guaranteed picked."""
    docs = _docs(spark)
    k = 300
    total_w = docs.agg(F.sum("n_chars")).collect()[0][0]
    heavy = {
        r["doc_id"]
        for r in docs.where(
            F.col("n_chars") * k >= F.lit(int(total_w) + k)
        ).collect()
    }
    assert heavy, "fixture should have at least one heavy doc at k=300"
    picked = {
        r["id"]
        for r in pps_systematic_sample(docs, "n_chars", k, seed=5).collect()
    }
    assert heavy <= picked


def test_deterministic_and_seed_sensitive(spark):
    docs = _docs(spark)
    a = sorted(
        tuple(r)
        for r in pps_systematic_sample(docs, "n_chars", 50, seed=1).collect()
    )
    b = sorted(
        tuple(r)
        for r in pps_systematic_sample(docs, "n_chars", 50, seed=1).collect()
    )
    c = sorted(
        tuple(r)
        for r in pps_systematic_sample(docs, "n_chars", 50, seed=2).collect()
    )
    assert a == b
    assert {t[0] for t in a} != {t[0] for t in c}


def test_partitioning_independent(spark):
    docs = _docs(spark)
    base = sorted(
        tuple(r)
        for r in pps_systematic_sample(docs, "n_chars", 64, seed=9).collect()
    )
    re = sorted(
        tuple(r)
        for r in pps_systematic_sample(
            docs.repartition(7, "lang"), "n_chars", 64, seed=9
        ).collect()
    )
    assert base == re


def test_nonpositive_weights_never_picked(spark):
    docs = _docs(spark).withColumn(
        "w2",
        F.when(F.col("doc_id") % 3 == 0, F.lit(0)).otherwise(F.col("n_chars")),
    )
    picked = pps_systematic_sample(docs, "w2", 80, seed=4)
    assert picked.where(F.col("id") % 3 == 0).count() == 0
    assert picked.agg(F.sum("n_picks")).collect()[0][0] == 80


def test_empty_corpus_empty_sample(spark):
    docs = _docs(spark).where(F.lit(False))
    out = pps_systematic_sample(docs, "n_chars", 10)
    assert out.count() == 0
    assert out.columns == ["id", "w", "cum_before", "n_picks"]


def test_guards(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="k must be positive"):
        pps_systematic_sample(docs, "n_chars", 0)
    bad_ids = docs.withColumn("doc_id", F.col("doc_id") + F.lit(1 << 31))
    with pytest.raises(ValueError, match="ids must lie"):
        pps_systematic_sample(bad_ids, "n_chars", 5)
    huge = docs.withColumn("n_chars", F.col("n_chars") * F.lit(1 << 30))
    with pytest.raises(ValueError, match="rescale"):
        pps_systematic_sample(huge, "n_chars", 1 << 20)


def test_no_global_sort_in_plan(spark):
    """The draw must stay bounded-window shaped: no empty-partition
    row_number/rank window over the corpus (the prefix sum buckets by
    the order key's high bits; the threshold count is map-only)."""
    plan = pps_systematic_sample(
        _docs(spark), "n_chars", 32, seed=2
    )._jdf.queryExecution().executedPlan().toString()
    # the only windows allowed partition by the bucket column
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__bkt" in line or "__g_bkt" in line, line


# --- stratified (per-group) PPS ---------------------------------------------


def test_pps_by_lang_matches_oracle(spark):
    compare_with_oracle(spark, "pps_sample_docs_by_lang", SF_DIR)
    compare_with_oracle(spark, "pps_sample_docs_by_lang", SF_DIR_MID)


def test_group_quota_exact_per_group(spark):
    from cdc_algorithms_spark.operators.sampling import (
        pps_systematic_sample_by_group,
    )

    docs = _docs(spark)
    k = 25
    picked = pps_systematic_sample_by_group(docs, "lang", "n_chars", k, seed=3)
    per_group = {
        r["group"]: r["s"]
        for r in picked.groupBy("group")
        .agg(F.sum("n_picks").alias("s"))
        .collect()
    }
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert set(per_group) == langs
    assert all(v == k for v in per_group.values())


def test_group_multiplicity_within_inclusion_bound(spark):
    from cdc_algorithms_spark.operators.sampling import (
        pps_systematic_sample_by_group,
    )

    docs = _docs(spark)
    k = 40
    totals = {
        r["lang"]: r["W"]
        for r in docs.groupBy("lang").agg(F.sum("n_chars").alias("W")).collect()
    }
    picked = {
        (r["group"], r["id"]): r["n_picks"]
        for r in pps_systematic_sample_by_group(
            docs, "lang", "n_chars", k, seed=5
        ).collect()
    }
    for row in docs.select("lang", "doc_id", "n_chars").collect():
        lo = (row["n_chars"] * k) // totals[row["lang"]]
        got = picked.get((row["lang"], row["doc_id"]), 0)
        assert got in (lo, lo + 1), (row["lang"], row["doc_id"], got, lo)


def test_group_windows_stay_bounded(spark):
    from cdc_algorithms_spark.operators.sampling import (
        pps_systematic_sample_by_group,
    )

    plan = pps_systematic_sample_by_group(
        _docs(spark), "lang", "n_chars", 16, seed=2
    )._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__bkt" in line or "__g_bkt" in line, line


# --- per-group quota dict (mixture realization) -------------------------------


def test_mixture_realized_sample_matches_oracle(spark):
    compare_with_oracle(spark, "mixture_realized_sample", SF_DIR)
    compare_with_oracle(spark, "mixture_realized_sample", SF_DIR_MID)


def test_quota_dict_exact_per_group(spark):
    from cdc_algorithms_spark.operators.sampling import (
        pps_systematic_sample_by_group,
    )

    docs = _docs(spark)
    langs = sorted(r["lang"] for r in docs.select("lang").distinct().collect())
    quotas = {g: 5 + 7 * i for i, g in enumerate(langs)}
    picked = pps_systematic_sample_by_group(
        docs, "lang", "n_chars", quotas, seed=6
    )
    per_group = {
        r["group"]: r["s"]
        for r in picked.groupBy("group")
        .agg(F.sum("n_picks").alias("s"))
        .collect()
    }
    assert per_group == quotas


def test_quota_dict_skips_unlisted_groups(spark):
    from cdc_algorithms_spark.operators.sampling import (
        pps_systematic_sample_by_group,
    )

    docs = _docs(spark)
    langs = sorted(r["lang"] for r in docs.select("lang").distinct().collect())
    quotas = {langs[0]: 9}
    picked = pps_systematic_sample_by_group(
        docs, "lang", "n_chars", quotas, seed=6
    )
    groups = {r["group"] for r in picked.select("group").distinct().collect()}
    assert groups == {langs[0]}
    assert picked.agg(F.sum("n_picks")).collect()[0][0] == 9


def test_quota_dict_guards(spark):
    from cdc_algorithms_spark.operators.sampling import (
        pps_systematic_sample_by_group,
    )

    docs = _docs(spark)
    with pytest.raises(ValueError, match="positive"):
        pps_systematic_sample_by_group(docs, "lang", "n_chars", {"en": 0})
    out = pps_systematic_sample_by_group(docs, "lang", "n_chars", {})
    assert out.count() == 0


def test_int_k_equals_uniform_dict(spark):
    from cdc_algorithms_spark.operators.sampling import (
        pps_systematic_sample_by_group,
    )

    docs = _docs(spark)
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    a = sorted(
        tuple(r)
        for r in pps_systematic_sample_by_group(
            docs, "lang", "n_chars", 12, seed=4
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in pps_systematic_sample_by_group(
            docs, "lang", "n_chars", {g: 12 for g in langs}, seed=4
        ).collect()
    )
    assert a == b
