"""Mergeable histogram quantile sketches (operators/qsketch.py).

Oracle comparisons plus the laws: merge-of-sketches == sketch-of-union
(exact, bit-for-bit — unlike the HLL tier), the true percentile always
lies inside the reported bucket bounds, persistence round-trips, and
partitioning independence.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.qsketch import (
    histogram_sketch,
    sketch_merge,
    sketch_quantiles,
)
from cdc_algorithms_spark.sources.registry import load_table

from tests.conftest import SF_DIR, SF_DIR_MID
from tests.oracle import compare_with_oracle

LO, HI, B = 0, 49151, 64


@pytest.mark.parametrize("sf", [SF_DIR, SF_DIR_MID])
def test_quantile_sketch_matches_oracle(spark, sf):
    compare_with_oracle(spark, "value_quantile_sketch", sf)


def _cents(spark, sf=SF_DIR):
    return load_table(spark, "events", sf).select(
        "event_type",
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )


def test_merge_equals_rebuild(spark):
    """The mergeability law, exactly: summing per-type sketch rows
    gives the SAME row a one-shot global sketch builds — so persisted
    group sketches answer any-subset questions with zero error drift
    (the HLL tier only promises <0.1%; counts are integers here)."""
    cents = _cents(spark)
    per_type = histogram_sketch(cents, ["event_type"], "cents", LO, HI, B)
    merged = sketch_merge(per_type).collect()
    direct = histogram_sketch(cents, [], "cents", LO, HI, B).collect()
    assert len(merged) == len(direct) == 1
    assert merged[0]["n"] == direct[0]["n"]
    assert merged[0]["v_min"] == direct[0]["v_min"]
    assert merged[0]["v_max"] == direct[0]["v_max"]
    assert list(merged[0]["counts"]) == list(direct[0]["counts"])


def test_subset_merge_matches_subset_rebuild(spark):
    """Any-subset: merging two of the types equals sketching their
    union directly."""
    cents = _cents(spark)
    types = sorted(
        r[0] for r in cents.select("event_type").distinct().collect()
    )[:2]
    per_type = histogram_sketch(cents, ["event_type"], "cents", LO, HI, B)
    merged = sketch_merge(
        per_type.where(F.col("event_type").isin(types))
    ).collect()[0]
    direct = histogram_sketch(
        cents.where(F.col("event_type").isin(types)), [], "cents", LO, HI, B
    ).collect()[0]
    assert (
        merged["n"],
        merged["v_min"],
        merged["v_max"],
        list(merged["counts"]),
    ) == (
        direct["n"],
        direct["v_min"],
        direct["v_max"],
        list(direct["counts"]),
    )


def test_true_order_statistic_inside_reported_bounds(spark):
    """The sketch's contract is about the rank-ceil(q*n) ORDER
    STATISTIC (not an interpolated percentile): that exact value must
    lie inside every reported [lo, hi] bucket, strictly."""
    import math

    cents = _cents(spark)
    sk = histogram_sketch(cents, ["event_type"], "cents", LO, HI, B)
    qrows = {
        r["event_type"]: r
        for r in sketch_quantiles(
            sk, LO, HI, B, keep_cols=["event_type"]
        ).collect()
    }
    by_type: dict[str, list[int]] = {}
    for r in cents.select("event_type", "cents").collect():
        by_type.setdefault(r["event_type"], []).append(r["cents"])
    for t, vals in by_type.items():
        vals.sort()
        q = qrows[t]
        for pct, frac in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            stat = vals[math.ceil(frac * len(vals)) - 1]
            assert q[f"{pct}_lo"] <= stat <= q[f"{pct}_hi"], (
                t, pct, stat, q[f"{pct}_lo"], q[f"{pct}_hi"],
            )


def test_persistence_roundtrip_and_partitioning(spark, tmp_path):
    cents = _cents(spark)
    sk = histogram_sketch(cents, ["event_type"], "cents", LO, HI, B)
    sk.write.parquet(str(tmp_path / "sk"))
    back = spark.read.parquet(str(tmp_path / "sk"))
    a = sorted(
        tuple(r)
        for r in sketch_quantiles(
            back, LO, HI, B, keep_cols=["event_type"]
        ).collect()
    )
    b = sorted(
        tuple(r)
        for r in sketch_quantiles(
            histogram_sketch(
                cents.repartition(13), ["event_type"], "cents", LO, HI, B
            ),
            LO, HI, B, keep_cols=["event_type"],
        ).collect()
    )
    assert a == b


def test_degenerate_single_value_group(spark):
    one = spark.createDataFrame([("x", 777)], "g string, v long")
    sk = histogram_sketch(one, ["g"], "v", LO, HI, B)
    q = sketch_quantiles(sk, LO, HI, B, keep_cols=["g"]).collect()[0]
    for pct in ("p50", "p90", "p99"):
        assert q[f"{pct}_lo"] == q[f"{pct}_hi"] == 777


def test_grid_guard():
    with pytest.raises(ValueError):
        from cdc_algorithms_spark.operators.qsketch import _width

        _width(10, 10, 4)


# --- streaming maintenance ----------------------------------------------------


@pytest.mark.parametrize("sf", [SF_DIR, SF_DIR_MID])
def test_streaming_quantile_sketch_matches_oracle(spark, sf):
    compare_with_oracle(spark, "streaming_value_quantile_sketch", sf)


def test_streamed_sketch_is_batching_invariant(spark, tmp_path):
    """Merging is exact, so ANY micro-batch split — including one with
    an empty stage — folds to rows bit-identical to the one-shot
    sketch."""
    from cdc_algorithms_spark.streaming.qsketch_stream import (
        run_streaming_quantile_sketch,
    )

    cents = _cents(spark).select("event_type", "cents")
    direct = sorted(
        tuple(r)
        for r in histogram_sketch(
            cents, ["event_type"], "cents", LO, HI, B
        ).collect()
    )
    splits = [
        [cents.where(F.col("cents") % 2 == 0),
         cents.where(F.col("cents") % 2 == 1)],
        [cents.where(F.col("cents") % 5 == 0),
         cents.where(F.col("cents") % 5 != 0),
         cents.where(F.lit(False))],  # an empty trailing stage
    ]
    for i, stages in enumerate(splits):
        folded = run_streaming_quantile_sketch(
            spark, stages, str(tmp_path / f"s{i}"), ["event_type"],
            "cents", LO, HI, B,
        )
        assert sorted(tuple(r) for r in folded.collect()) == direct
