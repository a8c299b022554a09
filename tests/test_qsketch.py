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


def test_out_of_range_values_stay_inside_reported_bounds(spark):
    """Edge buckets EXTEND (not clamp) to v_min/v_max: with values
    spilling below lo and above hi, the rank statistic must still lie
    inside every reported interval — the r07 containment gap (clamping
    the top bucket's hi to the grid top put the true value OUTSIDE
    the reported bounds)."""
    import math

    vals = list(range(1, 31))  # grid [10, 19] → 1..9 and 20..30 clamp
    df = spark.createDataFrame([("a", v) for v in vals], "g string, v long")
    sk = histogram_sketch(df, ["g"], "v", 10, 19, 5)
    q = sketch_quantiles(
        sk, 10, 19, 5, keep_cols=["g"], qs=[0.01, 0.5, 0.99]
    ).collect()[0]
    for pct, frac in (("p1", 0.01), ("p50", 0.5), ("p99", 0.99)):
        stat = sorted(vals)[math.ceil(frac * len(vals)) - 1]
        assert q[f"{pct}_lo"] <= stat <= q[f"{pct}_hi"], (pct, stat, dict(q.asDict()))
    # the top statistic is a clamped value (30 > hi=19): the reported
    # hi must have extended all the way to v_max
    assert q["p99_hi"] == 30


def test_integer_rank_at_multiple_of_ten(spark):
    """rank = ceil(0.9 * n) with n = 10 is exactly 9, but the double
    product 0.9*10 sits an ulp above 9.0 and double-ceil gives 10 —
    the latent oracle divergence flagged in r07 ADVICE. Width-1 buckets
    make the assertion exact: the p90 of 1..10 is 9, not 10."""
    df = spark.createDataFrame(
        [("a", i) for i in range(1, 11)], "g string, v long"
    )
    sk = histogram_sketch(df, ["g"], "v", 0, 63, 64)
    q = sketch_quantiles(sk, 0, 63, 64, keep_cols=["g"]).collect()[0]
    assert (q["p90_lo"], q["p90_hi"]) == (9, 9)
    assert (q["p50_lo"], q["p50_hi"]) == (5, 5)


def test_null_values_excluded(spark):
    """NULLs have no bucket: n counts non-null values only (silently
    folding them into bucket 0 skewed every quantile low)."""
    df = spark.createDataFrame(
        [("a", 5), ("a", None), ("a", 7), ("a", None)], "g string, v long"
    )
    sk = histogram_sketch(df, ["g"], "v", 0, 63, 64).collect()[0]
    assert sk["n"] == 2
    assert (sk["v_min"], sk["v_max"]) == (5, 7)
    assert sum(sk["counts"]) == 2


def test_mismatched_grids_refuse_to_merge(spark):
    """The documented grid contract is ENFORCED: sketches built on
    different grids (or with a counts array of the wrong length) raise
    at merge / read time instead of summing into meaningless counts."""
    df = spark.createDataFrame(
        [("a", i) for i in range(1, 11)], "g string, v long"
    )
    sk_a = histogram_sketch(df, ["g"], "v", 0, 63, 64)
    sk_b = histogram_sketch(
        df.withColumn("g", F.lit("b")), ["g"], "v", 0, 127, 64
    )
    with pytest.raises(Exception, match="(?i)grid|assert"):
        sketch_merge(sk_a.unionByName(sk_b)).collect()
    # reading with the wrong grid refuses too
    with pytest.raises(Exception, match="(?i)grid|assert"):
        sketch_quantiles(sk_a, 0, 127, 64, keep_cols=["g"]).collect()
    # matching grids still merge fine
    assert sketch_merge(sk_a, ["g"]).collect()[0]["n"] == 10


def test_auto_bounds_discovery_and_grid_readback(spark):
    """histogram_sketch_auto: one exact min/max pass fixes the grid, the
    bounds persist in the rows, sketch_grid reads them back, and a
    delta sketched against the read-back grid merges exactly — the
    standing-pipeline path for a column with unknown range."""
    from cdc_algorithms_spark.operators.qsketch import (
        histogram_sketch_auto,
        sketch_grid,
    )

    df = spark.createDataFrame(
        [("a", v) for v in range(100, 161)], "g string, v long"
    )
    sk = histogram_sketch_auto(df, ["g"], "v", 16)
    lo, hi, b = sketch_grid(sk)
    assert (lo, hi, b) == (100, 160, 16)
    explicit = histogram_sketch(df, ["g"], "v", lo, hi, b)
    assert sorted(map(tuple, sk.collect())) == sorted(
        map(tuple, explicit.collect())
    )
    # a later delta sketched on the READ-BACK grid merges exactly
    delta = spark.createDataFrame(
        [("a", v) for v in (105, 155)], "g string, v long"
    )
    merged = sketch_merge(
        sk.unionByName(histogram_sketch(delta, ["g"], "v", lo, hi, b)),
        ["g"],
    ).collect()[0]
    union_direct = histogram_sketch(
        df.unionByName(delta), ["g"], "v", lo, hi, b
    ).collect()[0]
    assert tuple(merged) == tuple(union_direct)
    # degenerate single-value input still yields a valid grid
    one = spark.createDataFrame([("x", 7)], "g string, v long")
    sk1 = histogram_sketch_auto(one, ["g"], "v", 4)
    assert sketch_grid(sk1) == (7, 8, 4)
    # all-null input refuses instead of inventing bounds
    nulls = spark.createDataFrame(
        [("x", None)], "g string, v long"
    )
    with pytest.raises(ValueError, match="non-null"):
        histogram_sketch_auto(nulls, ["g"], "v", 4)


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


@pytest.mark.parametrize("sf", [SF_DIR, SF_DIR_MID])
def test_auto_quantile_sketch_matches_oracle(spark, sf):
    compare_with_oracle(spark, "value_quantile_sketch_auto", sf)


# --- log-grid (boundless) sketches ------------------------------------------


def _log_cents(spark):
    return load_table(spark, "events", SF_DIR).select(
        "event_type",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )


@pytest.mark.parametrize("sf", [SF_DIR, SF_DIR_MID])
def test_log_quantile_sketch_matches_oracle(spark, sf):
    compare_with_oracle(spark, "value_quantile_sketch_log", sf)


def test_log_merge_equals_rebuild(spark):
    """The universal grid's whole point: merge works with no grid
    negotiation at all, and equals the one-shot rebuild exactly."""
    from cdc_algorithms_spark.operators.qsketch import histogram_sketch_log

    cents = _log_cents(spark)
    merged = sketch_merge(histogram_sketch_log(cents, ["event_type"], "cents")).collect()
    direct = histogram_sketch_log(cents, [], "cents").collect()
    assert len(merged) == len(direct) == 1
    assert merged[0]["n"] == direct[0]["n"]
    assert merged[0]["v_min"] == direct[0]["v_min"]
    assert merged[0]["v_max"] == direct[0]["v_max"]
    assert list(merged[0]["counts"]) == list(direct[0]["counts"])


def test_log_sketch_absorbs_any_magnitude(spark):
    """What the auto-discovered linear grid cannot do: a delta 10^6×
    outside the seed's range merges into the same sketch with exact
    counts — no grid mismatch, no re-plan."""
    from cdc_algorithms_spark.operators.qsketch import (
        histogram_sketch_log,
        sketch_quantiles_log,
    )

    seed = spark.createDataFrame(
        [(v,) for v in (0, 1, 5, 200, 999)], "v long"
    )
    delta = spark.createDataFrame(
        [(v,) for v in (10**9, 2**45)], "v long"
    )
    sk = sketch_merge(
        histogram_sketch_log(seed, [], "v").unionByName(
            histogram_sketch_log(delta, [], "v")
        )
    )
    row = sketch_quantiles_log(sk).collect()[0]
    assert row["n"] == 7
    assert row["v_min"] == 0 and row["v_max"] == 2**45
    # true p99 (rank ceil(0.99*7)=7 → 2^45) inside reported bounds
    assert row["p99_lo"] <= 2**45 <= row["p99_hi"]
    # true p50 (rank 4 → 200) inside reported bounds
    assert row["p50_lo"] <= 200 <= row["p50_hi"]


def test_log_sketch_top_bucket_no_ansi_overflow(spark):
    """Bucket 62 (values in [2^62, 2^63-1]) is the 'absorbs any
    magnitude' contract's edge: its upper bound is 2^63-1, and a naive
    shiftleft(1, 63) - 1 throws ARITHMETIC_OVERFLOW under Spark 4's
    default ANSI mode. The bound must be formed overflow-free."""
    from cdc_algorithms_spark.operators.qsketch import (
        histogram_sketch_log,
        sketch_quantiles_log,
    )

    vals = [2**62, 2**62 + 7, 2**63 - 2, 2**63 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = sketch_quantiles_log(histogram_sketch_log(df, [], "v")).collect()[0]
    assert row["n"] == 4
    assert row["v_min"] == 2**62 and row["v_max"] == 2**63 - 1
    # every quantile lands in bucket 62: [2^62, 2^63-1] clamped to exact
    for pct in ("p50", "p90", "p99"):
        assert row[f"{pct}_lo"] == 2**62
        assert row[f"{pct}_hi"] == 2**63 - 1


def test_log_true_order_statistic_inside_bounds(spark):
    import math

    from cdc_algorithms_spark.operators.qsketch import (
        histogram_sketch_log,
        sketch_quantiles_log,
    )

    cents = _log_cents(spark)
    vals = sorted(r["cents"] for r in cents.select("cents").collect())
    row = sketch_quantiles_log(
        histogram_sketch_log(cents, [], "cents")
    ).collect()[0]
    for q, lo_c, hi_c in [(0.5, "p50_lo", "p50_hi"), (0.9, "p90_lo", "p90_hi"),
                          (0.99, "p99_lo", "p99_hi")]:
        true_q = vals[math.ceil(q * len(vals)) - 1]
        assert row[lo_c] <= true_q <= row[hi_c]


def test_log_sketch_rejects_negative_values(spark):
    from cdc_algorithms_spark.operators.qsketch import histogram_sketch_log

    df = spark.createDataFrame([(5,), (-3,)], "v long")
    with pytest.raises(Exception):
        histogram_sketch_log(df, [], "v").collect()


def test_linear_reader_refuses_log_sketch(spark):
    """Grid-contract cross-check: a log sketch fed to the linear
    quantile reader must raise, never silently misread."""
    from cdc_algorithms_spark.operators.qsketch import histogram_sketch_log

    sk = histogram_sketch_log(_log_cents(spark), [], "cents")
    with pytest.raises(Exception):
        sketch_quantiles(sk, LO, HI, B).collect()


def test_log_streamed_absorbs_cross_magnitude_batches(spark, tmp_path):
    """The standing-pipeline case the auto grid cannot serve: batch 2's
    values are 10^6× batch 1's; the streamed log sketch folds both
    exactly and equals the one-shot build of the union."""
    from cdc_algorithms_spark.operators.qsketch import histogram_sketch_log
    from cdc_algorithms_spark.streaming.qsketch_stream import (
        run_streaming_quantile_sketch_log,
    )

    b1 = spark.createDataFrame([(v,) for v in (0, 3, 17, 900)], "v long")
    b2 = spark.createDataFrame(
        [(v,) for v in (10**9, 7 * 10**10)], "v long"
    )
    streamed = run_streaming_quantile_sketch_log(
        spark, [b1, b2], str(tmp_path / "sk"), [], "v"
    ).collect()
    direct = histogram_sketch_log(b1.unionByName(b2), [], "v").collect()
    assert len(streamed) == len(direct) == 1
    s, d = streamed[0], direct[0]
    assert (s["n"], s["v_min"], s["v_max"]) == (d["n"], d["v_min"], d["v_max"])
    assert list(s["counts"]) == list(d["counts"])
