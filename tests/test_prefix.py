"""Property tests for the bounded two-phase prefix sum — the primitive
under curation budgets, mixture planning, sequence packing, and chunk
ordinals. The invariant: for ANY bucket size it must equal the naive
ordered cumulative sum."""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.prefix import bounded_running_sum


def _naive(pdf: pd.DataFrame, keys: list[str]) -> dict:
    pdf = pdf.sort_values("ord")
    if keys:
        run = pdf.groupby(keys)["val"].cumsum()
    else:
        run = pdf["val"].cumsum()
    return dict(zip(pdf["ord"], run))


def _spark_df(spark, rows, keys):
    cols = [*keys, "ord", "val"]
    return spark.createDataFrame(rows, cols)


def test_bounded_running_sum_equals_naive_across_geometries(spark):
    rng = random.Random(42)
    for trial in range(4):
        n = rng.choice([1, 7, 100, 257])
        # sparse, non-contiguous order values — buckets get uneven fills
        ords = rng.sample(range(0, n * 13), n)
        rows = [
            (rng.choice(["a", "b", "c"]), o, rng.randint(-50, 50)) for o in ords
        ]
        pdf = pd.DataFrame(rows, columns=["k", "ord", "val"])
        for bucket in (1, 3, 64, 10_000):
            out = bounded_running_sum(
                _spark_df(spark, rows, ["k"]), ["k"], "ord", "val", bucket=bucket
            ).collect()
            want = _naive(pdf, ["k"])
            got = {r["ord"]: r["running"] for r in out}
            assert got == want, f"trial={trial} bucket={bucket}"


def test_bounded_running_sum_global_no_partition(spark):
    rows = [(o, o * o % 17 - 5) for o in range(0, 300, 7)]
    pdf = pd.DataFrame(rows, columns=["ord", "val"])
    for bucket in (1, 16, 1024):
        out = bounded_running_sum(
            spark.createDataFrame(rows, ["ord", "val"]), [], "ord", "val",
            bucket=bucket,
        ).collect()
        want = _naive(pdf, [])
        got = {r["ord"]: r["running"] for r in out}
        assert got == want


def test_bounded_running_sum_empty_and_single(spark):
    empty = spark.createDataFrame([], "k string, ord long, val long")
    assert bounded_running_sum(empty, ["k"], "ord", "val").count() == 0
    one = bounded_running_sum(
        spark.createDataFrame([("a", 5, 9)], ["k", "ord", "val"]),
        ["k"], "ord", "val", bucket=2,
    ).collect()
    assert len(one) == 1 and one[0]["running"] == 9
