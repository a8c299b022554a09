"""Join-family queries (as-of / range / interval / semi / anti / except /
salted) against the DuckDB oracle, plus unit semantics of asof_join."""

from __future__ import annotations

import datetime

import pytest

from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.temporal import asof_join
from tests.oracle import compare_with_oracle

JOIN_QUERIES = [
    "asof_last_view_before_purchase",
    "value_band_range_join",
    "order_pairs_within_30d",
    "customers_no_1995_order",
    "parts_shipped_1998_semi",
    "viewers_never_purchased",
    "monthly_order_stats",
    "salted_user_segment_join",
]


@pytest.mark.parametrize("name", JOIN_QUERIES)
def test_join_oracle_equivalence(spark, name):
    compare_with_oracle(spark, name, "/root/testdata/sf0.001")


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k", _ts("2024-01-01T10:00:00")),
            (2, "k", _ts("2024-01-01T12:00:00")),
            (3, "k", _ts("2024-01-01T09:00:00")),  # before any right row
            (4, "other", _ts("2024-01-01T12:00:00")),  # key never on right
        ],
        "lid long, key string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k", _ts("2024-01-01T10:00:00"), 100),
            ("k", _ts("2024-01-01T11:30:00"), 200),
            ("k", _ts("2024-01-01T11:30:00"), 201),  # tie on ts
        ],
        "key string, rts timestamp, rval long",
    )
    return left, right


def test_asof_exact_match_and_nulls(spark, asof_frames):
    left, right = asof_frames
    out = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="rts",
        value_cols=["rval"], allow_exact=True, tie_cols=["rval"],
    )
    got = {r["lid"]: r["rval"] for r in out.collect()}
    # lid=1 at 10:00 sees the exact-ts right row; lid=2 takes the larger
    # tie-break at 11:30; lid=3/4 have no match → NULL.
    assert got == {1: 100, 2: 201, 3: None, 4: None}


def test_asof_strict_excludes_equal_ts(spark, asof_frames):
    left, right = asof_frames
    out = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="rts",
        value_cols=["rval"], allow_exact=False, tie_cols=["rval"],
    )
    got = {r["lid"]: r["rval"] for r in out.collect()}
    assert got[1] is None  # 10:00 right row no longer visible at 10:00
    assert got[2] == 201


def test_asof_single_shuffle_plan(spark, asof_frames):
    """The union+window plan must not contain a join operator at all —
    one exchange on the key feeds the window."""
    left, right = asof_frames
    out = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="rts",
        value_cols=["rval"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
