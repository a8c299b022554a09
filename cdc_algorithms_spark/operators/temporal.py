"""Temporal join operators: as-of join (point-in-time lookup).

The reference has no joins at all (SURVEY.md §2.5 — joins are "absent");
an as-of join is the canonical temporal operator a chunk/change-feed
engine needs downstream (e.g. "state of the source as of this snapshot").
Spark has no built-in as-of join, so this is a custom operator built as a
composition of DataFrame ops (the task's preferred route (a)):

    union both sides → one window pass per key → filter left rows.

That is a SINGLE shuffle on the key columns (the window's partitionBy),
independent of how many right rows precede each left row — unlike the
naive range-join formulation (left.join(right, ts_r <= ts_l) + argmax),
which explodes to O(|L|·|R|) per key before pruning. At 100 TB the union
+ window plan is the only one that survives: state per task is one
"last seen right row" per key, and AQE balances the key shuffle.

Semantics (direction="backward", the classic as-of):
    for each left row, attach the right row with the greatest
    ``right_ts`` such that right_ts <= left_ts (allow_exact=True)
    or right_ts < left_ts (allow_exact=False). Left rows with no
    matching right row keep NULLs (left-outer flavour).

Determinism: ties on ``right_ts`` are broken by ``tie_cols`` (ascending,
last wins) — pass a unique id column to make results reproducible.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    allow_exact: bool = True,
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Backward as-of join: latest ``right`` row at-or-before each ``left`` row.

    ``right`` must be pre-projected to ``on + [right_ts] + value_cols``;
    ``value_cols`` must not collide with ``left`` column names. NULLs in
    ``value_cols`` on the right are treated as absent (looked through to
    the previous right row) — keep them non-null for strict semantics.
    """
    on = list(on)
    value_cols = list(value_cols)
    r = right.select(
        *on,
        F.col(right_ts).alias("__asof_ts"),
        *value_cols,
        F.lit(False).alias("__is_left"),
    )
    l = left.withColumn("__asof_ts", F.col(left_ts)).withColumn(
        "__is_left", F.lit(True)
    )
    combined = l.unionByName(r, allowMissingColumns=True)

    # At equal timestamps: right rows sort first iff exact matches count
    # (False < True), i.e. the window's "current row" already saw them.
    side_order = (
        F.col("__is_left").asc() if allow_exact else F.col("__is_left").desc()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__asof_ts").asc(), side_order, *[F.col(c).asc_nulls_first() for c in tie_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = combined.select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"__filled_{c}")
            for c in value_cols
        ],
    )
    out = filled.where(F.col("__is_left")).drop(
        "__asof_ts", "__is_left", *value_cols
    )
    for c in value_cols:
        out = out.withColumnRenamed(f"__filled_{c}", c)
    return out
