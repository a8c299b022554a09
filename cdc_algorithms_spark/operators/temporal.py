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


def resample_locf(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Regular-grid resample with gap-fill (the hypertable-rollup shape):
    bucket events to a fixed step, materialize the FULL grid per key over
    the global time range, and carry the last observed aggregate forward
    into empty buckets (LOCF; leading gaps stay null).

    Returns ``(key, bucket, n_events, avg_value_filled)``.

    Scale notes: the grid is built from a broadcast 1-row bounds
    aggregate crossed with the distinct key dimension — never by
    exploding per-event ranges; the LOCF pass is one window over
    (key, bucket), i.e. one shuffle partitioned by key, and buckets per
    partition are bounded by the range/step ratio rather than the event
    count, so fill cost is independent of event volume.
    """
    # Bucket via epoch-aligned tumbling windows so the SAME `step` drives
    # bucketing, bounds, and the grid stride (a hard-coded date_trunc
    # would silently mis-bucket for any step other than its unit; for
    # "1 hour" window.start == date_trunc('hour') exactly).
    bucketed = events.withColumn("__bucket", F.window(F.col(ts_col), step)["start"])
    bounds = bucketed.agg(
        F.min("__bucket").alias("h0"), F.max("__bucket").alias("h1")
    )
    keys = events.select(F.col(key_col).alias("key")).distinct()
    grid = keys.crossJoin(F.broadcast(bounds)).select(
        "key",
        F.explode(
            F.sequence("h0", "h1", F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    )
    per_bucket = bucketed.groupBy(
        F.col(key_col).alias("key"),
        F.col("__bucket").alias("bucket"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.avg(value_col), 4).alias("avg_value"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_bucket, ["key", "bucket"], "left")
        .select(
            "key",
            "bucket",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(w).alias("avg_value_filled"),
        )
    )
