"""Gap-based sessionization of the `events` stream with
``session_window`` + watermark (SURVEY.md §2.5: streaming-only ops).

The batch twin (queries_relational.user_sessions) computes the same
sessions with lag/cumsum window functions; equality of the two is
oracle-checked at sf0.01 via queries_streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "1 second",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user sessions: events closer than ``gap`` merge into one
    session row ``(user_id, session_start, session_end, n_events,
    total_value)``.

    Append mode: a session is emitted exactly once, when the watermark
    passes its close — so downstream consumers see each session as an
    immutable fact. State is one open session per (user, window) shard,
    merged by Spark's session-window operator; skewed users cost one hot
    key each, bounded by their own event rate.

    Note on bounded inputs: append mode only flushes a session once
    *later* data moves the watermark past it, so the last open sessions
    of a finite stream need a final nudge — the registry query stages a
    far-future sentinel event whose own (never-emitted) session forces
    every real session closed.
    """
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("session"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            user_col,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
