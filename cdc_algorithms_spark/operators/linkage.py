"""Record linkage and behavioral-sequence operators.

Two capabilities a corpus/warehouse engine needs that the reference
(a chunking kernel, SURVEY.md §2) has no surface for but the task
mandates as first-class pipeline operators:

* **Blocked fuzzy matching** (``blocked_fuzzy_name_pairs``): find
  near-identical catalog values (typos, re-spellings) without an
  all-pairs comparison. The classic record-linkage recipe — block,
  deduplicate to the distinct-value vocabulary, then compare within
  blocks only — keeps the quadratic stage bounded by the *vocabulary*
  size per block, never the row count. At 100 TB the row-level
  self-join is impossible; the vocabulary-level one is trivial.

* **Ordered funnel** (``event_funnel``): how many users progressed
  through an ordered sequence of event stages, where each stage must
  occur strictly after the previous one. Implemented as a chain of
  per-user min-timestamp aggregates — one hash shuffle on ``user_col``
  per stage (all on the same key, so Catalyst/AQE reuses the
  partitioning across stages), no window over the full event stream
  and no per-user event sorting.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_name_pairs(
    df: DataFrame,
    name_col: str,
    block_col,
    max_distance: int = 2,
) -> DataFrame:
    """Fuzzy-match distinct ``name_col`` values within blocks.

    ``block_col`` is a column name or Column expression; rows whose
    block differs are never compared (the blocking step of classic
    record linkage — e.g. a phonetic key, a shared token, a prefix).

    Returns one row per unordered pair of distinct names in the same
    block with Levenshtein distance in ``[1, max_distance]``:
    ``(block, name_a, name_b, distance, n_rows_a, n_rows_b)`` where
    ``n_rows_*`` are the source-row counts behind each name — the
    "how much data would a merge touch" signal.

    Scale design: the first aggregate collapses the corpus to the
    distinct (block, name) vocabulary with counts — one hash shuffle,
    map-side combined. Only the vocabulary self-joins, and only within
    a block, so candidate pairs are O(sum over blocks of v_b^2) for
    vocabulary sizes v_b — independent of corpus row count. The
    distance filter runs JVM-side (``levenshtein`` is a builtin —
    whole-stage codegen, no UDF).
    """
    block = F.col(block_col) if isinstance(block_col, str) else block_col
    vocab = (
        df.select(block.alias("block"), F.col(name_col).alias("name"))
        .groupBy("block", "name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    a = vocab.select(
        "block",
        F.col("name").alias("name_a"),
        F.col("n_rows").alias("n_rows_a"),
    )
    b = vocab.select(
        "block",
        F.col("name").alias("name_b"),
        F.col("n_rows").alias("n_rows_b"),
    )
    pairs = (
        a.join(b, "block")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "distance", F.levenshtein("name_a", "name_b").cast("long")
        )
        .where(F.col("distance") <= F.lit(int(max_distance)))
    )
    return pairs.select(
        "block", "name_a", "name_b", "distance", "n_rows_a", "n_rows_b"
    )


def event_funnel(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel over ``stages``.

    A user "reaches" stage k when an event of type ``stages[k]`` exists
    strictly after their earliest qualifying time for stage k-1 (the
    classic first-touch funnel; re-orderings don't count).

    Returns one row per stage:
    ``(stage_idx, stage, n_users, conversion)`` where ``conversion`` is
    ``n_users / n_users(stage 0)`` rounded to 6 places.

    Scale design: stage k is a semi-filtered aggregate — filter to one
    event type, join to the (user, t_{k-1}) frame from the previous
    stage, keep events after t_{k-1}, take the per-user min. Every
    shuffle is on ``user_col``; the per-stage state is one timestamp
    per surviving user (monotonically shrinking). No global window, no
    per-user event-list collection — the 100 TB event stream only ever
    flows through hash aggregates.
    """
    stages = list(stages)
    if not stages:
        raise ValueError("stages must be non-empty")

    reached: list[DataFrame] = []
    prev: DataFrame | None = None
    for stage in stages:
        stage_events = events.where(F.col(type_col) == stage).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("t")
        )
        if prev is None:
            cur = stage_events.groupBy("user").agg(F.min("t").alias("t"))
        else:
            cur = (
                stage_events.join(
                    prev.select("user", F.col("t").alias("t_prev")), "user"
                )
                .where(F.col("t") > F.col("t_prev"))
                .groupBy("user")
                .agg(F.min("t").alias("t"))
            )
        reached.append(cur)
        prev = cur

    counts = None
    for idx, (stage, cur) in enumerate(zip(stages, reached)):
        row = cur.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(stage).alias("stage"),
            "n_users",
        )
        counts = row if counts is None else counts.unionByName(row)

    base = counts.where(F.col("stage_idx") == 0).select(
        F.col("n_users").alias("n_base")
    )
    return counts.crossJoin(F.broadcast(base)).select(
        "stage_idx",
        "stage",
        "n_users",
        F.round(
            F.col("n_users").cast("double") / F.col("n_base").cast("double"), 6
        ).alias("conversion"),
    )


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    name_col: str,
    block_col,
    max_distance: int = 2,
    right_name_col: str | None = None,
    right_block_col=None,
) -> DataFrame:
    """Cross-TABLE record linkage: match ``left`` names to ``right``
    names within blocks at Levenshtein distance <= ``max_distance``
    (0 = exact matches included — reconciliation wants both).

    Same scale recipe as :func:`blocked_fuzzy_name_pairs`: each side
    collapses to its distinct (block, name) vocabulary with row counts
    BEFORE the quadratic stage, so candidate pairs are bounded by
    vocabulary sizes per block, never by row counts. Returns
    ``(block, name_a, name_b, distance, n_rows_a, n_rows_b)`` where
    ``a`` is the left side.
    """
    lblock = F.col(block_col) if isinstance(block_col, str) else block_col
    rname = right_name_col if right_name_col is not None else name_col
    rb = right_block_col if right_block_col is not None else block_col
    rblock = F.col(rb) if isinstance(rb, str) else rb
    a = (
        left.select(lblock.alias("block"), F.col(name_col).alias("name_a"))
        .groupBy("block", "name_a")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows_a"))
    )
    b = (
        right.select(rblock.alias("block"), F.col(rname).alias("name_b"))
        .groupBy("block", "name_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows_b"))
    )
    return (
        a.join(b, "block")
        .withColumn("distance", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("distance") <= F.lit(int(max_distance)))
        .select("block", "name_a", "name_b", "distance", "n_rows_a", "n_rows_b")
    )
