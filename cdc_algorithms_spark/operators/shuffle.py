"""Deterministic corpus shuffle: a reproducible global training order.

Training runs read the corpus in pseudorandom order, and the order must
be reproducible (resume, ablate, audit) — so "shuffle" is a deterministic
keyed SORT, not a random draw: every document gets a shuffle key from an
LCG over its id, and its position is the global rank under that key.

The scale problem is the rank: ``row_number() OVER (ORDER BY key)`` is a
single-task total sort. Ranks here are assigned with the same bounded
two-phase shape as `operators/prefix.py`: keys bucket by their high bits
(the key space is uniform, so buckets are balanced by construction),
per-bucket counts roll into cumulative bases over the tiny bucket frame,
and a row_number runs only WITHIN each bounded bucket. No all-rows
window partition exists anywhere in the plan.

The LCG (glibc constants) is integer arithmetic both Spark and DuckDB
evaluate exactly, so the full (key, rank) assignment is oracle-checkable
— unlike xxhash64, which DuckDB cannot reproduce. For production use any
keyed hash works; the rank machinery is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# glibc rand() LCG over a 2^31 ring; seed shifts the permutation.
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 1 << 31
_N_BUCKETS_BITS = 10  # 1024 buckets → bucket = key >> 21


def shuffle_key(id_col, seed: int = 0):
    """Deterministic pseudorandom key for an integer id column.

    TWO LCG rounds with the seed inside the first: a single affine round
    would make the seed a uniform additive shift of every key, changing
    the sort order only at wraparound boundaries — i.e. different seeds
    would give nearly the SAME permutation. The intermediate ``% M``
    makes the seed's effect nonlinear, so each seed selects a genuinely
    different order (pinned by the seed-sensitivity test).

    The id is reduced mod M BEFORE the multiply: a raw 64-bit id (e.g.
    ``monotonically_increasing_id`` = partition<<33 | row) times the
    multiplier overflows long, which raises under ANSI mode. Reducing
    first keeps every intermediate below 2^62."""
    k1 = (
        (F.col(id_col).cast("long") % _LCG_M) * _LCG_A + _LCG_C + seed
    ) % _LCG_M
    return (k1 * _LCG_A + _LCG_C) % _LCG_M


def deterministic_shuffle(
    docs: DataFrame, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """``(doc_id, shuffle_key, shuffle_rank)``: the reproducible global
    read order. ``shuffle_rank`` is 1-based, dense over the corpus,
    ordered by (shuffle_key, doc_id) — the doc_id tiebreak keeps the
    order total even under key collisions."""
    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        shuffle_key(id_col, seed).alias("shuffle_key"),
    ).withColumn("__bkt", F.shiftright("shuffle_key", 31 - _N_BUCKETS_BITS))

    prior = (
        Window.partitionBy()
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = (
        keyed.groupBy("__bkt")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            "__bkt",
            F.coalesce(F.sum("__n").over(prior), F.lit(0)).alias("__base"),
        )
    )
    in_bucket = Window.partitionBy("__bkt").orderBy("shuffle_key", "doc_id")
    return (
        keyed.join(F.broadcast(bases), "__bkt")
        .withColumn(
            "shuffle_rank", (F.col("__base") + F.row_number().over(in_bucket))
        )
        .drop("__bkt", "__base")
    )


def curriculum_order(
    docs: DataFrame,
    band_col,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """``(doc_id, band, shuffle_key, curriculum_rank)``: curriculum
    read order — easy bands first, deterministically shuffled WITHIN
    each band (the standard curriculum-training order: sort by a
    difficulty proxy, randomize inside the level).

    ``band_col`` is a small-integer difficulty Column (e.g. a length or
    quality bucket). The global rank is ordered by (band, shuffle_key,
    doc_id) and assigned with the same bounded two-phase machinery as
    ``deterministic_shuffle``: rows bucket by (band, key high bits),
    per-bucket counts roll into cumulative bases over the tiny
    (bands x 1024) bucket frame, and row_number runs only within a
    bounded bucket — no all-rows window partition anywhere.
    """
    band = band_col if not isinstance(band_col, str) else F.col(band_col)
    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        band.cast("long").alias("band"),
        shuffle_key(id_col, seed).alias("shuffle_key"),
    ).withColumn("__bkt", F.shiftright("shuffle_key", 31 - _N_BUCKETS_BITS))

    prior = (
        Window.partitionBy()
        .orderBy("band", "__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = (
        keyed.groupBy("band", "__bkt")
        .agg(F.count(F.lit(1)).alias("__n"))
        .select(
            "band",
            "__bkt",
            F.coalesce(F.sum("__n").over(prior), F.lit(0)).alias("__base"),
        )
    )
    in_bucket = Window.partitionBy("band", "__bkt").orderBy(
        "shuffle_key", "doc_id"
    )
    return (
        keyed.join(F.broadcast(bases), ["band", "__bkt"])
        .withColumn(
            "curriculum_rank",
            (F.col("__base") + F.row_number().over(in_bucket)).cast("long"),
        )
        .drop("__bkt", "__base")
        .select("doc_id", "band", "shuffle_key", "curriculum_rank")
    )
