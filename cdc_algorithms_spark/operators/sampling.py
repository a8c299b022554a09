"""PPS systematic sampling: weight-proportional draws in exact integer math.

Training-data mixtures are REALIZED by sampling: "draw k documents with
probability proportional to size (tokens/bytes)" is the step that turns
a mixture plan (operators/mixture.py) into an actual corpus subset. The
textbook method — exponential/Gumbel keys ``u^(1/w)`` (Efraimidis &
Spirakis 2006) — needs ``ln``/``pow``, whose last-ulp behaviour differs
across engines, so the draw would not be oracle-reproducible. Systematic
PPS sampling (Madow 1949) gets the same first-order inclusion
probabilities with INTEGER-ONLY arithmetic:

1. order the corpus pseudorandomly (the ``operators/shuffle.py`` LCG —
   already oracle-exact) and prefix-sum the weights along that order,
   so each row owns the half-open interval ``[cum_before, cum_before+w)``
   of the total-weight line ``[0, W)``;
2. lay ``k`` evenly spaced thresholds ``t_j = floor((j*M + r) * W / (k*M))``
   (``r`` = seed-derived phase on a ``M = 2**20`` ring) across ``[0, W)``;
3. a row is picked once per threshold inside its interval —
   ``n_picks = cnt(cum_before + w) - cnt(cum_before)`` where
   ``cnt(x) = clamp(ceil((x*k*M - r*W) / (M*W)), 0, k)`` counts
   thresholds below ``x`` (exact: ``floor(a/b) < x  ⟺  a < x*b``).

Every quantity is a BIGINT and every division is integer division, so
DuckDB replays the draw bit-for-bit (the ``pps_sample_docs`` oracle).
Guarantees (pinned in tests/test_sampling.py): total picks == k exactly
(the counts telescope to ``cnt(W) - cnt(0) = k``), and each row's
``n_picks`` is ``floor(w*k/W)`` or ``floor(w*k/W) + 1`` — the systematic
-sampling inclusion bound (``cnt(x)`` sits in ``[x*k/W, x*k/W + 1)``, so
the difference over a length-``w`` interval lies in ``(w*k/W - 1,
w*k/W + 1)``).

Scale shape: one bounded two-phase prefix sum (operators/prefix.py — no
whole-corpus window partition), then a MAP-ONLY threshold count per row;
driver traffic is one 1-row aggregate (W, id bounds). Weights above
``W/k`` yield multiplicity > 1 — the standard PPS semantics; callers
wanting distinct rows cap weights first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.prefix import bounded_running_sum
from cdc_algorithms_spark.operators.shuffle import (
    _LCG_A,
    _LCG_C,
    _LCG_M,
    shuffle_key,
)

# phase ring for the threshold offset; small so k*M*W stays far from 2**63
PHASE_M = 1 << 20
# ord = shuffle_key << 31 | id needs ids below 2**31 to stay unique
_ID_LIMIT = 1 << 31


def sample_phase(seed: int) -> int:
    """Deterministic threshold phase in [0, PHASE_M) from the seed — one
    LCG round so nearby seeds don't give nearby phases."""
    return ((seed * _LCG_A + _LCG_C) % _LCG_M) % PHASE_M


def pps_systematic_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Draw ``k`` weight-proportional picks from ``df`` (module doc).

    Returns the picked rows only: ``(id, w, cum_before, n_picks)`` with
    ``n_picks >= 1`` and ``sum(n_picks) == k`` exactly. Deterministic in
    (corpus, seed); rows with non-positive weight are never picked.

    Raises if any id is outside [0, 2**31) (the order key packs
    ``shuffle_key << 31 | id``) or if ``W * k * PHASE_M >= 2**61``
    (the threshold count must stay overflow-free BIGINT math; rescale
    weights — inclusion probabilities only depend on weight ratios).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(weight_col).cast("long").alias("w"),
    ).where(F.col("w") > 0)
    keyed = base.withColumn(
        "__ord",
        F.shiftleft(shuffle_key("id", seed), 31) + F.col("id"),
    )
    bounds = keyed.agg(
        F.sum("w").alias("W"),
        F.min("id").alias("lo"),
        F.max("id").alias("hi"),
    ).collect()[0]
    if bounds["W"] is None:  # empty corpus: empty sample
        return keyed.select(
            "id",
            "w",
            F.lit(0).cast("long").alias("cum_before"),
            F.lit(0).cast("long").alias("n_picks"),
        ).where(F.lit(False))
    total_w = int(bounds["W"])
    if bounds["lo"] < 0 or bounds["hi"] >= _ID_LIMIT:
        raise ValueError("ids must lie in [0, 2**31) for the packed order key")
    if total_w * k * PHASE_M >= 1 << 61:
        raise ValueError(
            "W * k * PHASE_M must stay below 2**61 — rescale the weights"
        )
    r = sample_phase(seed)
    km = k * PHASE_M  # threshold numerator scale
    d = PHASE_M * total_w  # threshold count denominator
    rw = r * total_w
    run = bounded_running_sum(
        keyed, [], "__ord", "w", bucket=1 << 52, out_col="__cum"
    ).withColumn("cum_before", (F.col("__cum") - F.col("w")).cast("long"))

    # cnt(x) = clamp(ceil((x*km - rw)/d), 0, k), thresholds strictly
    # below x. `(p + d - 1) DIV d` is exact ceil for p > 0; for p <= 0
    # the true count is 0 and truncating/floor division both land at
    # <= 0 there, so the GREATEST(0, …) clamp makes Spark's DIV
    # (truncate) and DuckDB's // (floor) agree everywhere.
    run = (
        run.withColumn("__p", F.col("cum_before") * F.lit(km) - F.lit(rw))
        .withColumn(
            "__q",
            (F.col("cum_before") + F.col("w")) * F.lit(km) - F.lit(rw),
        )
        .withColumn(
            "__cnt_lo",
            F.least(
                F.lit(k).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.expr(f"(__p + {d - 1}) DIV {d}"),
                ),
            ),
        )
        .withColumn(
            "__cnt_hi",
            F.least(
                F.lit(k).cast("long"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.expr(f"(__q + {d - 1}) DIV {d}"),
                ),
            ),
        )
    )
    return (
        run.withColumn(
            "n_picks", (F.col("__cnt_hi") - F.col("__cnt_lo")).cast("long")
        )
        .where(F.col("n_picks") > 0)
        .select("id", "w", "cum_before", "n_picks")
    )


def pps_systematic_sample_by_group(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    k: int | dict,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Stratified PPS: an independent systematic draw INSIDE each group
    — the per-language (per-source) quota realization of a mixture
    plan. ``k`` is either one quota for every group (int) or a
    per-group quota dict ``{group: k_g}`` (the output of a mixture
    plan; groups absent from the dict draw nothing). Same integer-exact
    machinery as :func:`pps_systematic_sample`, with each group's own
    weight line [0, W_g) and its own seed-phased thresholds; the prefix
    sum partitions by the group, so every window stays bounded.

    Returns picked rows only: ``(group, id, w, cum_before, n_picks)``
    with ``sum(n_picks) == k_g`` exactly PER GROUP (a group lighter
    than its quota fills it with multiplicity — the standard PPS
    semantics for an up-sampled stratum). Per-group totals ``W_g`` are
    collected (one row per group — bounded by group cardinality, the
    same ≤#groups driver traffic as mixture planning); ids and the
    largest group's ``W_g * k_g * PHASE_M`` are guarded like the
    global form.
    """
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).cast("long").alias("id"),
        F.col(weight_col).cast("long").alias("w"),
    ).where(F.col("w") > 0)
    keyed = base.withColumn(
        "__ord",
        F.shiftleft(shuffle_key("id", seed), 31) + F.col("id"),
    )

    def _empty():
        return keyed.select(
            F.col("grp").alias("group"),
            "id",
            "w",
            F.lit(0).cast("long").alias("cum_before"),
            F.lit(0).cast("long").alias("n_picks"),
        ).where(F.lit(False))

    bounds = keyed.agg(
        F.min("id").alias("lo"), F.max("id").alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return _empty()
    if bounds["lo"] < 0 or bounds["hi"] >= _ID_LIMIT:
        raise ValueError("ids must lie in [0, 2**31) for the packed order key")
    total_rows = keyed.groupBy("grp").agg(
        F.sum("w").cast("long").alias("__W")
    ).collect()
    if isinstance(k, dict):
        quota = {g: int(q) for g, q in k.items()}
    else:
        if k <= 0:
            raise ValueError("k must be positive")
        quota = {r["grp"]: int(k) for r in total_rows}
    if any(q <= 0 for q in quota.values()):
        raise ValueError("every quota must be positive")
    worst = max(
        (r["__W"] * quota[r["grp"]] for r in total_rows if r["grp"] in quota),
        default=0,
    )
    if worst * PHASE_M >= 1 << 61:
        raise ValueError(
            "max(W_g * k_g) * PHASE_M must stay below 2**61 — rescale weights"
        )
    if not quota:
        return _empty()
    spark = df.sparkSession
    grp_field = base.schema["grp"]
    params = spark.createDataFrame(
        [
            (r["grp"], int(r["__W"]), quota[r["grp"]])
            for r in total_rows
            if r["grp"] in quota
        ],
        f"grp {grp_field.dataType.simpleString()}, __W long, __k long",
    )
    r = sample_phase(seed)
    run = (
        bounded_running_sum(
            keyed, ["grp"], "__ord", "w", bucket=1 << 52, out_col="__cum"
        )
        .withColumn("cum_before", (F.col("__cum") - F.col("w")).cast("long"))
        .join(F.broadcast(params), "grp")
        .withColumn("__d", (F.lit(PHASE_M) * F.col("__W")).cast("long"))
        .withColumn(
            "__p",
            F.col("cum_before") * F.col("__k") * F.lit(PHASE_M)
            - F.lit(r) * F.col("__W"),
        )
        .withColumn(
            "__q",
            (F.col("cum_before") + F.col("w")) * F.col("__k") * F.lit(PHASE_M)
            - F.lit(r) * F.col("__W"),
        )
        .withColumn(
            "__cnt_lo",
            F.least(
                F.col("__k"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.expr("(__p + __d - 1) DIV __d"),
                ),
            ),
        )
        .withColumn(
            "__cnt_hi",
            F.least(
                F.col("__k"),
                F.greatest(
                    F.lit(0).cast("long"),
                    F.expr("(__q + __d - 1) DIV __d"),
                ),
            ),
        )
    )
    return (
        run.withColumn(
            "n_picks", (F.col("__cnt_hi") - F.col("__cnt_lo")).cast("long")
        )
        .where(F.col("n_picks") > 0)
        .select(
            F.col("grp").alias("group"), "id", "w", "cum_before", "n_picks"
        )
    )
