"""Mergeable histogram sketches — any-subset quantiles without re-scan.

The quantile companion of the HLL story (operators/sketches.py): exact
per-group percentiles (operators/profile.py, `percentile(...)`) re-scan
their group every time the question changes, which a 100 TB corpus
cannot afford for exploratory "p99 of <any subset>" questions. The
mergeable form: sketch each group ONCE as a fixed-grid histogram — one
row of ``buckets`` BIGINT counts plus exact n/min/max — persist the
few-hundred-byte rows, and answer any-subset quantile questions later
by element-wise summing just the sketch rows. New data sketches only
its own delta before the merge, same as the HLL union.

Error contract: a quantile read off a histogram is exact up to the
bucket it lands in — the true q-quantile provably lies inside the
reported ``[q_lo, q_hi]`` bucket bounds (counts are exact integers; the
rank walk is exact). Unlike the HLL tier (register values DuckDB cannot
reproduce → rows-only driver checks), EVERYTHING here is integer
arithmetic, so the full sketch → merge → quantile pipeline is
value-checked against a DuckDB oracle (`value_quantile_sketch`).

Scale shape: the build is one (group, bucket) aggregate with map-side
combine (≤ groups × buckets partial rows); merges and quantile reads
touch ONLY sketch rows. Grid bounds are part of the sketch contract —
merging sketches with different grids is refused, the same way HLL
lg_k mismatches would be.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _width(lo: int, hi: int, buckets: int) -> int:
    if hi <= lo or buckets <= 0:
        raise ValueError("need hi > lo and buckets > 0")
    return -((lo - hi - 1) // buckets)  # ceil((hi - lo + 1) / buckets)


def histogram_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo: int,
    hi: int,
    buckets: int = 64,
) -> DataFrame:
    """One histogram-sketch row per group: ``(…group_cols, n, v_min,
    v_max, counts)`` where ``counts[i]`` is the EXACT number of values
    in bucket ``i`` of the fixed grid (``width = ceil((hi-lo+1)/
    buckets)``; values outside [lo, hi] clamp into the edge buckets —
    their exact magnitude survives in v_min/v_max). The grid constants
    live in the caller's contract, like lg_k for HLL sketches."""
    group_cols = list(group_cols)
    w = _width(lo, hi, buckets)
    v = F.col(value_col).cast("long")
    # floor BEFORE the clamp: Spark's double→long cast truncates while
    # DuckDB's rounds, so the oracle-shared form must be an explicit
    # FLOOR (exact by the layout.py::_scaled rationale — a long/long
    # quotient only sits within an ulp of an integer when it IS one)
    bucket = F.least(
        F.lit(buckets - 1).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor((v - F.lit(lo)) / F.lit(w)).cast("long"),
        ),
    )
    per = df.groupBy(*group_cols, bucket.alias("__b")).agg(
        F.count(F.lit(1)).alias("__c"),
        F.min(v).alias("__mn"),
        F.max(v).alias("__mx"),
    )
    return (
        per.groupBy(*group_cols)
        .agg(
            F.sum("__c").cast("long").alias("n"),
            F.min("__mn").cast("long").alias("v_min"),
            F.max("__mx").cast("long").alias("v_max"),
            F.map_from_entries(
                F.collect_list(F.struct("__b", "__c"))
            ).alias("__m"),
        )
        .select(
            *group_cols,
            "n",
            "v_min",
            "v_max",
            F.transform(
                F.sequence(F.lit(0), F.lit(buckets - 1)),
                lambda i: F.coalesce(
                    F.element_at("__m", i.cast("long")), F.lit(0)
                ).cast("long"),
            ).alias("counts"),
        )
    )


def sketch_merge(
    sketches: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Merge histogram-sketch ROWS into one row per (possibly coarser)
    ``group_cols`` grouping — or one global row with none. Counts sum
    element-wise, n sums, min/max fold; the data the sketches summarize
    is never touched. Runs over the sketch frame only (posexplode of
    ≤ rows × buckets positions — sketch-scale, not data-scale)."""
    group_cols = list(group_cols)
    ex = sketches.select(
        *group_cols,
        "n",
        "v_min",
        "v_max",
        F.posexplode("counts").alias("__b", "__c"),
    )
    per_b = ex.groupBy(*group_cols, "__b").agg(
        F.sum("__c").cast("long").alias("__c")
    )
    heads = sketches.groupBy(*group_cols).agg(
        F.sum("n").cast("long").alias("n"),
        F.min("v_min").cast("long").alias("v_min"),
        F.max("v_max").cast("long").alias("v_max"),
    )
    folded = (
        per_b.groupBy(*group_cols)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("__b", "__c"))
            ).alias("__m"),
            F.max("__b").alias("__top"),
        )
        .select(
            *group_cols,
            F.transform(
                F.sequence(F.lit(0), F.col("__top")),
                lambda i: F.coalesce(
                    F.element_at("__m", i.cast("long")), F.lit(0)
                ).cast("long"),
            ).alias("counts"),
        )
    )
    if group_cols:
        return heads.join(folded, group_cols)
    return heads.crossJoin(folded)


def sketch_quantiles(
    sketches: DataFrame,
    lo: int,
    hi: int,
    buckets: int,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Quantile bounds from histogram-sketch rows, exactly: for each
    ``q`` the row gains ``q<pct>_lo`` / ``q<pct>_hi`` — the grid bucket
    the rank-``ceil(q*n)`` value provably lies in (cumulative counts
    are exact integers, so the bucket walk is deterministic and the
    DuckDB oracle replays it bit-for-bit). Bucket edges clamp to the
    exact v_min/v_max, so a degenerate sketch (one value) reports the
    value itself. Pure expressions over the sketch rows."""
    w = _width(lo, hi, buckets)
    b = F.lit(buckets)
    cum = F.transform(
        F.sequence(F.lit(1), b),
        lambda i: F.aggregate(
            F.slice("counts", F.lit(1), i),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )
    out = sketches.withColumn("__cum", cum)
    cols = list(keep_cols) + ["n", "v_min", "v_max"]
    sel = [F.col(c) for c in cols]
    for q in qs:
        pct = f"p{round(q * 100)}"
        rank = F.ceil(F.lit(q) * F.col("n")).cast("long")
        pos = F.array_position(
            F.transform(F.col("__cum"), lambda c: c >= rank), True
        )
        sel.append(
            F.greatest(
                F.col("v_min"),
                F.lit(lo) + (pos - 1) * F.lit(w),
            ).cast("long").alias(f"{pct}_lo")
        )
        sel.append(
            F.least(
                F.col("v_max"),
                F.lit(lo) + pos * F.lit(w) - 1,
            ).cast("long").alias(f"{pct}_hi")
        )
    return out.select(*sel)
