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
reported ``[q_lo, q_hi]`` bounds (counts are exact integers; the rank
walk is exact integer arithmetic; edge buckets EXTEND to the exact
v_min/v_max so clamped out-of-range values stay inside the reported
interval). Unlike the HLL tier (register values DuckDB cannot
reproduce → rows-only driver checks), EVERYTHING here is integer
arithmetic, so the full sketch → merge → quantile pipeline is
value-checked against a DuckDB oracle (`value_quantile_sketch`).

Scale shape: the build is one (group, bucket) aggregate with map-side
combine (≤ groups × buckets partial rows); merges and quantile reads
touch ONLY sketch rows. Grid bounds are part of the sketch contract
and are PERSISTED in every sketch row (``grid_lo``/``grid_hi``/
``grid_buckets``) — merging or reading sketches with mismatched grids
raises, the same way HLL lg_k mismatches would. NULL values are
excluded before bucketing: ``n`` counts non-null values only (a NULL
has no bucket; silently folding it into bucket 0 would skew every
quantile low).

For columns whose value range ISN'T known up front (a standing
pipeline sketching a new column), see
:func:`histogram_sketch_auto` — it discovers exact bounds in one
extra aggregate and persists them in the sketch rows, so downstream
merge/quantile calls need no caller-supplied grid at all.
"""

from __future__ import annotations

from collections.abc import Sequence
from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _width(lo: int, hi: int, buckets: int) -> int:
    if hi <= lo or buckets <= 0:
        raise ValueError("need hi > lo and buckets > 0")
    return -((lo - hi - 1) // buckets)  # ceil((hi - lo + 1) / buckets)


def _rank_expr(q: float, n: Column) -> Column:
    """``ceil(q*n)`` in EXACT integer arithmetic: q becomes a rational
    num/den and the rank is ``(n*num + den - 1) div den`` — BIGINT all
    the way. The naive ``ceil(q * n)`` evaluates q as a double, and
    when q*n is mathematically an integer (n a multiple of 10 at
    q=0.9) the double product can land an ulp above it, making Spark's
    ceil disagree with DuckDB's exact-DECIMAL CEILING by one full
    rank. The oracle SQL mirrors this div form verbatim."""
    frac = Fraction(q).limit_denominator(1_000_000)
    num, den = frac.numerator, frac.denominator
    return (
        (n * F.lit(num) + F.lit(den - 1) - F.pmod(n * F.lit(num) + F.lit(den - 1), F.lit(den)))
        / F.lit(den)
    ).cast("long")


def _grid_cols(lo: int, hi: int, buckets: int) -> list[Column]:
    return [
        F.lit(int(lo)).cast("long").alias("grid_lo"),
        F.lit(int(hi)).cast("long").alias("grid_hi"),
        F.lit(int(buckets)).cast("long").alias("grid_buckets"),
    ]


def histogram_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo: int,
    hi: int,
    buckets: int = 64,
) -> DataFrame:
    """One histogram-sketch row per group: ``(…group_cols, n, v_min,
    v_max, counts, grid_lo, grid_hi, grid_buckets)`` where
    ``counts[i]`` is the EXACT number of non-null values in bucket
    ``i`` of the fixed grid (``width = ceil((hi-lo+1)/buckets)``;
    values outside [lo, hi] clamp into the edge buckets — their exact
    magnitude survives in v_min/v_max, and quantile reads EXTEND the
    edge-bucket bounds to v_min/v_max so the containment contract
    holds for them too). The grid constants are persisted in every row
    so merges and reads can enforce the grid contract, like lg_k for
    HLL sketches. NULL values are excluded — ``n`` counts non-null
    rows only."""
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
    per = (
        df.where(v.isNotNull())
        .groupBy(*group_cols, bucket.alias("__b"))
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.min(v).alias("__mn"),
            F.max(v).alias("__mx"),
        )
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
            *_grid_cols(lo, hi, buckets),
        )
    )


def histogram_sketch_auto(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    buckets: int = 64,
) -> DataFrame:
    """:func:`histogram_sketch` with DISCOVERED bounds — for a standing
    pipeline sketching a column whose range nobody knows up front. One
    exact global min/max aggregate (a 1-row broadcast, the same
    normalizer shape as layout.py::zorder_values) fixes the grid, and
    the bounds persist in the sketch rows like any other grid — so
    later deltas sketch against the SAME discovered grid by reading it
    back (:func:`sketch_grid`), keeping the exact-merge law intact.
    Degenerate single-value data widens hi by one unit so the grid
    stays valid. Returns the same schema as :func:`histogram_sketch`."""
    v = F.col(value_col).cast("long")
    row = (
        df.where(v.isNotNull())
        .agg(F.min(v).alias("lo"), F.max(v).alias("hi"))
        .collect()[0]
    )
    if row["lo"] is None:
        raise ValueError("cannot auto-bound a sketch over no non-null values")
    lo, hi = int(row["lo"]), int(row["hi"])
    if hi <= lo:
        hi = lo + 1
    return histogram_sketch(df, group_cols, value_col, lo, hi, buckets)


def sketch_grid(sketches: DataFrame) -> tuple[int, int, int]:
    """Read the persisted ``(lo, hi, buckets)`` grid off sketch rows —
    the handle a delta-sketching or quantile-reading job needs when
    the grid was discovered by :func:`histogram_sketch_auto`. Collects
    the distinct grid rows (sketch-scale, ≤ a handful by contract) and
    raises on a mixed store."""
    rows = (
        sketches.select("grid_lo", "grid_hi", "grid_buckets")
        .distinct()
        .collect()
    )
    if len(rows) != 1:
        raise ValueError(
            f"mixed sketch grids cannot be read as one: {rows}"
        )
    r = rows[0]
    return int(r["grid_lo"]), int(r["grid_hi"]), int(r["grid_buckets"])


def _grid_checked(guard: Column, value: Column) -> Column:
    # assert_true returns NULL when the guard holds and raises
    # otherwise; ADDING its coalesced-to-zero cast into an
    # always-selected output column keeps the check alive under both
    # column pruning and conditional simplification (a
    # when(c, v).otherwise(v) form gets collapsed by Catalyst and the
    # assert silently disappears — verified).
    return value + F.coalesce(F.assert_true(guard).cast("long"), F.lit(0))


def sketch_merge(
    sketches: DataFrame, group_cols: Sequence[str] = ()
) -> DataFrame:
    """Merge histogram-sketch ROWS into one row per (possibly coarser)
    ``group_cols`` grouping — or one global row with none. Counts sum
    element-wise, n sums, min/max fold, the grid columns carry through;
    the data the sketches summarize is never touched. Sketches built on
    DIFFERENT grids refuse to merge (execution-time error — summing
    counts across grids would be meaningless), enforcing the documented
    grid contract. Runs over the sketch frame only (posexplode of
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
    same_grid = (
        (F.min("grid_lo") == F.max("grid_lo"))
        & (F.min("grid_hi") == F.max("grid_hi"))
        & (F.min("grid_buckets") == F.max("grid_buckets"))
        & (F.min(F.size("counts")) == F.max("grid_buckets"))
        & (F.max(F.size("counts")) == F.max("grid_buckets"))
    )
    heads = (
        sketches.groupBy(*group_cols)
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.min("v_min").cast("long").alias("v_min"),
            F.max("v_max").cast("long").alias("v_max"),
            _grid_checked(same_grid, F.min("grid_lo").cast("long")).alias(
                "grid_lo"
            ),
            F.min("grid_hi").cast("long").alias("grid_hi"),
            F.min("grid_buckets").cast("long").alias("grid_buckets"),
        )
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
    order = [
        *group_cols, "n", "v_min", "v_max", "counts",
        "grid_lo", "grid_hi", "grid_buckets",
    ]
    if group_cols:
        return heads.join(folded, group_cols).select(*order)
    return heads.crossJoin(folded).select(*order)


def sketch_quantiles(
    sketches: DataFrame,
    lo: int,
    hi: int,
    buckets: int,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Quantile bounds from histogram-sketch rows, exactly: for each
    ``q`` the row gains ``q<pct>_lo`` / ``q<pct>_hi`` — bounds the
    rank-``ceil(q*n)`` value provably lies in (cumulative counts are
    exact integers and the rank itself is computed in integer
    arithmetic, so the bucket walk is deterministic and the DuckDB
    oracle replays it bit-for-bit). Interior buckets clamp their edges
    to the exact v_min/v_max; EDGE buckets extend to v_min (first) /
    v_max (last) instead, because clamped out-of-range values live
    there — so the containment contract holds even when the data
    spilled outside the grid. The passed grid must equal the one
    persisted in the rows (execution-time error otherwise). Pure
    expressions over the sketch rows."""
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
    grid_ok = (
        (F.col("grid_lo") == F.lit(int(lo)))
        & (F.col("grid_hi") == F.lit(int(hi)))
        & (F.col("grid_buckets") == F.lit(int(buckets)))
        & (F.size("counts") == F.lit(int(buckets)))
    )
    out = sketches.withColumn("__cum", cum)
    cols = list(keep_cols)
    sel = [F.col(c) for c in cols]
    sel.append(_grid_checked(grid_ok, F.col("n")).alias("n"))
    sel.extend([F.col("v_min"), F.col("v_max")])
    for q in qs:
        pct = f"p{round(q * 100)}"
        rank = _rank_expr(q, F.col("n"))
        pos = F.array_position(
            F.transform(F.col("__cum"), lambda c: c >= rank), True
        )
        sel.append(
            F.when(pos == 1, F.col("v_min"))
            .otherwise(
                F.greatest(
                    F.col("v_min"),
                    F.lit(lo) + (pos - 1) * F.lit(w),
                )
            )
            .cast("long")
            .alias(f"{pct}_lo")
        )
        sel.append(
            F.when(pos == b, F.col("v_max"))
            .otherwise(
                F.least(
                    F.col("v_max"),
                    F.lit(lo) + pos * F.lit(w) - 1,
                )
            )
            .cast("long")
            .alias(f"{pct}_hi")
        )
    return out.select(*sel)


# --- Log-grid (boundless) sketches ------------------------------------------

LOG_BUCKETS = 64  # bit-widths 1..63 of a non-negative BIGINT → buckets 0..62

# Sentinel grid marking a log₂ sketch in the persisted grid columns.
# hi < lo is impossible for any linear grid (histogram_sketch raises),
# so linear readers/mergers can never silently consume a log sketch:
# sketch_quantiles' grid guard fails and _width(0, -2, …) raises.
LOG_GRID = (0, -2, LOG_BUCKETS)


def histogram_sketch_log(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """BOUNDLESS mergeable sketch: bucket ``i`` holds the exact count of
    values with bit-width ``i+1`` (bucket 0 = {0, 1}; bucket i≥1 =
    [2^i, 2^(i+1)-1]). No caller-supplied bounds, no discovery pass —
    the grid is universal for non-negative BIGINTs, so ANY two log
    sketches merge (the unbounded-streaming case histogram_sketch_auto
    can't serve: its discovered grid is frozen at seed time, while a
    log sketch absorbs values of any future magnitude). The price is
    relative-error bounds (a bucket spans a power of two) instead of
    the linear grid's absolute width. Negative values raise at
    execution (the bit-width of a negative is meaningless here).

    Same schema and merge law as :func:`histogram_sketch` — counts are
    exact integers and :func:`sketch_merge` applies unchanged; the grid
    columns carry the :data:`LOG_GRID` sentinel. Bucketing is
    ``length(bin(v)) - 1``, an exact integer expression the DuckDB
    oracle replays verbatim (both engines print minimal binary).
    """
    group_cols = list(group_cols)
    v = F.col(value_col).cast("long")
    bucket = (F.length(F.bin(v)) - F.lit(1)).cast("long")
    per = (
        df.where(v.isNotNull())
        .groupBy(*group_cols, bucket.alias("__b"))
        .agg(
            F.count(F.lit(1)).alias("__c"),
            F.min(v).alias("__mn"),
            F.max(v).alias("__mx"),
        )
    )
    lo, hi, buckets = LOG_GRID
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
            # the negative guard rides the always-selected n column,
            # same keep-alive trick as _grid_checked
            _grid_checked(F.col("v_min") >= 0, F.col("n")).alias("n"),
            "v_min",
            "v_max",
            F.transform(
                F.sequence(F.lit(0), F.lit(buckets - 1)),
                lambda i: F.coalesce(
                    F.element_at("__m", i.cast("long")), F.lit(0)
                ).cast("long"),
            ).alias("counts"),
            *_grid_cols(lo, hi, buckets),
        )
    )


def sketch_quantiles_log(
    sketches: DataFrame,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Quantile bounds off log-grid sketch rows: the rank walk is the
    same exact-integer machinery as :func:`sketch_quantiles`; bucket
    ``i`` reports bounds [2^i, 2^(i+1)-1] (bucket 0: [0, 1]) clamped to
    the exact v_min/v_max. No edge-extension case exists — every
    non-negative BIGINT has a bucket, so nothing ever clamps out of
    range. Refuses rows whose persisted grid is not the LOG_GRID
    sentinel (execution-time error, mirroring the linear guard)."""
    lo, hi, buckets = LOG_GRID
    b = F.lit(buckets)
    cum = F.transform(
        F.sequence(F.lit(1), b),
        lambda i: F.aggregate(
            F.slice("counts", F.lit(1), i),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )
    grid_ok = (
        (F.col("grid_lo") == F.lit(lo))
        & (F.col("grid_hi") == F.lit(hi))
        & (F.col("grid_buckets") == F.lit(buckets))
        & (F.size("counts") == F.lit(buckets))
    )
    one = F.lit(1).cast("long")
    out = sketches.withColumn("__cum", cum)
    cols = list(keep_cols)
    sel = [F.col(c) for c in cols]
    sel.append(_grid_checked(grid_ok, F.col("n")).alias("n"))
    sel.extend([F.col("v_min"), F.col("v_max")])
    for q in qs:
        pct = f"p{round(q * 100)}"
        rank = _rank_expr(q, F.col("n"))
        pos = F.array_position(
            F.transform(F.col("__cum"), lambda c: c >= rank), True
        )
        i = (pos - 1).cast("int")  # 0-based bucket index
        # shiftleft's numBits must be a Column here (the bucket index
        # is data); the python helper only takes a literal int, so the
        # SQL function goes through call_function
        half = F.call_function("shiftleft", one, i)
        b_lo = F.when(pos == 1, F.lit(0).cast("long")).otherwise(half)
        # upper bound 2^(i+1)-1 formed as (2^i - 1) + 2^i: bucket 62
        # (values in [2^62, 2^63-1]) must not form 2^63, which overflows
        # BIGINT and throws under Spark 4's default ANSI mode
        b_hi = F.when(pos == 1, one).otherwise(half - one + half)
        sel.append(
            F.greatest(F.col("v_min"), b_lo).cast("long").alias(f"{pct}_lo")
        )
        sel.append(
            F.least(F.col("v_max"), b_hi).cast("long").alias(f"{pct}_hi")
        )
    return out.select(*sel)
