"""Table profiling: one-pass per-column data-quality summary.

A corpus-curation engine needs to answer "what is in this table" before
anything else touches it: row count, per-column null fraction, distinct
cardinality, and value range. This is the operator behind ingest
validation and drift checks between corpus snapshots.

Shape: ONE aggregation producing a wide row, then an unpivot to the
long ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``
format — so the source is scanned exactly once however many columns are
profiled.

Scale note: ``exact=True`` uses ``count(DISTINCT col)`` per column,
which compiles to an Expand (one duplicated scan row per profiled
column before the shuffle) — fine for validation-sized tables and
required for DuckDB-oracle parity. The default ``exact=False`` uses
``approx_count_distinct`` (HLL++, fixed-size sketch, no Expand), the
right choice at 100 TB where ±2% cardinality is plenty for drift
detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """Long-format profile of ``columns`` (default: all) — see module
    docstring. min/max are stringified so one schema fits all column
    types."""
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns {missing}; have {df.columns}")
    distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            distinct(c).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nulls_{c}").cast("long").alias("n_nulls"),
                F.col(f"__dist_{c}").cast("long").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(
        F.col("__n").cast("long").alias("n_rows"), F.explode(per_col).alias("p")
    ).select(
        F.col("p.column").alias("column"),
        "n_rows",
        F.col("p.n_nulls").alias("n_nulls"),
        F.col("p.n_distinct").alias("n_distinct"),
        F.col("p.min_value").alias("min_value"),
        F.col("p.max_value").alias("max_value"),
    )


def value_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    sigma: float = 3.0,
) -> DataFrame:
    """Per-group z-score outlier detection with order-independent math.

    Flags rows whose ``value_col`` deviates from the group mean by more
    than ``sigma`` population standard deviations — the drift/anomaly
    screen that runs over ingest batches before they join the corpus.

    Determinism note (why not ``stddev_pop`` directly): float SUM/AVG
    depend on partial-aggregation merge order, so a value sitting near
    the sigma boundary could flip between runs and against the DuckDB
    oracle. Instead the moments are accumulated as DECIMAL (exact,
    order-independent on both engines), converted to double once, and
    the mean/variance/z arithmetic is a fixed expression tree — every
    run and both engines compute bit-identical z-scores.

    Scale design: one hash aggregate to the per-group moment table
    (rows = group cardinality), broadcast back over the stream — the
    detail scan is map-only, no second shuffle.
    """
    return outlier_screen(
        df, outlier_moments(df, group_col, value_col), group_col, value_col, sigma
    )


def outlier_moments(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group (n, sum, sum-of-squares) with DECIMAL accumulation —
    the exact, merge-order-independent moment table ``outlier_screen``
    probes. Split out so a stream can be screened against moments from
    a static corpus (stream-static drift screen).

    Domain contract: values must fit decimal(18,6) (|v| < 1e12) and the
    per-group sum of squares must fit decimal(38,12) (~1e26). Under
    this session's ANSI mode a breach RAISES (cast/sum overflow) rather
    than silently skewing the screen; for non-ANSI embedders ``__n``
    counts the same cast expression as the sums so a NULL-ed cast can
    never be counted in n but dropped from s1/s2."""
    dec = F.col(value_col).cast("decimal(18,6)")
    return df.groupBy(group_col).agg(
        F.count(dec).cast("double").alias("__n"),
        F.sum(dec).cast("double").alias("__s1"),
        F.sum(dec * dec).cast("double").alias("__s2"),
    )


def outlier_screen(
    df: DataFrame,
    stats: DataFrame,
    group_col: str,
    value_col: str,
    sigma: float = 3.0,
) -> DataFrame:
    """Map-only screen: broadcast-join ``stats`` (from
    ``outlier_moments``) and keep rows beyond ``sigma`` deviations.
    Works identically on batch frames and streams (stateless)."""
    mean = F.col("__s1") / F.col("__n")
    var = F.col("__s2") / F.col("__n") - mean * mean
    enriched = df.join(F.broadcast(stats), group_col).withColumn(
        "__z",
        (F.col(value_col).cast("double") - mean) / F.sqrt(var),
    )
    # var > 0 guard: in a constant group z is 0/0 = NaN, and BOTH Spark
    # and DuckDB order NaN above every number — without the guard an
    # all-constant group would flag every row.
    return enriched.where(
        (var > F.lit(0.0)) & (F.abs(F.col("__z")) > F.lit(float(sigma)))
    ).select(*df.columns, F.round("__z", 4).alias("z_score"))
