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
