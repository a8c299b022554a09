"""Local replica of the driver's DuckDB-oracle comparison (SURVEY.md §5).

Runs a registered Spark query and its oracle SQL side-by-side and
asserts row-count / column-name / value equality (order-insensitive,
columns sorted by name) — so mismatches surface in pytest before the
driver's CORRECTNESS gate does.
"""

from __future__ import annotations

import math
import os

import duckdb

from cdc_algorithms_spark.sources.registry import TABLES

_REL_TOL = 1e-9


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def compare_with_oracle(spark, name: str, sf_dir: str) -> None:
    from cdc_algorithms_spark.queries import ORACLE_SQL, SPARK_QUERIES

    sdf = SPARK_QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    con = duckdb_con(sf_dir)
    ores = con.execute(ORACLE_SQL[name])
    ocols = [d[0] for d in ores.description]
    orows = [tuple(r) for r in ores.fetchall()]
    con.close()

    assert sorted(scols) == sorted(ocols), f"{name}: columns {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} vs {len(orows)}"

    _, s_norm = _norm_rows(scols, srows)
    _, o_norm = _norm_rows(ocols, orows)
    mismatches = [
        (a, b) for a, b in zip(s_norm, o_norm) if not _rows_close(a, b)
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows, first: {mismatches[0]}"


def _rows_close(a, b) -> bool:
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if not math.isclose(x, y, rel_tol=_REL_TOL, abs_tol=1e-9):
                return False
        elif x != y:
            return False
    return True
