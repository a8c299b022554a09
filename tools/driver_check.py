#!/usr/bin/env python
"""Strict local replica of the external driver's CORRECTNESS gate.

The driver (per the CORRECTNESS_r01 traceback) canonicalizes both the
Spark result and the DuckDB oracle result as pandas frames — columns
sorted by name, rows sorted by value — and compares an exact value hash.
That is STRICTER than tests/oracle.py (which allows 1e-9 float
tolerance): a last-ulp rounding difference that pytest tolerates still
flips the driver hash (part_metrics_unpivot, r01).

This tool replays that strict compare for the first N registry entries
(the driver's verification window) at sf0.01 so hash drift is caught
before the round gate. Usage:

    python tools/driver_check.py [--n 50] [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Mirror the driver's canonicalization as closely as we can infer:
    sort columns by name, then sort rows by all columns (this is where
    the driver's pandas lexsort chokes on list cells — we surface that
    as an explicit 'unhashable' error, same as the driver would)."""
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _cell_exact(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def _max_float_diff(sdf: pd.DataFrame, odf: pd.DataFrame):
    worst = 0.0
    where = None
    for c in sdf.columns:
        for i, (a, b) in enumerate(zip(sdf[c], odf[c])):
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) or math.isnan(b):
                    if math.isnan(a) != math.isnan(b):
                        return float("inf"), (c, i, a, b)
                    continue
                d = abs(a - b)
                if d > worst:
                    worst, where = d, (c, i, a, b)
            elif not _cell_exact(a, b):
                return float("inf"), (c, i, a, b)
    return worst, where


def check_one(spark, con, name: str, sf_dir: str) -> dict:
    from cdc_algorithms_spark.queries import ORACLE_SQL, SPARK_QUERIES

    out = {"name": name}
    t0 = time.time()
    try:
        sdf_spark = SPARK_QUERIES[name](spark, sf_dir)
        spdf = sdf_spark.toPandas()
    except Exception:
        out["err"] = "spark: " + traceback.format_exc(limit=3)
        return out
    if name not in ORACLE_SQL:
        out["status"] = "no_oracle"
        out["spark_rows"] = len(spdf)
        out["sec"] = round(time.time() - t0, 2)
        return out
    try:
        opdf = con.execute(ORACLE_SQL[name]).df()
    except Exception:
        out["err"] = "oracle: " + traceback.format_exc(limit=3)
        return out

    out["spark_rows"], out["oracle_rows"] = len(spdf), len(opdf)
    out["rows_match"] = len(spdf) == len(opdf)
    out["schema_match"] = sorted(spdf.columns) == sorted(opdf.columns)
    if not out["rows_match"] or not out["schema_match"]:
        out["status"] = "FAIL"
        out["detail"] = f"cols spark={sorted(spdf.columns)} oracle={sorted(opdf.columns)}"
        return out

    # list-typed cells → the driver's canonicalizer raises (r01 price_quantiles)
    import numpy as np

    for c in spdf.columns:
        sample = [v for v in spdf[c].head(5) if v is not None]
        if sample and isinstance(sample[0], (list, dict, set, np.ndarray)):
            out["status"] = "UNHASHABLE"
            out["detail"] = f"column {c} holds {type(sample[0]).__name__} cells"
            return out

    try:
        s_c, o_c = _canon(spdf), _canon(opdf)
    except TypeError as e:
        out["status"] = "UNHASHABLE"
        out["detail"] = str(e)
        return out

    worst, where = _max_float_diff(s_c, o_c)
    out["sec"] = round(time.time() - t0, 2)
    if worst == 0.0:
        out["status"] = "pass"
    elif worst == float("inf"):
        out["status"] = "FAIL"
        out["detail"] = f"non-float mismatch at {where}"
    else:
        out["status"] = "FLOAT_DIFF"
        out["detail"] = f"max |diff| {worst:.3e} at col={where[0]} row={where[1]}: {where[2]!r} vs {where[3]!r}"
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    # default covers the WHOLE registry: a sweep artifact produced by a
    # bare invocation must never silently truncate to a window's worth
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from cdc_algorithms_spark.queries import SPARK_QUERIES
    from cdc_algorithms_spark.session import get_spark
    from tests.oracle import duckdb_con

    names = args.names or list(SPARK_QUERIES)[: args.n]
    spark = get_spark("driver-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_con(args.sf_dir)

    from cdc_algorithms_spark.operators.dedup_docs import release_cached_frames

    n_bad = 0
    for name in names:
        r = check_one(spark, con, name, args.sf_dir)
        # dedup operators persist plan-feeding frames; reclaim between
        # queries so a 147-query sweep doesn't accumulate cache blocks
        release_cached_frames()
        status = r.get("status", "ERR")
        line = f"{status:>10}  {name}"
        if "sec" in r:
            line += f"  ({r['sec']}s)"
        if r.get("detail"):
            line += f"\n            {r['detail']}"
        if r.get("err"):
            line += f"\n{r['err']}"
        if status not in ("pass", "no_oracle"):
            n_bad += 1
        print(line, flush=True)
    print(f"\n{len(names)} checked, {n_bad} problems")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
