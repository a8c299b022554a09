#!/usr/bin/env python
"""Corpus-scale evidence for incremental Z-layout maintenance (§20).

§16 measures one-shot layout execution; this measures the r07
maintenance loop (operators/layout.py: zorder_append /
layout_maintenance_plan / zorder_compact_cells) at row counts where
the economics matter. A synthetic (x, y) fact table — x a hash-spread
key, y a time-like monotone day — is written as a Z-layout on the
first ``base_frac`` of time, then the tail arrives as an append batch:

* append wall vs full-rewrite wall (expectation: batch-share — the
  append is one map-side assignment + one hash exchange over the
  BATCH only, the rewrite re-shuffles everything),
* maintenance-plan wall (expectation: a metadata-shaped scan — no
  data column read),
* targeted-compaction wall vs full-rewrite wall (expectation:
  fragmented-cell-proportional — only directories the append touched
  are rewritten),
* conservation: per-cell row totals identical before/after
  compaction; every cell back to one file.

Usage::

    python tools/layout_scale_run.py --n 20000000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20_000_000)
    ap.add_argument("--days", type=int, default=2000)
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--base-frac", type=float, default=0.8)
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--file-bits", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--driver-mem", default="32g")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 4))
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_algorithms_spark.operators.layout import (
        layout_maintenance_plan,
        zorder_append,
        zorder_compact_cells,
        zorder_rewrite,
    )

    report: dict = {
        "n_rows": args.n,
        "days": args.days,
        "bits": args.bits,
        "file_bits": args.file_bits,
        "base_frac": args.base_frac,
    }

    # x: hash-spread key; y: monotone day (append arrives in time order)
    pts = spark.range(args.n).select(
        (F.xxhash64("id") % args.keys + args.keys).alias("x"),
        (F.col("id") * args.days / args.n).cast("long").alias("y"),
    )
    split_day = int(args.days * args.base_frac)
    base = pts.where(F.col("y") < split_day)
    batch = pts.where(F.col("y") >= split_day)
    report["batch_rows"] = batch.count()

    work = tempfile.mkdtemp(prefix="cdc_layout_scale_")
    store = os.path.join(work, "store")
    full = os.path.join(work, "full")
    try:
        # JIT warm-up: a small rewrite first, so the measured walls
        # compare like-for-like (the first large codegen job in a
        # session otherwise pays ~2.5-5x — see SCALING.md §19/§20)
        zorder_rewrite(
            pts.limit(100_000), "x", "y", os.path.join(work, "warm"),
            bits=args.bits, file_bits=args.file_bits,
        )
        t0 = time.monotonic()
        zorder_rewrite(
            base, "x", "y", store, bits=args.bits, file_bits=args.file_bits
        )
        report["base_rewrite_s"] = round(time.monotonic() - t0, 1)

        t0 = time.monotonic()
        zorder_append(batch, store)
        report["append_s"] = round(time.monotonic() - t0, 1)

        t0 = time.monotonic()
        plan = layout_maintenance_plan(spark, store).collect()
        report["maintenance_plan_s"] = round(time.monotonic() - t0, 1)
        flagged = [r["file_id"] for r in plan if r["needs_compaction"]]
        report["n_cells"] = len(plan)
        report["n_flagged"] = len(flagged)
        rows_before = {r["file_id"]: r["n_rows"] for r in plan}

        t0 = time.monotonic()
        zorder_compact_cells(spark, store, flagged)
        report["compact_s"] = round(time.monotonic() - t0, 1)

        after = layout_maintenance_plan(spark, store).collect()
        report["rows_conserved"] = (
            {r["file_id"]: r["n_rows"] for r in after} == rows_before
        )
        report["one_file_per_cell"] = all(r["n_files"] == 1 for r in after)

        # the economics baseline: a full rewrite over base ∪ batch
        t0 = time.monotonic()
        zorder_rewrite(
            pts, "x", "y", full, bits=args.bits, file_bits=args.file_bits
        )
        report["full_rewrite_s"] = round(time.monotonic() - t0, 1)

        print(json.dumps(report))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
