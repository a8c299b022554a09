#!/usr/bin/env python
"""A/B the load_table(spread=True) sites against the same query with
spread disabled (SPARK_GRAFT_NO_SPREAD), in ONE session, interleaved,
min-of-N count() — the bench's own methodology (VERDICT r11 task 1:
re-adjudicate the spread keep/revert decisions with driver-grade
measurements on a quiet host; the r11 session's A/Bs ran under ~1.2x
host load and half the keeps did not replicate on the driver).

Usage: python tools/ab_spread.py [--runs 5] [--sf-dir DIR] [query...]
Prints one line per (query, arm) with min/median wall, then a verdict.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPREAD_QUERIES = [
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "doc_fingerprints",
    "dedup_components",
    "repetition_ratios",
    "curation_pipeline",
    "benchmark_decontamination",
    "dedup_cluster_reps",
    "quality_band_by_lang",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*", default=None)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    names = args.queries or SPREAD_QUERIES

    from cdc_algorithms_spark.queries import SPARK_QUERIES
    from cdc_algorithms_spark.session import get_spark
    from cdc_algorithms_spark.sources import registry

    spark = get_spark("ab-spread")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    def timed(name: str, no_spread: bool) -> float:
        if no_spread:
            os.environ["SPARK_GRAFT_NO_SPREAD"] = "1"
        else:
            os.environ.pop("SPARK_GRAFT_NO_SPREAD", None)
        # the env is read at construction; drop cached plans so the
        # toggle actually takes effect for this construction
        registry._TABLE_PLAN_CACHE.clear()
        fn = SPARK_QUERIES[name]
        t0 = time.monotonic()
        fn(spark, args.sf_dir).count()
        return time.monotonic() - t0

    results = {}
    for name in names:
        # warm both arms once (JIT, parquet footers)
        timed(name, False)
        timed(name, True)
        on, off = [], []
        for _ in range(args.runs):  # interleave to cancel drift
            on.append(timed(name, False))
            off.append(timed(name, True))
        results[name] = (on, off)
        print(
            f"{name:32s} cores={cores} spread_on  min={min(on):.3f} "
            f"med={statistics.median(on):.3f} | spread_off min={min(off):.3f} "
            f"med={statistics.median(off):.3f} -> "
            f"{'KEEP' if min(on) < min(off) else 'REVERT'}",
            flush=True,
        )
    os.environ.pop("SPARK_GRAFT_NO_SPREAD", None)
    spark.stop()


if __name__ == "__main__":
    main()
