#!/usr/bin/env python
"""Dump .explain('formatted') for headline (or named) queries to
plans/r11/<name>_<suffix>.txt — the judge-checkable plan evidence
(guide §1: capture plan shape before and after every change)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from cdc_algorithms_spark.queries import SPARK_QUERIES
    from cdc_algorithms_spark.session import get_spark
    from bench import HEADLINE

    spark = get_spark("cdc-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    names = args.names or HEADLINE
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", "r11")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = SPARK_QUERIES[name](spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR building plan: {exc}"
        with open(os.path.join(outdir, f"{name}_{args.suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else plan[:120])
    spark.stop()


if __name__ == "__main__":
    main()
