#!/usr/bin/env python
"""Regenerate bench.py's BASELINE_SF01 pins from scripted measurements.

ADVICE r03 flagged hand-edited pin constants as unauditable: a pin that
changes in the same commit as the plan it measures weakens regression
detection. This tool is the sanctioned path — it runs ``bench.py`` N
times as a subprocess (fresh JVM each run, the same way the driver runs
it), takes the per-query MEDIAN, and rewrites the BASELINE_SF01 block in
place, leaving the raw run outputs beside it for diffing.

Usage::

    python tools/repin_bench.py              # 3 runs at sf0.1, print diff
    python tools/repin_bench.py --write      # also rewrite bench.py
    python tools/repin_bench.py --runs 5

Raw per-run JSON lines are written to ``BENCH_REPIN_RAW.jsonl`` so the
commit that re-pins carries the evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str) -> dict:
    """One full bench.py run; results read from BENCH_LOCAL.json.

    NOT from stdout: the stdout contract line is deliberately truncated
    to fit the driver's 2000-byte artifact window (bench.py shrinks to
    1-decimal values past 1950 bytes and DROPS the per-query map past
    1990) — parsing it would silently degrade or wipe the pins as the
    headline set grows. BENCH_LOCAL.json is the full-precision copy
    bench.py writes for exactly this kind of consumer."""
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=ROOT,
    )
    with open(os.path.join(ROOT, "BENCH_LOCAL.json")) as f:
        payload = json.load(f)
    if not payload.get("queries"):
        sys.exit("BENCH_LOCAL.json has no per-query timings — aborting")
    return payload


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--write", action="store_true",
                    help="rewrite BOTH wall and CPU pin blocks")
    ap.add_argument("--write-cpu", action="store_true",
                    help="rewrite ONLY BASELINE_CPU_SF01 (leave the wall "
                         "pins — and the judge's 2x bands — untouched)")
    args = ap.parse_args()

    runs = []
    for i in range(args.runs):
        r = run_bench(args.sf_dir)
        runs.append(r)
        print(f"run {i + 1}/{args.runs}: total {r['value']}s", flush=True)

    with open(os.path.join(ROOT, "BENCH_REPIN_RAW.jsonl"), "w") as f:
        for r in runs:
            f.write(json.dumps(r) + "\n")

    names = runs[0]["queries"].keys()
    medians = {
        q: round(statistics.median(r["queries"][q] for r in runs), 2)
        for q in names
    }

    bench_path = os.path.join(ROOT, "bench.py")
    src = open(bench_path).read()
    m = re.search(r"BASELINE_SF01 = \{.*?\n\}", src, re.S)
    if not m:
        sys.exit("BASELINE_SF01 block not found in bench.py")
    olds: dict[str, float] = {}
    for q, v in re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', m.group(0)):
        olds[q] = float(v)

    print(f"\n{'query':32} {'old pin':>8} {'median':>8}")
    changed = 0
    for q in sorted(medians):
        old = olds.get(q)
        if old is None or abs(old - medians[q]) >= 0.05:
            print(f"{q:32} {old if old is not None else '-':>8} {medians[q]:8.2f}")
            changed += 1
    print(f"{changed} pins differ by >=0.05s (of {len(medians)} measured)")

    if args.write:
        body = "".join(
            f'    "{q}": {medians[q]:.2f},\n' for q in runs[0]["queries"]
        )
        block = (
            "BASELINE_SF01 = {\n"
            + body
            + "}"
        )
        src = src[: m.start()] + block + src[m.end():]
        open(bench_path, "w").write(src)
        print("bench.py BASELINE_SF01 rewritten "
              f"(median of {args.runs} runs at {args.sf_dir})")

    if args.write or args.write_cpu:
        # CPU medians come from the same raw runs (bench.py's "cpu"
        # map, present since r08)
        if not all(r.get("cpu") for r in runs):
            sys.exit("runs carry no per-query cpu map — old bench.py?")
        cpu_medians = {
            q: round(statistics.median(r["cpu"][q] for r in runs), 2)
            for q in runs[0]["cpu"]
        }
        src = open(bench_path).read()
        mc = re.search(
            r"BASELINE_CPU_SF01: dict\[str, float\] = \{.*?\}", src, re.S
        )
        if not mc:
            sys.exit("BASELINE_CPU_SF01 block not found in bench.py")
        cbody = "".join(
            f'    "{q}": {cpu_medians[q]:.2f},\n' for q in runs[0]["cpu"]
        )
        cblock = "BASELINE_CPU_SF01: dict[str, float] = {\n" + cbody + "}"
        src = src[: mc.start()] + cblock + src[mc.end():]
        open(bench_path, "w").write(src)
        print("bench.py BASELINE_CPU_SF01 rewritten "
              f"(median of {args.runs} runs at {args.sf_dir})")


if __name__ == "__main__":
    main()
