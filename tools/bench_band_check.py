#!/usr/bin/env python
"""Classify bench drift as load-noise vs regression (the r08 de-noise).

Reads BENCH_LOCAL.json (bench.py's full-precision output) and judges
each headline query against TWO pinned bands:

* wall vs ``2 x BASELINE_SF01`` — the driver's contract line, kept;
* process CPU vs ``--cpu-band`` (default 2.0 — measured single-run
  spread on small queries reaches ~1.9x a median-of-3 pin even with a
  healthy 1.05x global total, so the per-query band must clear
  single-run noise; 2.0 also matches the wall contract's own
  multiplier) x ``BASELINE_CPU_SF01``
  — the load-insensitive signal: another tenant's pressure stretches
  wall but cannot add CPU to our JVM, so

  - ``cpu over band``                      → REGRESSION (real work grew),
  - ``wall over band, cpu inside``         → load-noise (documented
    shared-VM failure mode, BASELINE.md:90),
  - both inside                            → ok.

Exit code 1 iff any REGRESSION. Queries without a CPU pin fall back to
the wall band alone (classified conservatively as REGRESSION when
over). Usage::

    python bench.py && python tools/bench_band_check.py
    python tools/bench_band_check.py --json path/to/BENCH_LOCAL.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=os.path.join(ROOT, "BENCH_LOCAL.json"))
    ap.add_argument("--wall-band", type=float, default=2.0)
    ap.add_argument("--cpu-band", type=float, default=2.0)
    args = ap.parse_args()

    with open(args.json) as f:
        payload = json.load(f)
    walls = payload.get("queries") or {}
    cpus = payload.get("cpu") or {}
    if abs(payload.get("sf", -1) - 0.1) > 1e-9:
        sys.exit("pins are sf0.1 — run bench.py at the default SF first")

    regressions, noise = [], []
    print(f"{'query':34} {'wall':>7} {'band':>7} {'cpu':>7} {'band':>7}  verdict")
    for q, w in walls.items():
        wp = bench.BASELINE_SF01.get(q)
        cp = bench.BASELINE_CPU_SF01.get(q)
        c = cpus.get(q)
        wall_over = wp is not None and w > args.wall_band * wp
        cpu_over = (
            cp is not None and c is not None and c > args.cpu_band * cp
        )
        if cpu_over or (wall_over and cp is None):
            verdict = "REGRESSION"
            regressions.append(q)
        elif wall_over:
            verdict = "load-noise"
            noise.append(q)
        else:
            verdict = "ok"
        if verdict != "ok":
            print(
                f"{q:34} {w:7.2f} {args.wall_band * (wp or 0):7.2f}"
                f" {c if c is not None else float('nan'):7.2f}"
                f" {args.cpu_band * cp if cp else float('nan'):7.2f}"
                f"  {verdict}"
            )
    print(
        json.dumps(
            {
                "checked": len(walls),
                "regressions": regressions,
                "load_noise": noise,
                "cpu_pinned": sum(
                    1 for q in walls if q in bench.BASELINE_CPU_SF01
                ),
            }
        )
    )
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
