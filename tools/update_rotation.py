#!/usr/bin/env python
"""Regenerate the driver-verification rotation in queries.py.

Reads every ``CORRECTNESS_r*.json`` in the repo root, computes which
queries have a green driver row (``hash_match: true``), and rebuilds:

* ``_DRIVER_GREEN`` — all names ever hash-green;
* ``_VERIFY_WINDOW`` — the next 50 oracle-backed queries needing a
  driver row: latest-round failures first (their fixes must re-verify),
  then the never-green backlog in current registry order.

Usage::

    python tools/update_rotation.py           # print the two blocks
    python tools/update_rotation.py --write   # rewrite queries.py in place

Run at the START of a round, after reading the new CORRECTNESS file.
``tests/test_api.py::test_verify_window_composition`` pins the result.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

WINDOW = 50


def main() -> None:
    from cdc_algorithms_spark.queries import ORACLE_SQL, SPARK_QUERIES

    files = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    if not files:
        sys.exit("no CORRECTNESS_r*.json found")
    green: set[str] = set()
    latest_bad: list[str] = []
    for path in files:
        data = json.load(open(path))
        green |= {n for n, row in data.items() if row.get("hash_match") is True}
        latest_bad = [
            n
            for n, row in data.items()
            if n in ORACLE_SQL
            and (row.get("err") or row.get("hash_match") is False)
        ]
    green &= set(SPARK_QUERIES)

    window: list[str] = [n for n in latest_bad if n in SPARK_QUERIES]
    for n in SPARK_QUERIES:  # current order = previous window + backlog
        if len(window) >= WINDOW:
            break
        if n in ORACLE_SQL and n not in green and n not in window:
            window.append(n)
    # top up with already-green names if fewer than 50 need verification
    for n in SPARK_QUERIES:
        if len(window) >= WINDOW:
            break
        if n in ORACLE_SQL and n not in window:
            window.append(n)

    green_block = "_DRIVER_GREEN: frozenset[str] = frozenset({\n" + "".join(
        f'    "{n}",\n' for n in sorted(green)
    ) + "})"
    window_block = "_VERIFY_WINDOW: list[str] = [\n" + "".join(
        f'    "{n}",\n' for n in window
    ) + "]"

    if "--write" in sys.argv:
        qpath = os.path.join(ROOT, "cdc_algorithms_spark", "queries.py")
        src = open(qpath).read()
        src = re.sub(
            r"_DRIVER_GREEN: frozenset\[str\] = frozenset\(\{.*?\}\)",
            green_block,
            src,
            count=1,
            flags=re.S,
        )
        src = re.sub(
            r"_VERIFY_WINDOW: list\[str\] = \[.*?\n\]",
            window_block,
            src,
            count=1,
            flags=re.S,
        )
        open(qpath, "w").write(src)
        print(f"queries.py rewritten: {len(green)} green, window {len(window)}")
    else:
        print(green_block)
        print()
        print(window_block)


if __name__ == "__main__":
    main()
