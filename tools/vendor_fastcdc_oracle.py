#!/usr/bin/env python
"""Vendor a published-implementation FastCDC cut-list oracle.

The reference validates its FastCDC against the published ``fastcdc``
crate (tests.rs:13-27, Cargo.toml:10). The equivalent cross-
implementation gate here needs the published ``fastcdc`` PyPI package's
actual output — its gear table is 256 opaque constants that exist only
in the package source, so the cut-list must be computed ONCE in an
environment that has the package (this build container has neither the
package nor network) and vendored as a fixture.

Run wherever ``pip install fastcdc`` works::

    python tools/vendor_fastcdc_oracle.py

writes ``tests/fixtures/fastcdc_published_cuts.json``; from then on
``tests/test_chunkers_core.py::test_fastcdc_crosscheck_published_package``
asserts against the vendored list unconditionally (no importorskip).
The fixture records the package version so drift in the published
implementation is visible.

The input data is the same deterministic PRNG stream the test rebuilds
(``random.Random(seed)`` bytes) — nothing binary is vendored.
"""

from __future__ import annotations

import json
import os
import random

CASES = [
    # (seed, n_bytes, n) with min/avg/max = n*256 / n*1024 / n*8192,
    # the reference's published-crate parameterization (tests.rs:15-20).
    (3, 1 << 20, 4),
    (7, 1 << 19, 2),
    (11, 1 << 20, 8),
]


def main() -> None:
    import fastcdc  # the published package — the whole point

    out = {"package_version": getattr(fastcdc, "__version__", "unknown"), "cases": []}
    for seed, n_bytes, n in CASES:
        rng = random.Random(seed)
        data = bytes(rng.randrange(256) for _ in range(n_bytes))
        lens = [
            c.length
            for c in fastcdc.fastcdc(data, n * 256, n * 1024, n * 8192)
        ]
        out["cases"].append(
            {"seed": seed, "n_bytes": n_bytes, "n": n, "lengths": lens}
        )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "fastcdc_published_cuts.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {len(out['cases'])} cases")


if __name__ == "__main__":
    main()
