"""Deterministic synthetic blob source — executor-side generation.

Node-throughput benchmarking needs input far bigger than the fixture
corpus (1.5 MB of documents measures Spark overhead, not the chunkers).
This source materializes a multi-hundred-MiB logical blob WITHOUT the
driver or any single task ever holding it: each task generates its own
segments from a seeded counter-based RNG, directly in the
(src_id, seg_idx, left, right, blob_len, scan_start, payload) schema
that ``operators/distributed.py::chunk_segments`` consumes. That is the
100 TB ingest shape — content arrives pre-segmented at the executors,
the whole-blob view exists only logically.

Determinism: byte b of the blob depends only on its 1 MiB-aligned block
index and the seed, so overlapping segments agree on shared bytes and
reruns are bit-identical. Block seeds cycle through a small pool
(``pool``), planting real duplicate content for the dedup pipeline to
find — a known lower bound on the dedup coefficient.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

BLOCK = 1 << 20  # 1 MiB generation granularity

_SCHEMA = (
    "src_id long, seg_idx long, left long, right long, blob_len long, "
    "scan_start long, payload binary"
)


def synthetic_blob_segments(
    spark: SparkSession,
    total_len: int,
    segment_len: int,
    overlap: int,
    seed: int = 0,
    pool: int = 37,
) -> DataFrame:
    """One logical blob of ``total_len`` bytes as a segment table with
    ``overlap`` warm-up bytes, generated in parallel on executors.
    ``total_len == 0`` returns an empty segment table (zero-row
    contract); bad geometry raises up front."""
    import math

    if segment_len <= 0 or overlap < 0 or total_len < 0:
        raise ValueError(
            f"bad geometry: total_len={total_len} segment_len={segment_len} "
            f"overlap={overlap}"
        )
    n_segs = math.ceil(total_len / segment_len)
    if n_segs == 0:
        return spark.createDataFrame([], _SCHEMA)

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        # Block content depends only on (seed, block_idx % pool) — at most
        # ``pool`` distinct MiB exist, so memoize per task: generation cost
        # is O(pool) RNG draws + memcpy, not O(blob bytes) RNG draws
        # (measured 4× on a 256 MiB blob).
        block_cache: dict[int, "np.ndarray"] = {}

        def block_bytes(block_idx: int) -> "np.ndarray":
            key = block_idx % pool
            arr = block_cache.get(key)
            if arr is None:
                rng = np.random.default_rng(seed * 1_000_003 + key)
                arr = rng.integers(0, 256, BLOCK, dtype=np.uint8)
                block_cache[key] = arr
            return arr

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                left = int(i) * segment_len
                right = min(left + segment_len, total_len)
                scan_start = max(left - overlap, 0)
                parts = [
                    block_bytes(b)[
                        max(scan_start - b * BLOCK, 0) : min(
                            right - b * BLOCK, BLOCK
                        )
                    ]
                    for b in range(scan_start // BLOCK, (right - 1) // BLOCK + 1)
                ]
                rows.append(
                    (
                        0,
                        int(i),
                        left,
                        right,
                        total_len,
                        scan_start,
                        np.concatenate(parts).tobytes(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "src_id",
                    "seg_idx",
                    "left",
                    "right",
                    "blob_len",
                    "scan_start",
                    "payload",
                ],
            )

    # one segment per task slice: repartition the index range so every
    # core generates and scans its own share
    idx = spark.range(n_segs).repartition(min(n_segs, 64))
    return idx.mapInPandas(gen, _SCHEMA)
