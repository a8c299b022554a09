"""Streaming change feed: per-source chunk-level diff between successive
document versions.

This is the delta-sync reading of CDC (SURVEY.md §7 M3): as new versions
of a document stream in, chunk each version, compare its chunk multiset
with the previous version's (kept as per-source operator state), and
emit one change record per version — inserted / deleted / unchanged
chunk counts and bytes, i.e. exactly what a dedup-aware replicator would
transfer. The batch twin is ``operators/diff.py::snapshot_diff_summary``
(full-outer join of two chunk tables); equality of the two is asserted
in tests/test_streaming.py.

State is one hash multiset per source — 8 bytes a chunk, the streaming
analogue of the reference's ``HashSet`` (ae.rs:69) scoped per document
and sharded by ``src_id`` across executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame

_OUT_SCHEMA = (
    "src_id long, version long, n_inserted long, n_deleted long, "
    "n_unchanged long, inserted_bytes long, change_ratio double"
)
# previous version's chunk hashes and their lengths (parallel arrays)
_STATE_SCHEMA = "hashes array<long>, lengths array<long>"


def _chunk_hashes(text: str, chunk_size: int) -> tuple[list[int], list[int]]:
    """Fixed chunks in CHARACTER units — the same grid as the batch
    ``fixed_chunks`` (substring semantics) and the DuckDB oracle; a
    byte-unit grid would only agree on pure-ASCII text. Hash identity is
    over the chunk's UTF-8 bytes; lengths are char counts."""
    hashes, lengths = [], []
    for off in range(0, len(text), chunk_size):
        piece = text[off : off + chunk_size]
        h = int.from_bytes(
            hashlib.blake2b(piece.encode("utf-8"), digest_size=8).digest(),
            "big",
            signed=True,
        )
        hashes.append(h)
        lengths.append(len(piece))
    return hashes, lengths


def chunk_change_feed(
    versions_stream: DataFrame,
    chunk_size: int = 64,
) -> DataFrame:
    """Change feed over ``(src_id, version, text)`` rows.

    Emits one row per observed version (the first version of a source
    reports everything inserted). Diff semantics match the batch
    snapshot diff: multiset intersection on chunk identity —
    ``n_unchanged`` counts chunks present in both versions (min of the
    two multiplicities), and ``change_ratio`` = inserted_bytes /
    new_version_bytes.
    """

    def feed(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: "GroupState",
    ) -> Iterator["pd.DataFrame"]:
        from collections import Counter

        import pandas as pd

        src_id = int(key[0])
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("version")

        if state.exists:
            prev_h, prev_l = state.get
            prev = Counter(zip(prev_h, prev_l))
        else:
            prev = Counter()

        out = []
        last: tuple[list[int], list[int]] | None = None
        for _, r in rows.iterrows():
            hashes, lengths = _chunk_hashes(r["text"] or "", chunk_size)
            cur = Counter(zip(hashes, lengths))
            unchanged = cur & prev
            inserted = cur - prev
            deleted = prev - cur
            new_bytes = sum(l * c for (_, l), c in cur.items()) or 1
            ins_bytes = sum(l * c for (_, l), c in inserted.items())
            out.append(
                (
                    src_id,
                    int(r["version"]),
                    sum(inserted.values()),
                    sum(deleted.values()),
                    sum(unchanged.values()),
                    ins_bytes,
                    round(ins_bytes / new_bytes, 6),
                )
            )
            prev = cur
            last = (hashes, lengths)

        if last is not None:
            state.update(last)
        yield pd.DataFrame(
            out,
            columns=[
                "src_id",
                "version",
                "n_inserted",
                "n_deleted",
                "n_unchanged",
                "inserted_bytes",
                "change_ratio",
            ],
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return versions_stream.groupBy("src_id").applyInPandasWithState(
        feed,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
