"""Stateful streaming CDC chunker — the reference's incremental pull API
restated as ``applyInPandasWithState``.

The reference's ``next_chunk`` carries unconsumed bytes between calls in
``self.buffer``/``self.buffered`` (fastcdc.rs:51-52, 113-120; ae.rs:16-17,
128-136; rabin.rs:36-37). Here that carry-over is per-source operator
state managed by Spark: each micro-batch appends new content, completed
chunks are emitted exactly once, and the unchunked tail waits in state
for the next batch.

Correctness argument (why withholding only the *final* cut is exact):
every cut decision in AE/Rabin/FastCDC depends only on bytes at or
before the cut, and chunker state resets after each cut (rabin.rs:76-83;
ae.rs:128-136). So interior cuts over a prefix are identical to the same
cuts over the full stream, and re-running the chunker on
``tail + next_bytes`` continues exactly where a sequential scan would
have. The only non-final artifact is the end-of-data cut, which we
withhold until EOF.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame

from cdc_algorithms_spark.chunkers import ae_cuts, fastcdc_cuts, rabin_cuts
from cdc_algorithms_spark.chunkers.params import make_params
from cdc_algorithms_spark.operators.chunking import CHUNK_SCHEMA

_CUT_FNS = {"ae": ae_cuts, "rabin": rabin_cuts, "fastcdc": fastcdc_cuts}

# (unchunked tail, absolute offset of its first byte, next chunk index).
# The tail is BINARY, not string: a CDC cut can land mid-UTF-8-sequence,
# and round-tripping the split tail through a replace-decode would swap
# the dangling continuation bytes for U+FFFD — shifting every subsequent
# cut position vs the batch chunker. Raw bytes round-trip exactly.
_STATE_SCHEMA = "buf binary, next_offset long, next_idx long"


def stateful_cdc_chunks(
    docs_stream: DataFrame,
    algo: str,
    expected_size: int,
    seed: int = 0,
    window_size: int | None = None,
) -> DataFrame:
    """Chunk an append stream of ``(src_id, seq, text, eof)`` rows.

    ``seq`` orders fragments within a micro-batch; ``eof=true`` flushes
    the tail as the final chunk and clears the group's state. Output is
    the standard chunk schema — identical rows to batch ``cdc_chunks``
    over the concatenated content (asserted in tests/test_streaming.py).

    Scale posture: state is one string per in-flight source, sharded by
    ``src_id`` across executors; emitted chunks leave state immediately,
    so memory tracks the un-cut tail (≤ max_size for Rabin/FastCDC), not
    the stream length. AE has no max-size clamp (ae.rs:95-149), so a
    pathological monotone byte source grows its tail unboundedly — same
    behavior as the reference.
    """
    if algo not in _CUT_FNS:
        raise ValueError(f"unknown CDC algo {algo!r}; one of {sorted(_CUT_FNS)}")
    params = make_params(algo, expected_size, seed, window_size=window_size)
    cut_fn = _CUT_FNS[algo]
    label = f"{algo}{expected_size}"

    def chunk_group(
        key: tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],
        state: "GroupState",
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        src_id = int(key[0])
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("seq")
        new_text = "".join(t for t in rows["text"] if t is not None)
        eof = bool(rows["eof"].any())

        buf, next_off, next_idx = (
            state.get if state.exists else (b"", 0, 0)
        )
        data = bytes(buf or b"") + new_text.encode("utf-8")

        cuts = list(cut_fn(data, params)) if data else []
        if not eof and cuts:
            cuts = cuts[:-1]  # end-of-data artifact, not a content cut

        out = {k: [] for k in ("chunk_idx", "offset", "length", "chunk_text")}
        prev = -1
        for i, cut in enumerate(cuts):
            out["chunk_idx"].append(next_idx + i)
            out["offset"].append(next_off + prev + 1)
            out["length"].append(cut - prev)
            out["chunk_text"].append(data[prev + 1 : cut + 1].decode("utf-8", "replace"))
            prev = cut

        if eof:
            state.remove()
        else:
            consumed = prev + 1
            state.update((data[consumed:], next_off + consumed, next_idx + len(cuts)))

        yield pd.DataFrame(
            {
                "src_id": pd.Series([src_id] * len(cuts), dtype="int64"),
                "algo": label,
                "chunk_idx": pd.Series(out["chunk_idx"], dtype="int64"),
                "offset": pd.Series(out["offset"], dtype="int64"),
                "length": pd.Series(out["length"], dtype="int64"),
                "chunk_text": out["chunk_text"],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return docs_stream.groupBy("src_id").applyInPandasWithState(
        chunk_group,
        outputStructType=CHUNK_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
