"""Python UDTF surface (SURVEY.md §2.5 "UDAF/UDTF surface").

The chunkers are the engine's natural table-valued functions — byte
stream in, chunk rows out (the reference's ``next_chunk`` pull loop,
chunker.rs:25-29, is exactly a lazy UDTF). The performance path stays
the Arrow-vectorized ``mapInPandas`` pipeline (operators/chunking.py);
this module exposes the same semantics through Spark 4's Python UDTF API
so SQL users get ``LATERAL chunk_fixed(text, size)`` directly. UDTFs
evaluate row-at-a-time in Python — fine for the lateral-join API shape,
wrong for the 100 TB hot path; the docs say so and the engine treats the
UDTF as a front-end, not an executor.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(
    returnType="chunk_idx: bigint, offset: bigint, length: bigint, chunk_text: string"
)
class FixedChunkUDTF:
    """Fixed-size chunking (fixed.rs:20-52) as a lateral table function."""

    def eval(self, text: str, size: int):  # noqa: D102
        if text is None:
            return
        for idx, off in enumerate(range(0, len(text), size)):
            piece = text[off : off + size]
            yield idx, off, len(piece), piece


def register_udtfs(spark) -> None:
    """Register all engine UDTFs in the session's SQL function registry."""
    spark.udtf.register("chunk_fixed", FixedChunkUDTF)
