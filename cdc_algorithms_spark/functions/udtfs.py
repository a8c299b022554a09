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
        if size is None or size <= 0:
            # same guard as the batch twin (operators/chunking.py):
            # a silent empty result for size<=0 would read as data loss
            raise ValueError(f"chunk_fixed: size must be positive, got {size}")
        if text is None:
            return
        for idx, off in enumerate(range(0, len(text), size)):
            piece = text[off : off + size]
            yield idx, off, len(piece), piece


@udtf(
    returnType="chunk_idx: bigint, offset: bigint, length: bigint, chunk_text: string"
)
class CdcChunkUDTF:
    """Content-defined chunking as a lateral table function:
    ``LATERAL chunk_cdc(text, algo, expected_size, seed)`` with algo ∈
    ae / rabin / fastcdc — the reference's pull loop (chunker.rs:25-29)
    surfaced to SQL. Cut positions come from the same vectorized kernels
    the DataFrame operator uses (chunkers/fast.py), so the SQL surface
    and the mapInPandas pipeline cannot drift."""

    def eval(self, text: str, algo: str, expected_size: int, seed: int):  # noqa: D102
        if text is None or len(text) == 0:
            return
        # local import: the UDTF class pickles to executors; resolving at
        # call time keeps the pickle small and the worker import lazy
        from cdc_algorithms_spark.chunkers import ae_cuts, fastcdc_cuts, rabin_cuts
        from cdc_algorithms_spark.chunkers.params import make_params

        cut_fns = {"ae": ae_cuts, "rabin": rabin_cuts, "fastcdc": fastcdc_cuts}
        if algo not in cut_fns:
            raise ValueError(
                f"chunk_cdc: unknown algo {algo!r}; one of {sorted(cut_fns)}"
            )
        cut_fn = cut_fns[algo]
        data = text.encode("utf-8")
        params = make_params(algo, expected_size, seed=seed)
        # cuts are INCLUSIVE last-byte indices — identical loop to the
        # mapInPandas pipeline (operators/chunking.py::chunk_batches)
        prev = -1
        for idx, cut in enumerate(cut_fn(data, params)):
            piece = data[prev + 1 : cut + 1]
            yield idx, prev + 1, len(piece), piece.decode("utf-8", "replace")
            prev = cut


def register_udtfs(spark) -> None:
    """Register all engine UDTFs in the session's SQL function registry."""
    spark.udtf.register("chunk_fixed", FixedChunkUDTF)
    spark.udtf.register("chunk_cdc", CdcChunkUDTF)
