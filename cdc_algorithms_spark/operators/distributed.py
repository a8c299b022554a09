"""Segment-parallel CDC chunking of large blobs — the Spark restatement
of the reference's ``parallel_chunking`` (ae.rs:55-92, rabin.rs:92-128;
SURVEY.md §2.3 P1-P2, §4.3).

The reference's insight is that CDC boundaries depend only on a bounded
look-back (AE/Rabin: ``window_size``; FastCDC: up to ``max_size``), so a
huge byte stream can be chunked segment-by-segment given overlap
warm-up, with a deterministic seam rule. Here that becomes a three-phase
DataFrame pipeline — the 100 TB shape: no single node ever holds a whole
blob, only ``segment_len + overlap`` slices.

Phase A — segment scan (``mapInPandas``): each segment row carries
``payload = blob[left-overlap .. right)``; the numpy scanner emits cut
positions, trimmed to the segment's owned range ``[left, right)`` so
every cut is emitted exactly once (the reference instead re-emits
warm-up cuts and relies on the merge to drop them, ae.rs:36-47).

Phase B — seam merge (``applyInPandas`` per blob): the reference's
sequential accept rule — keep a cut only if it is ≥ ``spacing`` bytes
after the last *kept* cut (ae.rs:74, rabin.rs:110) — is not a window-lag
filter (rejections chain), so it runs as per-blob Python over the tiny
cut list. The final boundary ``blob_len-1`` is always kept so bytes are
conserved (the reference can drop a too-close final boundary and
silently lose tail bytes from its metrics; we deviate for byte
conservation, which the oracle concat checks require).

Phase C — content hashing, fully declarative: chunk spans range-join
back to the segments that cover them (a chunk spans ≤ 2 segments
whenever ``segment_len ≥ max chunk size``), pieces are sliced with
``substring`` on binary, reassembled with ``array_sort`` +
``aggregate``/``concat``, and fingerprinted with ``xxhash64`` — all
JVM-side, so chunk payloads never cross into Python or the driver.

Not replicated: the rabin.rs:101 segment-bound bug (right bound fixed at
``len/T``) and the O(T·n) per-thread buffer clone at rabin.rs:99.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_algorithms_spark.chunkers.fast import (
    ae_bounds,
    fastcdc_bounds,
    rabin_bounds,
)
from cdc_algorithms_spark.chunkers.params import (
    AeParams,
    FastCdcParams,
    RabinParams,
    make_params,
)

_BOUND_FNS = {"ae": ae_bounds, "rabin": rabin_bounds, "fastcdc": fastcdc_bounds}


def _default_overlap(params) -> int:
    if isinstance(params, (AeParams, RabinParams)):
        return params.window_size
    if isinstance(params, FastCdcParams):
        return params.max_size
    raise TypeError(type(params))


def _merge_spacing(params) -> int:
    # ae.rs:74 / rabin.rs:110 use window_size; FastCDC (no reference
    # parallel variant) uses its min chunk size as the seam spacing.
    if isinstance(params, (AeParams, RabinParams)):
        return params.window_size
    return params.min_size


def segment_blob_df(
    blobs: DataFrame,
    segment_len: int,
    overlap: int,
    id_col: str = "src_id",
    content_col: str = "content",
) -> DataFrame:
    """(id, content: binary) → one row per segment with overlap warm-up.

    Pure SQL (``sequence``/``posexplode``/``substring`` on binary), so
    segmentation itself is parallel and never funnels through Python.
    """
    if segment_len <= 0 or overlap < 0:
        raise ValueError(f"bad segment_len={segment_len} overlap={overlap}")
    n = F.length(F.col(content_col))
    seg = (
        blobs.where(n > 0)
        .select(
            F.col(id_col).cast("long").alias("src_id"),
            F.col(content_col).alias("__content"),
            n.cast("long").alias("blob_len"),
            F.posexplode(
                F.sequence(F.lit(0), n - F.lit(1), F.lit(segment_len))
            ).alias("seg_idx", "left"),
        )
        .select(
            "src_id",
            F.col("seg_idx").cast("long").alias("seg_idx"),
            F.col("left").cast("long").alias("left"),
            F.least(F.col("left") + segment_len, F.col("blob_len")).alias("right"),
            "blob_len",
            F.greatest(F.col("left") - overlap, F.lit(0)).cast("long").alias(
                "scan_start"
            ),
            F.expr(
                f"substring(__content, greatest(left - {overlap}, 0) + 1, "
                f"least(left + {segment_len}, length(__content)) "
                f"- greatest(left - {overlap}, 0))"
            ).alias("payload"),
        )
    )
    return seg


def parallel_chunk_blob(
    blobs: DataFrame,
    algo: str,
    expected_size: int,
    seed: int = 0,
    window_size: int | None = None,
    segment_len: int = 1 << 20,
    overlap: int | None = None,
    id_col: str = "src_id",
    content_col: str = "content",
) -> DataFrame:
    """Distributed CDC chunking of binary blobs.

    Returns ``(src_id, algo, chunk_idx, offset, length, hash)`` where
    ``hash = xxhash64(chunk bytes)`` (the reference's DefaultHasher role,
    ae.rs:75-78).
    """
    if overlap is None:
        overlap = _default_overlap(
            make_params(algo, expected_size, seed, window_size=window_size)
        )
    segments = segment_blob_df(blobs, segment_len, overlap, id_col, content_col)
    return chunk_segments(segments, algo, expected_size, seed, window_size)


def chunk_segments(
    segments: DataFrame,
    algo: str,
    expected_size: int,
    seed: int = 0,
    window_size: int | None = None,
) -> DataFrame:
    """The segment→chunk pipeline over a prebuilt segment table
    (``src_id, seg_idx, left, right, blob_len, scan_start, payload``) —
    shared by :func:`parallel_chunk_blob` (in-memory blobs) and
    :func:`cdc_algorithms_spark.sources.segmented_files.segment_file_ranges`
    (executor-side range reads of files, the no-whole-blob 100 TB path).
    """
    if algo not in _BOUND_FNS:
        raise ValueError(f"unknown CDC algo {algo!r}; one of {sorted(_BOUND_FNS)}")
    params = make_params(algo, expected_size, seed, window_size=window_size)
    spacing = _merge_spacing(params)
    bound_fn = _BOUND_FNS[algo]
    label = f"parallel_{algo}{expected_size}"

    # Persisted: the segment table feeds BOTH the cut scan (Phase A) and
    # the content hashing range-join (Phase C); without it each phase
    # re-reads the source and re-slices every blob. MEMORY_AND_DISK —
    # at scale this spills to executor-local disk, which still beats two
    # full source scans.
    from pyspark.storagelevel import StorageLevel

    segments = segments.persist(StorageLevel.MEMORY_AND_DISK)

    # --- Phase A: per-segment scan ---------------------------------------
    def scan(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            src_ids: list[int] = []
            cut_pos: list[int] = []
            blob_lens: list[int] = []
            for sid, left, right, scan_start, payload, blob_len in zip(
                pdf["src_id"], pdf["left"], pdf["right"],
                pdf["scan_start"], pdf["payload"], pdf["blob_len"],
            ):
                for rel in bound_fn(payload, params):
                    cut = scan_start + rel
                    if left <= cut < right:  # owned range: exactly-once emission
                        src_ids.append(sid)
                        cut_pos.append(cut)
                        blob_lens.append(blob_len)
            yield pd.DataFrame(
                {
                    "src_id": pd.Series(src_ids, dtype="int64"),
                    "cut": pd.Series(cut_pos, dtype="int64"),
                    "blob_len": pd.Series(blob_lens, dtype="int64"),
                }
            )

    cuts = segments.mapInPandas(scan, "src_id long, cut long, blob_len long")

    # Sentinel per blob: the final boundary always exists, even for blobs
    # whose scan found no cuts at all. Derived from the persisted segment
    # table (blob_len is constant per blob) so the source isn't re-read.
    sentinels = segments.groupBy("src_id").agg(
        (F.max("blob_len") - 1).cast("long").alias("cut"),
        F.max("blob_len").cast("long").alias("blob_len"),
    )
    all_cuts = cuts.unionByName(sentinels)

    # --- Phase B: sequential seam merge per blob --------------------------
    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        sid = int(pdf["src_id"].iloc[0])
        blob_len = int(pdf["blob_len"].iloc[0])
        final = blob_len - 1
        accepted: list[int] = []
        last = -1
        for cut in sorted(set(pdf["cut"])):
            if cut == final or cut - last >= spacing:
                accepted.append(int(cut))
                last = int(cut)
        offsets = [0] + [c + 1 for c in accepted[:-1]]
        return pd.DataFrame(
            {
                "src_id": pd.Series([sid] * len(accepted), dtype="int64"),
                "chunk_idx": pd.Series(range(len(accepted)), dtype="int64"),
                "offset": pd.Series(offsets, dtype="int64"),
                "length": pd.Series(
                    [c - o + 1 for c, o in zip(accepted, offsets)], dtype="int64"
                ),
            }
        )

    spans = all_cuts.groupBy("src_id").applyInPandas(
        merge, "src_id long, chunk_idx long, offset long, length long"
    )

    # --- Phase C: declarative content hashing -----------------------------
    core = segments.select("src_id", "left", "right", "scan_start", "payload")
    end = F.col("offset") + F.col("length") - 1
    joined = spans.join(
        core,
        on=[
            spans["src_id"] == core["src_id"],
            core["left"] <= end,
            core["right"] > F.col("offset"),
        ],
    ).select(
        spans["src_id"],
        "chunk_idx",
        "offset",
        "length",
        "left",
        F.expr(
            "substring(payload, greatest(offset, left) - scan_start + 1, "
            "least(offset + length, right) - greatest(offset, left))"
        ).alias("piece"),
    )
    chunks = (
        joined.groupBy("src_id", "chunk_idx", "offset", "length")
        .agg(
            F.xxhash64(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("left", "piece"))),
                    F.lit(b""),
                    lambda acc, x: F.concat(acc, x["piece"]),
                )
            ).alias("hash")
        )
        .select(
            "src_id",
            F.lit(label).alias("algo"),
            "chunk_idx",
            "offset",
            "length",
            "hash",
        )
    )
    return chunks
