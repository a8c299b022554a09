"""Segment-parallel CDC chunking of large blobs — the Spark restatement
of the reference's ``parallel_chunking`` (ae.rs:55-92, rabin.rs:92-128;
SURVEY.md §2.3 P1-P2, §4.3).

The reference's insight is that CDC boundaries depend only on a bounded
look-back (AE/Rabin: ``window_size``; FastCDC: up to ``max_size``), so a
huge byte stream can be chunked segment-by-segment given overlap
warm-up, with a deterministic seam rule. Here that becomes a three-phase
DataFrame pipeline — the 100 TB shape: no single node ever holds a whole
blob, only ``segment_len + overlap`` slices.

Phase A — segment scan + local hashing (``mapInPandas``): each segment
row carries ``payload = blob[left-overlap .. right)``; the numpy scanner
emits cut positions, trimmed to the segment's owned range ``[left,
right)`` so every cut is emitted exactly once (the reference instead
re-emits warm-up cuts and relies on the merge to drop them,
ae.rs:36-47). The task also fingerprints every chunk whose span the
seam merge cannot change — consecutive cuts from one scan are ≥ the
merge spacing apart, so only a segment's first two owned cuts are
merge-uncertain — and ships 24 bytes per chunk instead of content.

Phase B — seam merge (``applyInPandas`` per blob): the reference's
sequential accept rule — keep a cut only if it is ≥ ``spacing`` bytes
after the last *kept* cut (ae.rs:74, rabin.rs:110) — is not a window-lag
filter (rejections chain), so it runs as per-blob Python over the tiny
cut list. The final boundary ``blob_len-1`` is always kept so bytes are
conserved (the reference can drop a too-close final boundary and
silently lose tail bytes from its metrics; we deviate for byte
conservation, which the oracle concat checks require).

Phase C — seam-chunk reassembly, for the few spans the merge
invalidated (~2 per seam + the final chunk): those range-join back to
the covering segments, pieces are sliced with ``substring`` on binary,
reassembled with ``array_sort`` + ``aggregate``/``concat``, and
fingerprinted with the same blake2b-64 family as Phase A. Chunk CONTENT
therefore never shuffles — at 100 TB the dominant cost of the naive
design (reassemble every chunk through a payload join) is a second
full-corpus shuffle, and this pipeline ships only cuts and hashes.

Not replicated: the rabin.rs:101 segment-bound bug (right bound fixed at
``len/T``) and the O(T·n) per-thread buffer clone at rabin.rs:99.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
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

_H64_MOD = 1 << 64
_H64_SIGN = 1 << 63


def _h64(data) -> int:
    """64-bit chunk fingerprint (blake2b-8, signed-long range).

    One hash family for BOTH the scan-local fast path and the seam
    reassembly path — chunk identity must not depend on which path
    computed it. (The reference's DefaultHasher role, ae.rs:75-78;
    xxhash64 isn't callable from Python, and hashing locally beats
    shuffling content to the JVM's hash by orders of magnitude.)
    """
    import hashlib

    v = int.from_bytes(hashlib.blake2b(bytes(data), digest_size=8).digest(), "big")
    return v - _H64_MOD if v >= _H64_SIGN else v


def _h64_series(col):
    import pandas as pd

    return pd.Series(
        [None if b is None else _h64(b) for b in col], dtype="Int64"
    )


_H64_UDF_CACHE: list = []


def _h64_udf(col):
    # built lazily: pandas_udf construction needs an active SparkSession,
    # which doesn't exist at import time
    if not _H64_UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        _H64_UDF_CACHE.append(pandas_udf(_h64_series, "long"))
    return _H64_UDF_CACHE[0](col)


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
    ``hash = blake2b64(chunk bytes)`` (the reference's DefaultHasher
    role, ae.rs:75-78; see ``_h64``).
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
    # Materialize the cache EAGERLY: three independent subtrees (cut
    # scan, sentinel aggregate, payload join) reference it, and Spark
    # launches their query stages concurrently — concurrent tasks that
    # each find a partition uncached recompute it redundantly (the cache
    # fill doesn't dedupe in-flight work). One cheap count turns "every
    # consumer recomputes the source" into "build once, read thrice":
    # 2.5x end-to-end on a 256 MiB synthetic blob.
    segments.count()

    # --- Phase A: per-segment scan + local hashing ------------------------
    # The scan task already holds the payload, so it hashes every chunk
    # whose span the seam merge cannot change, and ships ONLY (cut,
    # prev_cut, hash) — 24 bytes a chunk. Chunk CONTENT never shuffles;
    # at 100 TB the alternative (reassembling every chunk through a
    # payload join) re-shuffles the entire corpus once.
    #
    # Which chunks are locally certain: consecutive cuts from one scan
    # are >= spacing apart by construction (AE: > window; Rabin/FastCDC:
    # >= min_size), so the merge's accept rule can reject at most a
    # segment's FIRST owned cut (too close to the previous segment's
    # last accepted cut); the second owned cut is then always accepted.
    # Hence every chunk bounded by owned cuts j-1, j with j >= 2 is
    # final exactly as scanned. Phase B re-checks the assumption anyway:
    # a local hash is used only if the merged predecessor equals the
    # locally assumed one, so correctness never rests on this argument.
    def scan(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            src_ids: list[int] = []
            cut_pos: list[int] = []
            blob_lens: list[int] = []
            prev_cuts: list[int] = []
            hashes: list[object] = []
            for sid, left, right, scan_start, payload, blob_len in zip(
                pdf["src_id"], pdf["left"], pdf["right"],
                pdf["scan_start"], pdf["payload"], pdf["blob_len"],
            ):
                view = memoryview(payload)
                owned: list[int] = []  # relative cut positions in owned range
                for rel in bound_fn(payload, params):
                    cut = scan_start + rel
                    if left <= cut < right:  # owned range: exactly-once emission
                        owned.append(rel)
                for j, rel in enumerate(owned):
                    src_ids.append(sid)
                    cut_pos.append(scan_start + rel)
                    blob_lens.append(blob_len)
                    if j >= 2:
                        prev_rel = owned[j - 1]
                        prev_cuts.append(scan_start + prev_rel)
                        hashes.append(_h64(view[prev_rel + 1 : rel + 1]))
                    else:
                        # "no local hash" is a (prev_cut=-2, hash=0) pair,
                        # NOT a null: a nullable long crosses Arrow into
                        # applyInPandas as float64 and silently truncates
                        # hash low bits
                        prev_cuts.append(-2)
                        hashes.append(0)
            yield pd.DataFrame(
                {
                    "src_id": pd.Series(src_ids, dtype="int64"),
                    "cut": pd.Series(cut_pos, dtype="int64"),
                    "blob_len": pd.Series(blob_lens, dtype="int64"),
                    "prev_cut": pd.Series(prev_cuts, dtype="int64"),
                    "hash": pd.Series(hashes, dtype="int64"),
                }
            )

    cuts = segments.mapInPandas(
        scan, "src_id long, cut long, blob_len long, prev_cut long, hash long"
    )

    # Sentinel per blob: the final boundary always exists, even for blobs
    # whose scan found no cuts at all. Derived from the persisted segment
    # table (blob_len is constant per blob) so the source isn't re-read.
    sentinels = segments.groupBy("src_id").agg(
        (F.max("blob_len") - 1).cast("long").alias("cut"),
        F.max("blob_len").cast("long").alias("blob_len"),
        F.lit(-2).cast("long").alias("prev_cut"),
        F.lit(0).cast("long").alias("hash"),
    )
    all_cuts = cuts.unionByName(sentinels)

    # --- Phase B: sequential seam merge per blob --------------------------
    def merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        sid = int(pdf["src_id"].iloc[0])
        blob_len = int(pdf["blob_len"].iloc[0])
        final = blob_len - 1
        # one row per distinct cut; prefer the scan row (prev_cut != -2,
        # carries a usable hash) over the sentinel duplicate
        rows = (
            pdf.sort_values(["cut", "prev_cut"], ascending=[True, False])
            .drop_duplicates("cut", keep="first")
        )
        offsets: list[int] = []
        lengths: list[int] = []
        hashes: list[object] = []
        last = -1
        for cut, prev_cut, h in zip(rows["cut"], rows["prev_cut"], rows["hash"]):
            cut = int(cut)
            if not (cut == final or cut - last >= spacing):
                continue
            offsets.append(last + 1)
            lengths.append(cut - last)
            # the local hash is valid only if the merge agreed with the
            # scan about this chunk's start
            hashes.append(int(h) if int(prev_cut) == last else None)
            last = cut
        return pd.DataFrame(
            {
                "src_id": pd.Series([sid] * len(offsets), dtype="int64"),
                "chunk_idx": pd.Series(range(len(offsets)), dtype="int64"),
                "offset": pd.Series(offsets, dtype="int64"),
                "length": pd.Series(lengths, dtype="int64"),
                "hash": pd.Series(hashes, dtype="Int64"),
            }
        )

    spans = all_cuts.groupBy("src_id").applyInPandas(
        merge, "src_id long, chunk_idx long, offset long, length long, hash long"
    )

    # --- Phase C: seam-chunk reassembly (the rare path) -------------------
    # Only spans whose local hash was invalidated by the merge (first
    # chunk of the blob, ~2 per segment seam, the final chunk) are
    # rebuilt from payloads. The span side is tiny, so it broadcasts and
    # the payload side streams from cache — payloads are never shuffled
    # OR broadcast. (If seam spans ever outgrew broadcast — millions of
    # segments in one blob — swap to a shuffle join on (src_id, seg_idx);
    # the payload-side shape is unchanged.)
    done = spans.where(F.col("hash").isNotNull()).select(
        "src_id",
        F.lit(label).alias("algo"),
        "chunk_idx",
        "offset",
        "length",
        "hash",
    )
    seg_index = segments.select(
        F.col("src_id").alias("s_src_id"), "seg_idx", "left", "right", "scan_start"
    )
    end = F.col("offset") + F.col("length") - 1
    fallback = spans.where(F.col("hash").isNull()).drop("hash")
    span_segs = fallback.join(
        F.broadcast(seg_index),
        on=[
            fallback["src_id"] == seg_index["s_src_id"],
            seg_index["left"] <= end,
            seg_index["right"] > F.col("offset"),
        ],
    ).select(
        "src_id", "chunk_idx", "offset", "length",
        "seg_idx", "left", "right", "scan_start",
    )
    payloads = segments.select(
        F.col("src_id").alias("p_src_id"),
        F.col("seg_idx").alias("p_seg_idx"),
        "payload",
    )
    pieces = payloads.join(
        F.broadcast(span_segs),
        on=[
            F.col("src_id") == F.col("p_src_id"),
            F.col("seg_idx") == F.col("p_seg_idx"),
        ],
    ).select(
        "src_id",
        "chunk_idx",
        "offset",
        "length",
        "left",
        F.expr(
            "substring(payload, greatest(offset, left) - scan_start + 1, "
            "least(offset + length, right) - greatest(offset, left))"
        ).alias("piece"),
    )
    rebuilt = (
        pieces.groupBy("src_id", "chunk_idx", "offset", "length")
        .agg(
            _h64_udf(
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
    return done.unionByName(rebuilt)
