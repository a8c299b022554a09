"""Media near-dup: binary payloads routed through the dedup machinery.

Two resemblance families over opaque ``binary`` media content, making
multimodal columns first-class dedup citizens instead of a schema demo:

* **Perceptual-fingerprint LSH** — :func:`media_fingerprints` computes a
  64-bit blockhash-style fingerprint per payload (canonical
  nearest-neighbor resample → 64 bucket means → sign vs global mean: the
  published blockhash/aHash construction, with the decode step stubbed
  per the task mandate — a real pipeline swaps the byte resample for a
  decoded-luma grid and keeps EVERYTHING downstream);
  :func:`media_fingerprint_pairs` banding-joins fingerprints with the
  same 4×16 pigeonhole as ``dedup_docs.simhash_pairs`` (hamming ≤ 3 ⇒ at
  least one exact 16-bit band), so candidates come from equality joins,
  never an all-pairs product.

* **CDC chunk-overlap resemblance** — :func:`media_chunk_keys` runs the
  content-defined chunkers (chunkers/core.py, restating
  ae.rs:95-149 / rabin.rs:131-216) over the RAW BYTES and emits 8-byte
  chunk identities; :func:`media_chunk_overlap_pairs` feeds them to
  ``dedup_docs.chunk_overlap_pairs`` (Broder resemblance over chunk
  sets). This is the binary-media twin of the text pipeline: shift- and
  container-offset-robust because CDC cuts follow content.

Exactness theorem the clone oracle leans on (pinned in tests): the
fingerprint's internal resample length ``PHASH_RESAMPLE`` divides
``resize_media``'s stub output length, and nearest-neighbor index
arithmetic composes EXACTLY under that divisibility —
``NN(NN(x, L), R) == NN(x, R)`` when ``R | L``, since
``((i·L)//R · n)//L == (i·n)//R`` for integer ``L/R``. Hence a
stub-resized copy has the BIT-IDENTICAL fingerprint of its original
(hamming 0), not merely a nearby one, and the planted-clone check is a
mathematical guarantee in the `chunk_overlap_ae_clone_check` style, not
an empirical threshold.

Scale design (100 TB): only (media_id, content) enters Python, in Arrow
batches; fingerprints are 8 bytes per media and band-join like simhash;
chunk identities are 8-byte hashes computed inside the scan-side UDF so
payload bytes never shuffle; the pair joins inherit ``max_df``/banding
skew bounds from dedup_docs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Canonical resample length for the perceptual fingerprint. MUST divide
# every resize_media stub target (default 64*64 = 4096 = 16 * 256) —
# the exact resize-invariance theorem in the module docstring.
PHASH_RESAMPLE = 256
PHASH_BITS = 64

_PHASH_BANDS = 4  # 4 bands × 16 bits: pigeonhole-complete for hamming ≤ 3


def media_fingerprints(
    media: DataFrame,
    resample: int = PHASH_RESAMPLE,
    bits: int = PHASH_BITS,
) -> DataFrame:
    """(media_id, phash: long) — blockhash perceptual fingerprint.

    Per payload: nearest-neighbor resample to ``resample`` bytes with
    resize_media's EXACT index arithmetic (``idx = (i·n)//resample``),
    split into ``bits`` equal buckets, bit b set iff bucket b's mean
    exceeds the global mean (strict, so ties are deterministic zeros).
    Empty/NULL payloads fingerprint to 0 — the same value their
    stub-resize (all-zero bytes) produces.
    """
    if resample % bits != 0:
        raise ValueError(f"resample {resample} must be a multiple of bits {bits}")

    def fp(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        idx_base = np.arange(resample, dtype=np.int64)
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                arr = np.frombuffer(content or b"", dtype=np.uint8)
                if arr.size == 0:
                    out.append(0)
                    continue
                # resize_media's exact NN formula (the clamp is a no-op
                # for i < resample but kept for formula parity)
                canon = arr[
                    np.minimum((idx_base * arr.size) // resample, arr.size - 1)
                ].astype(np.float64)
                buckets = canon.reshape(bits, resample // bits).mean(axis=1)
                bitvec = buckets > canon.mean()
                # big-endian bit order; int64 two's complement via uint64
                v = np.uint64(0)
                for b in np.nonzero(bitvec)[0]:
                    v |= np.uint64(1) << np.uint64(bits - 1 - int(b))
                out.append(int(v.astype(np.int64)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": pd.Series(out, dtype="int64"),
                }
            )

    narrow = media.select(F.col("media_id").cast("long").alias("media_id"), "content")
    return narrow.mapInPandas(fp, "media_id long, phash long")


def media_fingerprint_pairs(
    media: DataFrame,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) media pairs with hamming(phash) ≤ max_hamming.

    Same pigeonhole banding as ``simhash_pairs``: 4 bands of 16 bits
    guarantee every pair within hamming ≤ 3 shares at least one exact
    band (by pigeonhole, ≤ 3 differing bits cannot touch all 4 bands),
    so recall is structural, not probabilistic. Candidates come from 4
    equality joins on (band, band_bits); hamming is verified JVM-side
    with ``bit_count(xor)``.

    ``max_bucket`` is the skew guard (the minhash_lsh_pairs precedent):
    a band value shared by more than ``max_bucket`` media — boilerplate
    thumbnails, template renders — is dropped from the candidate join;
    it contributes O(|bucket|²) pairs of mostly-identical content that
    the PAIR output shape is wrong for anyway. With the cap, use
    :func:`media_phash_duplicate_groups` for the mega-cluster members
    (linear, exact for hamming 0) and this for the near-miss tail —
    the composition every near-dup tier here uses at 100 TB.
    ``max_bucket=None`` (default) keeps the unconditional pigeonhole
    completeness guarantee.
    """
    if max_hamming >= _PHASH_BANDS:
        raise ValueError(
            f"4×16 banding is pigeonhole-complete only for hamming < "
            f"{_PHASH_BANDS}; got max_hamming={max_hamming}"
        )
    # registered with dedup_docs' cache registry so the standard
    # release_cached_frames() sweep discipline reclaims it
    from cdc_algorithms_spark.operators.dedup_docs import _persist

    fps = _persist(media_fingerprints(media))
    banded = _banded(fps)
    if max_bucket is not None:
        keep = (
            banded.groupBy("band", "band_bits")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") <= max_bucket)
            .select("band", "band_bits")
        )
        banded = banded.join(keep, ["band", "band_bits"], "left_semi")
    x = banded.alias("x")
    y = banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.band_bits") == F.col("y.band_bits"))
            & (F.col("x.media_id") < F.col("y.media_id")),
        )
        .select(
            F.col("x.media_id").alias("id_a"),
            F.col("y.media_id").alias("id_b"),
            F.expr("bit_count(x.phash ^ y.phash)").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def media_phash_duplicate_groups(media: DataFrame) -> DataFrame:
    """(media_id, canonical_id, group_size) — exact perceptual-duplicate
    groups (hamming 0): min-id canonical per identical fingerprint, the
    ``exact_dedup`` shape over the 64-bit phash.

    This is the SCALE-SAFE output for the dominant real-world media-dup
    pattern (byte-identical re-uploads, stub-resized re-encodes —
    both fingerprint IDENTICALLY by the invariance theorem): a
    boilerplate cluster of m media yields m rows, where the pair form
    yields m(m−1)/2. Work is one fingerprint pass + one hash
    aggregation — linear, no self-join at all. Compose with a
    ``max_bucket``-capped :func:`media_fingerprint_pairs` for the
    hamming 1–3 near-miss tail.

    Plan shape (pinned in tests/test_plans.py): ``groupBy("phash")`` +
    join back, NEVER ``Window.partitionBy("phash")`` — a window exec
    sorts each fingerprint cluster inside ONE task, so the boilerplate
    mega-cluster this operator exists for (995k of 1M payloads in
    SCALING §26) would single-task multi-GB at 100×. The aggregate
    gets map-side partial combine (the hot key collapses to one row
    per task before the exchange) and the join back is an AQE-skew-
    splittable equi-join; the fingerprint pass is persisted so payload
    bytes are fingerprinted once, not once per join side.
    """
    from cdc_algorithms_spark.operators.dedup_docs import _persist

    fps = _persist(media_fingerprints(media))
    groups = fps.groupBy("phash").agg(
        F.min("media_id").cast("long").alias("canonical_id"),
        F.count(F.lit(1)).cast("long").alias("group_size"),
    )
    return fps.join(groups, "phash").select(
        "media_id", "canonical_id", "group_size"
    )


def _banded(fps: DataFrame) -> DataFrame:
    return fps.select(
        "media_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("phash", 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(_PHASH_BANDS)
                ]
            )
        ).alias("band", "band_bits"),
    )


def incremental_media_phash_pairs(
    index_fps: DataFrame,
    batch_fps: DataFrame,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Perceptual near-dup pairs TOUCHING the batch only — batch vs the
    fingerprint index and batch vs batch, never index vs index: the
    incremental form a standing media-ingest pipeline runs per
    micro-batch (streaming/media_index.py wires the durable store).
    Both frames are (media_id, phash); ids must be disjoint. Same 4×16
    pigeonhole recall guarantee as :func:`media_fingerprint_pairs` —
    banding is a pure projection of the stored 8-byte fingerprints, so
    the index holds one row per media, not four. ``max_bucket`` is the
    same skew guard (counted over index ∪ batch; dropped buckets lose
    their mega-cluster candidates — pair with the linear
    :func:`media_phash_duplicate_groups` for those)."""
    if max_hamming >= _PHASH_BANDS:
        raise ValueError(
            f"4×16 banding is pigeonhole-complete only for hamming < "
            f"{_PHASH_BANDS}; got max_hamming={max_hamming}"
        )
    union = _banded(index_fps.unionByName(batch_fps))
    a = _banded(batch_fps)
    if max_bucket is not None:
        keep = (
            union.groupBy("band", "band_bits")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") <= max_bucket)
            .select("band", "band_bits")
        )
        union = union.join(keep, ["band", "band_bits"], "left_semi")
        a = a.join(keep, ["band", "band_bits"], "left_semi")
    a = a.alias("a")
    b = union.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.media_id") != F.col("b.media_id")),
        )
        .select(
            F.least("a.media_id", "b.media_id").alias("id_a"),
            F.greatest("a.media_id", "b.media_id").alias("id_b"),
            F.expr("bit_count(a.phash ^ b.phash)").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def media_chunk_keys(
    media: DataFrame,
    algo: str = "ae",
    expected_size: int = 320,
    seed: int = 0,
) -> DataFrame:
    """(src_id, algo, chunk_idx, offset, length, ck) — content-defined
    chunk identities over RAW binary payloads.

    The binary twin of ``chunking.cdc_chunks`` (which is text-keyed):
    the same cut functions (chunkers/core.py, restating ae.rs:95-149)
    run over ``content`` bytes directly, and each chunk leaves Python as
    an 8-byte BLAKE2b identity instead of its payload — chunk bytes
    never shuffle, the invariant every dedup path here holds at 100 TB.
    Empty/NULL payloads yield no chunks (chunker Finished semantics).
    """
    from cdc_algorithms_spark.operators.chunking import _CUT_FNS, make_params

    if algo not in _CUT_FNS:
        raise ValueError(f"unknown CDC algo {algo!r}; one of {sorted(_CUT_FNS)}")
    params = make_params(algo, expected_size, seed)
    cut_fn = _CUT_FNS[algo]
    label = f"{algo}{expected_size}"

    def chunk_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import hashlib

        import pandas as pd

        for pdf in batches:
            src_ids, idxs, offsets, lengths, cks = [], [], [], [], []
            for sid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                data = bytes(content)
                prev = -1
                for idx, cut in enumerate(cut_fn(data, params)):
                    src_ids.append(sid)
                    idxs.append(idx)
                    offsets.append(prev + 1)
                    lengths.append(cut - prev)
                    cks.append(
                        int.from_bytes(
                            hashlib.blake2b(
                                data[prev + 1 : cut + 1], digest_size=8
                            ).digest(),
                            "big",
                            signed=True,
                        )
                    )
                    prev = cut
            yield pd.DataFrame(
                {
                    "src_id": pd.Series(src_ids, dtype="int64"),
                    "algo": label,
                    "chunk_idx": pd.Series(idxs, dtype="int64"),
                    "offset": pd.Series(offsets, dtype="int64"),
                    "length": pd.Series(lengths, dtype="int64"),
                    "ck": pd.Series(cks, dtype="int64"),
                }
            )

    narrow = media.select(F.col("media_id").cast("long").alias("media_id"), "content")
    return narrow.mapInPandas(
        chunk_batches,
        "src_id long, algo string, chunk_idx long, offset long, length long, ck long",
    )


def media_chunk_elements(
    media: DataFrame,
    algo: str = "ae",
    expected_size: int = 320,
    seed: int = 0,
) -> DataFrame:
    """(doc_id, shingle) — each media's DISTINCT 8-byte CDC chunk
    identities in the element-frame shape the durable Jaccard-store
    verbs accept (``dedup_docs.jaccard_prefix_index(elements=...)``):
    the adapter that gives the media chunk-overlap tier a STANDING
    index (streaming/media_chunk_index.py) instead of re-chunking the
    corpus per resemblance query. Payload bytes are chunked once,
    scan-side; only the 8-byte keys enter the store."""
    chunks = media_chunk_keys(media, algo, expected_size, seed)
    return chunks.select(
        F.col("src_id").alias("doc_id"), F.col("ck").alias("shingle")
    ).distinct()


def media_chunk_overlap_pairs(
    media: DataFrame,
    algo: str = "ae",
    expected_size: int = 320,
    threshold: float = 0.3,
    max_df: int | None = None,
) -> DataFrame:
    """(id_a, id_b, shared, jaccard) — Broder resemblance over CDC chunk
    sets of binary media payloads; the multimodal twin of
    ``chunk_overlap_pairs_ae``. Byte-identical payloads score EXACTLY
    1.0 (CDC cuts are a pure function of bytes); payloads sharing a
    shifted region resynchronize within a window and score by true
    overlap — the property that makes this the right resemblance for
    container-wrapped media (same stream, different header offsets).
    """
    from cdc_algorithms_spark.operators.dedup_docs import chunk_overlap_pairs

    chunks = media_chunk_keys(media, algo, expected_size)
    return chunk_overlap_pairs(
        chunks,
        threshold=threshold,
        key=F.col("ck"),
        max_df=max_df,
    )
