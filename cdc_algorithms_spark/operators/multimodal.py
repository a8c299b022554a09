"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (task brief).

The container has no media libraries (PIL/librosa/ffmpeg), so the
*decode* step is stubbed two ways:

* ``strict=True`` → ``NotImplementedError`` naming the missing
  dependency (the real-decoder seam; swap in PIL/torchvision on a
  cluster that has them);
* default → a deterministic fake featurizer (bucketed byte statistics)
  clearly marked as such.

Everything around the stub is real and tested: the media schema, the
narrow projection before the UDF, the Arrow batch shape
(``mapInPandas`` with bounded batches of binary payloads), the
explode-to-frames row geometry, and the declarative metadata summaries.
At 100 TB the content column stays columnar parquet/binaryFile splits;
only (id, content) ever enters Python, and frame/feature outputs are
narrow rows.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

try:  # decode gate: real decoders if the cluster image has them
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def synthesize_media(
    docs: DataFrame,
    kind: str = "image",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic synthetic media table from the documents fixture:
    ``(media_id, kind, content: binary, meta: struct)``.

    Content is the UTF-8 bytes of the text (an opaque payload as far as
    the pipeline is concerned); meta mimics decoded-header fields.
    """
    n = F.length(F.col(text_col))
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            (n % 640 + 16).cast("int").alias("width"),
            (n % 480 + 16).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (n * 10).cast("int").alias("duration_ms"),
            F.lit("raw").alias("format"),
        ).alias("meta"),
    )


def media_summary(media: DataFrame) -> DataFrame:
    """Declarative metadata rollup — never touches content payloads."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).cast("long").alias("n_media"),
        F.sum(F.length("content")).cast("long").alias("total_bytes"),
        F.round(F.avg(F.col("meta.width")), 4).alias("avg_width"),
        F.round(F.avg(F.col("meta.duration_ms")), 4).alias("avg_duration_ms"),
    )


def extract_features(
    media: DataFrame,
    dim: int = FEATURE_DIM,
    strict: bool = False,
) -> DataFrame:
    """(media_id, kind, features: array<float>) via Arrow-batched UDF.

    ``strict=True`` demands a real decoder (PIL) and raises
    ``NotImplementedError`` in this container; the default path computes
    a DETERMINISTIC FAKE feature vector (mean byte value per of ``dim``
    equal-width buckets, scaled to [0,1]) so downstream similarity
    plumbing is exercised with stable values.
    """
    if strict and not HAVE_PIL:
        raise NotImplementedError(
            "real image decode requires PIL/torchvision, not present in "
            "this container; use strict=False for the deterministic stub"
        )

    def featurize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                # NULL payload → same zero-vector as empty payload
                arr = np.frombuffer(content or b"", dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * dim)
                    continue
                # deterministic fake: bucketed byte means (stands in for
                # a decoded-image embedding; same shape contract)
                buckets = np.array_split(arr.astype(np.float64), dim)
                feats.append(
                    [float(b.mean() / 255.0) if b.size else 0.0 for b in buckets]
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    narrow = media.select("media_id", "kind", "content")
    return narrow.mapInPandas(
        featurize, "media_id long, kind string, features array<float>"
    )


def sample_frames(
    media: DataFrame,
    frame_bytes: int = 256,
    max_frames: int | None = None,
) -> DataFrame:
    """Frame sampling plumbing: explode content into fixed-size frame
    rows ``(media_id, frame_idx, frame)`` — declaratively (substring on
    binary), reusing the fixed-chunking geometry. A real video pipeline
    swaps the byte-slicer for an ffmpeg-backed UDF with the same row
    contract.
    """
    n = F.length("content")
    # empty/NULL payloads carry no frames — and sequence(0, -1, k) raises
    exploded = media.where(n > 0).select(
        F.col("media_id").cast("long").alias("media_id"),
        F.col("content"),
        F.posexplode(
            F.sequence(F.lit(0), n - F.lit(1), F.lit(frame_bytes))
        ).alias("frame_idx", "off"),
    )
    if max_frames is not None:
        exploded = exploded.where(F.col("frame_idx") < max_frames)
    return exploded.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.expr(f"substring(content, off + 1, {frame_bytes})").alias("frame"),
    )


def resize_media(
    media: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    strict: bool = False,
) -> DataFrame:
    """Resize plumbing: content in → smaller content + updated metadata
    out, via Arrow-batched ``mapInPandas``.

    ``strict=True`` demands a real decoder (PIL) and raises in this
    container. The default path performs a DETERMINISTIC FAKE resize —
    the payload is index-subsampled to exactly ``target_w*target_h``
    bytes (nearest-neighbor over the byte stream, the same index
    arithmetic a real nearest-neighbor resize applies per channel
    row) — so the schema contract is fully exercised: binary in, binary
    out, ``meta.width/height`` rewritten, ``meta.format`` marked.

    Scale shape: the UDF sees only (media_id, content); metadata is
    re-attached declaratively afterward, so the Python boundary moves
    the minimum bytes both ways.
    """
    if strict and not HAVE_PIL:
        raise NotImplementedError(
            "real image resize requires PIL/torchvision, not present in "
            "this container; use strict=False for the deterministic stub"
        )
    out_len = target_w * target_h

    def do_resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for content in pdf["content"]:
                # NULL payload → same zero-filled output as empty payload
                arr = np.frombuffer(content or b"", dtype=np.uint8)
                if arr.size == 0:
                    payloads.append(b"\x00" * out_len)
                    continue
                idx = np.minimum(
                    (np.arange(out_len, dtype=np.int64) * arr.size) // out_len,
                    arr.size - 1,
                )
                payloads.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "content": payloads}
            )

    resized = media.select("media_id", "content").mapInPandas(
        do_resize, "media_id long, content binary"
    )
    keep = media.select("media_id", "kind", F.col("meta").alias("__old_meta"))
    return resized.join(keep, "media_id").select(
        "media_id",
        "kind",
        "content",
        F.struct(
            F.lit(target_w).cast("int").alias("width"),
            F.lit(target_h).cast("int").alias("height"),
            F.col("__old_meta.sample_rate").alias("sample_rate"),
            F.col("__old_meta.duration_ms").alias("duration_ms"),
            F.lit("resized-stub").alias("format"),
        ).alias("meta"),
    )
