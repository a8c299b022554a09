#!/usr/bin/env python
"""Media perceptual near-dup at corpus scale (SCALING.md §26).

The fixture-level contract is pinned in tests (exact resize invariance,
pigeonhole-complete banding, planted clones at hamming 0). This run
measures the ECONOMICS on ~1M binary payloads (multi-GiB):

* fingerprint wall — ONE Arrow-batched map-only pass over the payload
  bytes; after it the corpus is 16 bytes/media,
* one-shot banded pair-join wall over 1M fingerprints (4 equality
  joins, never all-pairs),
* planted-clone recall: byte-identical AND stub-resized clones of known
  bases MUST all pair at hamming exactly 0 (the invariance theorem is
  scale-free; this checks it survives real partitioning),
* the standing-pipeline shape: seed store on 90%, one 10% batch probed
  incrementally — expectation: probe cost tracks the batch fingerprint
  pass, the resident store contributes only its 16-byte rows.

Usage::

    python tools/media_scale_run.py --media 1000000
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tools.corpus_scale_run import build_corpus_df  # noqa: E402

CLONE_STEP = 1000  # every 1000th base gets one exact + one resized clone


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--media", type=int, default=1_000_000)
    ap.add_argument("--avg-tokens", type=int, default=700)
    ap.add_argument("--partitions", type=int, default=128)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--driver-mem", default="48g")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_algorithms_spark.operators.media_dedup import (
        incremental_media_phash_pairs,
        media_fingerprint_pairs,
        media_fingerprints,
        media_phash_duplicate_groups,
    )
    from cdc_algorithms_spark.operators.multimodal import resize_media

    report: dict = {"n_media": args.media, "clone_step": CLONE_STEP}
    media_dir = tempfile.mkdtemp(prefix="cdc_media_corpus_")
    try:
        # corpus: text payloads as opaque bytes; every CLONE_STEP-th id
        # also plants one byte-identical clone (+2^40) and one
        # stub-resized clone (+2^41)
        t0 = time.monotonic()
        docs = build_corpus_df(
            spark, args.media, args.avg_tokens, args.partitions
        )
        base = docs.select(
            F.col("doc_id").cast("long").alias("media_id"),
            F.encode("text", "utf-8").alias("content"),
        )
        planted = base.where(F.col("media_id") % CLONE_STEP == 0)
        exact = planted.withColumn(
            "media_id", F.col("media_id") + F.lit(1 << 40)
        )
        resized = resize_media(
            planted.select(
                "media_id",
                F.lit("image").alias("kind"),
                "content",
                F.struct(
                    F.lit(0).cast("int").alias("width"),
                    F.lit(0).cast("int").alias("height"),
                    F.lit(16000).cast("int").alias("sample_rate"),
                    F.lit(0).cast("int").alias("duration_ms"),
                    F.lit("raw").alias("format"),
                ).alias("meta"),
            )
        ).select(
            (F.col("media_id") + F.lit(1 << 41)).alias("media_id"), "content"
        )
        corpus = base.unionByName(exact).unionByName(resized)
        corpus.write.mode("overwrite").parquet(media_dir)
        media = spark.read.parquet(media_dir)
        report["payload_gib"] = round(
            media.agg(F.sum(F.length("content"))).first()[0] / 2**30, 2
        )
        report["n_rows"] = media.count()
        report["gen_write_s"] = round(time.monotonic() - t0, 1)

        # JIT warm-up
        media.limit(20_000).select(F.length("content").alias("l")).agg(
            F.sum("l")
        ).count()

        # 1. fingerprint pass — the only payload-touching step
        t0 = time.monotonic()
        fps = media_fingerprints(media).persist()
        n_fp = fps.count()
        report["fingerprint_s"] = round(time.monotonic() - t0, 1)
        report["n_fingerprints"] = n_fp

        # 2a. LINEAR duplicate groups — the scale-safe hamming-0 output
        # (synthetic payloads from one generator cluster heavily: the
        # pair shape would be quadratic inside identical-phash clusters)
        t0 = time.monotonic()
        groups = media_phash_duplicate_groups(media).persist()
        n_grouped = groups.where(F.col("group_size") > 1).count()
        report["dup_groups_s"] = round(time.monotonic() - t0, 1)
        report["n_in_dup_groups"] = n_grouped

        # 2b. capped banded pair join for the near-miss tail (the
        # composition the operator docstring prescribes)
        t0 = time.monotonic()
        pairs = media_fingerprint_pairs(media, max_hamming=3, max_bucket=64)
        report["n_capped_pairs"] = pairs.count()
        report["capped_pair_join_s"] = round(time.monotonic() - t0, 1)

        # 3. planted-clone recall at hamming 0 via the GROUP shape
        # (clone phash == base phash ⇒ same group; exact even where the
        # pair join's cap drops mega-buckets)
        n_bases = args.media // CLONE_STEP
        canon = groups.select("media_id", "canonical_id")
        base_side = canon.withColumnRenamed("media_id", "base_id").withColumnRenamed(
            "canonical_id", "base_canon"
        )
        found = 0
        for off in (1 << 40, 1 << 41):
            clone_side = canon.select(
                (F.col("media_id") - F.lit(off)).alias("base_id"),
                F.col("canonical_id").alias("clone_canon"),
            ).where(F.col("base_id") >= 0)
            found += (
                base_side.where(F.col("base_id") % CLONE_STEP == 0)
                .join(clone_side, "base_id")
                .where(F.col("base_canon") == F.col("clone_canon"))
                .count()
            )
        report["planted_expected"] = 2 * n_bases
        report["planted_grouped"] = found
        report["planted_recall"] = round(found / max(1, 2 * n_bases), 4)

        # 4. incremental shape: 90% store, 10% batch probe
        seed_fps = fps.where(F.col("media_id") % 10 != 0)
        batch = media.where(F.col("media_id") % 10 == 0)
        t0 = time.monotonic()
        batch_fps = media_fingerprints(batch)
        inc = incremental_media_phash_pairs(
            seed_fps, batch_fps, max_bucket=64
        )
        report["n_inc_pairs"] = inc.count()
        report["incremental_probe_s"] = round(time.monotonic() - t0, 1)
        print(json.dumps(report))
    finally:
        shutil.rmtree(media_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
