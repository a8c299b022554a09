#!/usr/bin/env python
"""Corpus-scale near-dup evidence run (SCALING.md §15).

SCALING.md §11 scales one BLOB; this scales the DOCUMENT pipeline: a
generated multi-million-doc corpus (executor-side, deterministic,
never materialized on the driver) pushed through the exact near-dup
machinery — MinHash band index → capped LSH candidate join → exact
Jaccard verification → connected components → keep-one →
training-manifest rollup — recording at each scale point:

* candidate pair count vs verified pair count (the precision of the
  banding before exact verification pays for it),
* the ``max_bucket`` skew cap's hit rate (oversized buckets dropped,
  band rows lost),
* planted-pair recall (clones are planted deterministically, so recall
  is measured against ground truth, not estimated),
* per-stage walls.

Corpus design: ids are decades — ``doc_id % 10 ∈ {8, 9}`` are clones
of their decade's base (``doc_id - doc_id % 10``) with 2% of tokens
mutated (shingle survival (1-0.02)^3 ≈ 0.94 ⇒ J ≈ 0.89, safely above
the 0.8 threshold), so ~20% of docs are near-dups with known partners.
Token stream is a power-law draw over a 50k vocabulary, ~`avg_tokens`
tokens/doc (lognormal-ish spread), ~6 chars/token ⇒ ~`avg_tokens*7`
bytes/doc.

Adversarial skew mode (``--boilerplate N``, r07): appends N EXTRA docs
(ids ``docs .. docs+N-1``) that are all ~99.5%-identical mutations of
ONE out-of-range template — a single mega-cluster whose every band
bucket holds ~N rows, the worst case the ``max_bucket`` cap exists
for. The run then additionally reports how many buckets the cap
dropped, that the candidate join stayed bounded (nowhere near the
N²/2 ≈ 5G pairs an uncapped join would emit at N=100k), and that
planted recall over the REGULAR corpus is unchanged — boilerplate
shingles are disjoint from the organic vocabulary's n-grams in
aggregate, so its capped buckets never contained organic candidates.
The documented trade-off also gets measured: pairs INSIDE the capped
mega-cluster are lost to LSH (report ``boiler_pairs_found``) — the
standing mitigation is that content this duplicated is exactly what
exact-hash / fingerprint dedup upstream catches first.

Usage::

    python tools/corpus_scale_run.py --docs 500000 --avg-tokens 700
    python tools/corpus_scale_run.py --docs 2000000 --keep-corpus
    python tools/corpus_scale_run.py --docs 2000000 --boilerplate 100000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

N_SHINGLE = 3
THRESHOLD = 0.8
NUM_HASHES = 32
BANDS = 8
MAX_BUCKET = 1000
SEED = 20260815
VOCAB = 50_000
MUTATE = 0.02


def build_corpus_df(
    spark, n_docs: int, avg_tokens: int, partitions: int, boilerplate: int = 0
):
    """Lazy generator frame: (doc_id, text, source, n_chars). With
    ``boilerplate`` > 0, ids ``n_docs .. n_docs+boilerplate-1`` are
    0.5%-mutated clones of one out-of-range template — a single
    mega-cluster for the skew-cap stress."""
    from pyspark.sql import functions as F

    def gen(batches):
        import numpy as np
        import pandas as pd

        vocab = np.array([f"w{i:05d}" for i in range(VOCAB)])

        def tokens_of(doc_id: int) -> "np.ndarray":
            rng = np.random.default_rng([SEED, int(doc_id)])
            length = max(50, int(rng.lognormal(0, 0.35) * avg_tokens))
            # power-law head: low indices dominate like real word freqs
            idx = (rng.random(length) ** 3.0 * VOCAB).astype(np.int64)
            return idx

        def mutate(idx: "np.ndarray", doc_id: int, rate: float) -> "np.ndarray":
            rng = np.random.default_rng([SEED, doc_id, 1])
            k = max(1, int(rate * idx.size))
            where = rng.choice(idx.size, size=k, replace=False)
            idx = idx.copy()
            idx[where] = (rng.random(k) ** 3.0 * VOCAB).astype(np.int64)
            return idx

        for pdf in batches:
            out_text, out_src, out_len, ids = [], [], [], []
            for doc_id in pdf["id"].to_numpy():
                doc_id = int(doc_id)
                if doc_id >= n_docs:  # boilerplate: one mega-cluster
                    idx = mutate(tokens_of(10**12), doc_id, 0.005)
                else:
                    pos = doc_id % 10
                    if pos >= 8:  # clone of the decade base, 2% mutated
                        idx = mutate(tokens_of(doc_id - pos), doc_id, MUTATE)
                    else:
                        idx = tokens_of(doc_id)
                text = " ".join(vocab[idx])
                ids.append(doc_id)
                out_text.append(text)
                out_src.append(f"src{doc_id % 20}")
                out_len.append(len(text))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "text": out_text,
                    "source": out_src,
                    "n_chars": out_len,
                }
            )

    return (
        spark.range(n_docs + boilerplate, numPartitions=partitions)
        .mapInPandas(
            gen, "doc_id long, text string, source string, n_chars long"
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500_000)
    ap.add_argument("--avg-tokens", type=int, default=700)
    ap.add_argument("--partitions", type=int, default=256)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--driver-mem", default="48g")
    ap.add_argument("--keep-corpus", action="store_true")
    ap.add_argument("--corpus-dir", default=None)
    ap.add_argument("--boilerplate", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.cpus * 4))
        .config("spark.driver.memory", args.driver_mem)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cdc_algorithms_spark.operators import dedup_docs as dd
    from cdc_algorithms_spark.operators.splits import split_assignment

    report: dict = {
        "n_docs": args.docs,
        "avg_tokens": args.avg_tokens,
        "max_bucket": MAX_BUCKET,
        "bands": f"{BANDS}x{NUM_HASHES // BANDS}",
        "boilerplate": args.boilerplate,
    }

    corpus_dir = args.corpus_dir or tempfile.mkdtemp(prefix="cdc_corpus_")
    try:
        t0 = time.monotonic()
        build_corpus_df(
            spark, args.docs, args.avg_tokens, args.partitions,
            boilerplate=args.boilerplate,
        ).write.mode("overwrite").parquet(corpus_dir)
        report["gen_write_s"] = round(time.monotonic() - t0, 1)
        docs = spark.read.parquet(corpus_dir)
        total_bytes = docs.agg(F.sum("n_chars")).first()[0]
        report["corpus_gib"] = round(total_bytes / 2**30, 2)

        # --- band index ---------------------------------------------------
        t0 = time.monotonic()
        bands = dd.minhash_band_index(docs, N_SHINGLE, NUM_HASHES, BANDS)
        bands = bands.persist()
        report["band_rows"] = bands.count()
        report["band_index_s"] = round(time.monotonic() - t0, 1)

        # --- skew cap hit rate ---------------------------------------------
        t0 = time.monotonic()
        sizes = bands.groupBy("band", "band_hash").agg(
            F.count(F.lit(1)).alias("bn")
        )
        cap_stats = sizes.agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.when(F.col("bn") > MAX_BUCKET, 1).otherwise(0)).alias(
                "n_capped"
            ),
            F.sum(
                F.when(F.col("bn") > MAX_BUCKET, F.col("bn")).otherwise(0)
            ).alias("rows_dropped"),
            F.max("bn").alias("max_bucket_seen"),
        ).first()
        report["n_buckets"] = cap_stats.n_buckets
        report["n_capped_buckets"] = int(cap_stats.n_capped)
        report["band_rows_dropped"] = int(cap_stats.rows_dropped)
        report["max_bucket_seen"] = int(cap_stats.max_bucket_seen)
        report["cap_scan_s"] = round(time.monotonic() - t0, 1)

        # --- LSH candidates (capped) ---------------------------------------
        t0 = time.monotonic()
        capped = dd._cap_band_buckets(bands, MAX_BUCKET)
        a = capped.alias("a")
        b = capped.alias("b")
        candidates = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
            )
            .distinct()
            .persist()
        )
        report["n_candidates"] = candidates.count()
        report["candidates_s"] = round(time.monotonic() - t0, 1)

        # --- exact verification ---------------------------------------------
        t0 = time.monotonic()
        verified = dd._verify_exact_jaccard(
            docs, candidates, N_SHINGLE, THRESHOLD, "doc_id", "text"
        ).persist()
        report["n_verified"] = verified.count()
        report["verify_s"] = round(time.monotonic() - t0, 1)
        report["cand_to_verified"] = round(
            report["n_candidates"] / max(1, report["n_verified"]), 2
        )

        # --- planted-pair recall --------------------------------------------
        # ground truth: (base, clone) for clone ids % 10 in {8, 9}
        t0 = time.monotonic()
        planted = (
            spark.range(args.docs)
            .where(F.col("id") % 10 >= 8)
            .select(
                (F.col("id") - F.col("id") % 10).alias("id_a"),
                F.col("id").alias("id_b"),
            )
        )
        n_planted = planted.count()
        found = planted.join(
            verified.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
        ).count()
        report["n_planted"] = n_planted
        report["planted_found"] = found
        report["planted_recall"] = round(found / max(1, n_planted), 4)
        report["recall_s"] = round(time.monotonic() - t0, 1)

        if args.boilerplate:
            # mega-cluster accounting: how bounded did the cap keep the
            # candidate join, and what survived INSIDE the cluster
            nb = args.docs
            report["boiler_candidates"] = candidates.where(
                (F.col("id_a") >= nb) & (F.col("id_b") >= nb)
            ).count()
            report["boiler_pairs_found"] = verified.where(
                (F.col("id_a") >= nb) & (F.col("id_b") >= nb)
            ).count()
            report["boiler_pairs_possible"] = (
                args.boilerplate * (args.boilerplate - 1) // 2
            )
            report["cross_candidates"] = candidates.where(
                (F.col("id_a") >= nb) != (F.col("id_b") >= nb)
            ).count()

        # --- components + keep-one + manifest rollup ------------------------
        t0 = time.monotonic()
        comp = dd.connected_components(verified.select("id_a", "id_b"))
        comp = comp.persist()
        n_comp = comp.select("component_id").distinct().count()
        report["n_components"] = n_comp
        report["components_s"] = round(time.monotonic() - t0, 1)

        t0 = time.monotonic()
        kept = (
            docs.join(F.broadcast(comp), "doc_id", "left")
            .where(
                F.col("component_id").isNull()
                | (F.col("component_id") == F.col("doc_id"))
            )
            .drop("component_id")
        )
        carved = split_assignment(
            kept, (("train", 0.8), ("val", 0.1), ("test", 0.1)), seed=11
        )
        manifest = (
            carved.groupBy("split", "source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_chars").alias("n_bytes"),
            )
            .collect()
        )
        report["n_kept"] = sum(r.n_docs for r in manifest)
        report["manifest_cells"] = len(manifest)
        report["manifest_s"] = round(time.monotonic() - t0, 1)

        print(json.dumps(report))
    finally:
        if not args.keep_corpus and args.corpus_dir is None:
            shutil.rmtree(corpus_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
