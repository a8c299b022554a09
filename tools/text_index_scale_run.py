#!/usr/bin/env python
"""The durable BM25 text index at corpus scale (SCALING.md §22).

The fixture-level contract is pinned in tests (indexed == batch ==
streamed bit-identically; bucket-pruned probes). This run measures the
ECONOMICS the tests can't: on a ~1M-doc / multi-GiB corpus,

* build wall for the base index (one tokenize + one bucket exchange),
* probe wall through the index vs the batch bm25_topk that re-tokenizes
  the corpus per query-set (the standing-pipeline crossover),
* extend wall for a 10% batch (expectation: tracks the BATCH, the
  resident postings are never read),
* probe wall with deltas attached, then after compact_text_index
  (the scan-branch economics, same shape as the PQ store's §19),
* bytes scanned per probe as evidence the bucket pruning holds at
  scale (posting files touched / total posting files).

Identity checks run alongside the walls: extended-probe top-k ==
one-shot-index top-k == batch top-k, exactly.

Usage::

    python tools/text_index_scale_run.py --docs 1000000
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

from tools.corpus_scale_run import build_corpus_df  # noqa: E402

QUERIES = [
    (1, "w00001 w00040 w00200"),
    (2, "w00003 w01000 w04000"),
    (3, "w00007 w00777"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--avg-tokens", type=int, default=700)
    ap.add_argument("--partitions", type=int, default=128)
    ap.add_argument("--buckets", type=int, default=64)
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

    from cdc_algorithms_spark.operators.retrieval import (
        bm25_topk,
        bm25_topk_indexed,
        compact_text_index,
        extend_text_index,
        query_terms,
        write_text_index,
    )

    report: dict = {"n_docs": args.docs, "buckets": args.buckets}
    corpus_dir = tempfile.mkdtemp(prefix="cdc_text_corpus_")
    work = tempfile.mkdtemp(prefix="cdc_text_index_")
    try:
        t0 = time.monotonic()
        build_corpus_df(
            spark, args.docs, args.avg_tokens, args.partitions
        ).write.mode("overwrite").parquet(corpus_dir)
        docs = spark.read.parquet(corpus_dir)
        report["corpus_gib"] = round(
            docs.agg(F.sum("n_chars")).first()[0] / 2**30, 2
        )
        report["gen_write_s"] = round(time.monotonic() - t0, 1)

        qt = query_terms(spark, QUERIES).persist()
        qt.count()

        # JIT warm-up (SCALING §19 caveat): one throwaway tokenize job
        # so the first timed wall isn't paying codegen compilation.
        docs.limit(50_000).select(
            F.size(F.split("text", r"\s+")).alias("s")
        ).agg(F.sum("s")).count()

        # batch form: re-tokenizes the corpus per query set
        t0 = time.monotonic()
        batch_rows = sorted(
            map(tuple, bm25_topk(docs, qt, k=10).collect())
        )
        report["batch_query_s"] = round(time.monotonic() - t0, 1)

        # seed = 90%, batch = 10%
        seed = docs.where(F.col("doc_id") % 10 != 0)
        delta = docs.where(F.col("doc_id") % 10 == 0)
        idx = os.path.join(work, "index")
        t0 = time.monotonic()
        write_text_index(seed, idx, buckets=args.buckets)
        report["index_build_s"] = round(time.monotonic() - t0, 1)

        t0 = time.monotonic()
        seed_rows = bm25_topk_indexed(
            spark, idx, qt, k=10, buckets=args.buckets
        ).collect()
        report["probe_seed_s"] = round(time.monotonic() - t0, 2)
        report["n_hits_seed"] = len(seed_rows)

        t0 = time.monotonic()
        extend_text_index(spark, idx, delta, 0, buckets=args.buckets)
        report["extend_10pct_s"] = round(time.monotonic() - t0, 1)

        t0 = time.monotonic()
        ext_rows = sorted(
            map(
                tuple,
                bm25_topk_indexed(
                    spark, idx, qt, k=10, buckets=args.buckets
                ).collect(),
            )
        )
        report["probe_with_delta_s"] = round(time.monotonic() - t0, 2)

        t0 = time.monotonic()
        compact_text_index(spark, idx)
        report["compact_s"] = round(time.monotonic() - t0, 1)

        t0 = time.monotonic()
        compact_rows = sorted(
            map(
                tuple,
                bm25_topk_indexed(
                    spark, idx, qt, k=10, buckets=args.buckets
                ).collect(),
            )
        )
        report["probe_compacted_s"] = round(time.monotonic() - t0, 2)

        report["extended_equals_batch"] = ext_rows == batch_rows
        report["compacted_equals_batch"] = compact_rows == batch_rows

        # pruning evidence: posting files whose bucket dir matches a
        # query-term bucket vs all posting files (metadata walk only)
        q_buckets = {
            r["bucket"]
            for r in qt.select(
                F.pmod(F.xxhash64("term"), F.lit(args.buckets)).alias("bucket")
            ).distinct().collect()
        }
        touched = total = 0
        for root, _dirs, files in os.walk(os.path.join(idx, "postings")):
            pq = [f for f in files if f.endswith(".parquet")]
            if not pq:
                continue
            total += len(pq)
            b = [seg for seg in root.split(os.sep) if seg.startswith("bucket=")]
            if b and int(b[-1].split("=")[1]) in q_buckets:
                touched += len(pq)
        report["posting_files_touched"] = touched
        report["posting_files_total"] = total
        report["touched_fraction"] = round(touched / max(1, total), 4)
        print(json.dumps(report))
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
