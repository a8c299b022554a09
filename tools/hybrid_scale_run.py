#!/usr/bin/env python
"""The hybrid (lexical + semantic) two-store probe at corpus scale
(SCALING.md §25).

The fixture-level contract is pinned in tests and the driver rows
(hybrid_rrf_indexed: lexical leg bit-identical, fused recall floored;
streaming_hybrid_index: both stores extended under a shared epoch). This
run measures the ECONOMICS those can't — on a ~1M-doc corpus with a
64-dim vector per doc:

* build walls for BOTH stores (text: one tokenize + bucket exchange;
  PQ: Lloyd train + encode),
* the shared-epoch extend wall for a 10% batch (expectation: tracks the
  batch for both legs — resident postings/codes never re-read),
* the fused probe wall through the two durable stores,
* bytes/files touched PER LEG vs store size — the batch-proportional-
  I/O claim measured, not asserted: posting files in query-term bucket
  dirs / all posting files, and code files in the ≤ nprobe·|Q| probed
  cell dirs / all code files,
* fused overlap of the indexed probe vs the brute-semantic fusion
  (the recall tier the PQ leg carries; the lexical leg is checked for
  bit-identity against the batch BM25 instead).

Usage::

    python tools/hybrid_scale_run.py --docs 1000000
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

from tools.ann_scale_run import DIM, SEED, build_vectors_df  # noqa: E402
from tools.corpus_scale_run import build_corpus_df  # noqa: E402

QUERIES = [
    (1, "w00001 w00040 w00200"),
    (2, "w00003 w01000 w04000"),
    (3, "w00007 w00777"),
]
N_QVECS = 3
RRF_DEPTH = 20
K = 10


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--avg-tokens", type=int, default=700)
    ap.add_argument("--partitions", type=int, default=128)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--nlist", type=int, default=64)
    ap.add_argument("--nprobe", type=int, default=6)
    ap.add_argument("--iters", type=int, default=3)
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
        extend_text_index,
        mips_topk,
        query_terms,
        rrf_fuse,
        write_text_index,
    )
    from cdc_algorithms_spark.operators.similarity import (
        extend_pq_index,
        pq_topk_indexed,
        read_pq_index,
        write_pq_index,
    )

    report: dict = {
        "n_docs": args.docs,
        "buckets": args.buckets,
        "nlist": args.nlist,
        "nprobe": args.nprobe,
    }
    corpus_dir = tempfile.mkdtemp(prefix="cdc_hybrid_corpus_")
    vec_dir = tempfile.mkdtemp(prefix="cdc_hybrid_vecs_")
    work = tempfile.mkdtemp(prefix="cdc_hybrid_store_")
    try:
        t0 = time.monotonic()
        build_corpus_df(
            spark, args.docs, args.avg_tokens, args.partitions
        ).write.mode("overwrite").parquet(corpus_dir)
        build_vectors_df(spark, args.docs, args.partitions).write.mode(
            "overwrite"
        ).parquet(vec_dir)
        docs = spark.read.parquet(corpus_dir)
        vecs = spark.read.parquet(vec_dir)
        report["corpus_gib"] = round(
            docs.agg(F.sum("n_chars")).first()[0] / 2**30, 2
        )
        report["gen_write_s"] = round(time.monotonic() - t0, 1)

        qt = query_terms(spark, QUERIES).persist()
        qt.count()
        # semantic queries: eps-perturbations of known corpus vectors
        import numpy as np

        step = args.docs // N_QVECS
        qrows = []
        for j in range(N_QVECS):
            t = j * step
            base = np.random.default_rng([SEED, t]).uniform(-1.0, 1.0, DIM)
            noise = np.random.default_rng([SEED, 9, t]).uniform(-1.0, 1.0, DIM)
            qrows.append((j + 1, (base + 0.02 * noise).tolist()))
        qvecs = spark.createDataFrame(
            qrows, "query_id long, embedding array<double>"
        ).persist()
        qvecs.count()

        # JIT warm-up (SCALING §19 caveat)
        docs.limit(50_000).select(
            F.size(F.split("text", r"\s+")).alias("s")
        ).agg(F.sum("s")).count()

        seed_docs = docs.where(F.col("doc_id") % 10 != 0)
        seed_vecs = vecs.where(F.col("vec_id") % 10 != 0)
        text_path = os.path.join(work, "text")
        pq_path = os.path.join(work, "pq")

        t0 = time.monotonic()
        write_text_index(seed_docs, text_path, buckets=args.buckets)
        report["text_build_s"] = round(time.monotonic() - t0, 1)
        t0 = time.monotonic()
        write_pq_index(
            seed_vecs, pq_path, dim=DIM, m=8, ksub=16, nlist=args.nlist,
            iters=args.iters,
        )
        report["pq_build_s"] = round(time.monotonic() - t0, 1)

        # shared-epoch extend of the remaining 10% — the streaming
        # loop's per-batch verb pair, timed per leg
        t0 = time.monotonic()
        extend_text_index(
            spark, text_path, docs.where(F.col("doc_id") % 10 == 0), 0,
            buckets=args.buckets,
        )
        report["text_extend_10pct_s"] = round(time.monotonic() - t0, 1)
        t0 = time.monotonic()
        extend_pq_index(
            spark, pq_path, vecs.where(F.col("vec_id") % 10 == 0), 0
        )
        report["pq_extend_10pct_s"] = round(time.monotonic() - t0, 1)

        index = read_pq_index(spark, pq_path)

        # the fused probe through both durable stores
        t0 = time.monotonic()
        lex = bm25_topk_indexed(
            spark, text_path, qt, k=RRF_DEPTH, buckets=args.buckets
        ).select("query_id", "doc_id", "rank").persist()
        n_lex = lex.count()
        report["lex_probe_s"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        sem_idx = pq_topk_indexed(
            qvecs, index, vecs, k=RRF_DEPTH, nprobe=args.nprobe, rerank=6
        ).select("query_id", F.col("vec_id").alias("doc_id"), "rank").persist()
        sem_idx.count()
        report["sem_probe_s"] = round(time.monotonic() - t0, 2)
        t0 = time.monotonic()
        fused_idx = {
            (r.query_id, r.doc_id)
            for r in rrf_fuse([lex, sem_idx], k=K).select(
                "query_id", "doc_id"
            ).collect()
        }
        report["fuse_s"] = round(time.monotonic() - t0, 2)
        report["n_lex"] = n_lex

        # lexical bit-identity vs the batch form (re-tokenizes corpus)
        t0 = time.monotonic()
        lex_batch = sorted(
            map(
                tuple,
                bm25_topk(docs, qt, k=RRF_DEPTH)
                .select("query_id", "doc_id", "rank")
                .collect(),
            )
        )
        report["lex_batch_s"] = round(time.monotonic() - t0, 1)
        report["lex_bit_identical"] = (
            sorted(map(tuple, lex.collect())) == lex_batch
        )

        # fused overlap vs the brute-semantic fusion (recall tier)
        sem_brute = mips_topk(vecs, qvecs, k=RRF_DEPTH)
        fused_exact = {
            (r.query_id, r.doc_id)
            for r in rrf_fuse([lex, sem_brute], k=K).select(
                "query_id", "doc_id"
            ).collect()
        }
        report["fused_overlap"] = round(
            len(fused_idx & fused_exact) / max(1, len(fused_exact)), 4
        )

        # per-leg I/O evidence: files in probed dirs / all files
        q_buckets = {
            r["b"]
            for r in qt.select(
                F.pmod(F.xxhash64("term"), F.lit(args.buckets)).alias("b")
            ).distinct().collect()
        }
        cents = np.array(index.cents)
        probed_cells = set()
        for _qid, emb in qrows:
            d = ((cents - np.array(emb)) ** 2).sum(axis=1)
            probed_cells.update(
                (np.argsort(d)[: args.nprobe] + 1).tolist()
            )

        def touched_fraction(root_dir: str, part_key: str, keys: set):
            touched = total = 0
            for root, _dirs, files in os.walk(root_dir):
                pq = [f for f in files if f.endswith(".parquet")]
                if not pq:
                    continue
                total += len(pq)
                seg = [
                    s for s in root.split(os.sep)
                    if s.startswith(f"{part_key}=")
                ]
                if seg and int(seg[-1].split("=")[1]) in keys:
                    touched += len(pq)
            return touched, total

        t, tot = touched_fraction(
            os.path.join(text_path, "postings"), "bucket", q_buckets
        )
        dt, dtot = touched_fraction(
            os.path.join(text_path, "postings_delta"), "bucket", q_buckets
        )
        report["text_files_touched"] = t + dt
        report["text_files_total"] = tot + dtot
        report["text_touched_fraction"] = round(
            (t + dt) / max(1, tot + dtot), 4
        )
        ct, ctot = touched_fraction(
            os.path.join(pq_path, "codes"), "cell", probed_cells
        )
        cdt, cdtot = touched_fraction(
            os.path.join(pq_path, "codes_delta"), "cell", probed_cells
        )
        report["pq_files_touched"] = ct + cdt
        report["pq_files_total"] = ctot + cdtot
        report["pq_touched_fraction"] = round(
            (ct + cdt) / max(1, ctot + cdtot), 4
        )
        print(json.dumps(report))
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(vec_dir, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
