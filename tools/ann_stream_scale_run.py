#!/usr/bin/env python
"""Corpus-scale evidence for the STREAM-MAINTAINED PQ index (§19).

§18 measures the durable index built in one shot; this measures the
r07 streaming form (streaming/ann_index.py): the model trains once on
a SEED half of the corpus, the other half arrives as encode-only
foreachBatch epochs (operators/similarity.py::extend_pq_index), and
probes answer against seed ∪ streamed. Recorded per scale point:

* per-epoch extend wall while the index grows (expectation: FLAT —
  each epoch is one map-side encode + one cell hash exchange of
  m-byte codes, batch-proportional, with the few-KB model row as the
  only driver traffic),
* planted recall@1 / recall@ps through the streamed index vs the
  one-shot §18-style build over the full corpus (expectation: the
  seed-trained model generalizes — recall within a few points),
* probe wall through base + delta scans (expectation: ≈ the one-shot
  probe — the deltas add scan branches, all statically cell-pruned).

Same deterministic corpus + planted-truth design as
tools/ann_scale_run.py (imported).

Usage::

    python tools/ann_stream_scale_run.py --n 250000
    python tools/ann_stream_scale_run.py --n 1000000 --driver-mem 64g
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(TOOLS)
sys.path.insert(0, ROOT)
sys.path.insert(0, TOOLS)

from ann_scale_run import (  # noqa: E402
    DIM,
    TWINS,
    build_queries,
    build_vectors_df,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=250_000)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--partitions", type=int, default=128)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--driver-mem", default="48g")
    ap.add_argument("--nlist", type=int, default=64)
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--iters", type=int, default=2)
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

    from cdc_algorithms_spark.operators import similarity as S

    report: dict = {
        "n_vectors": args.n,
        "dim": DIM,
        "n_queries": args.queries,
        "k": args.k,
        "nlist": args.nlist,
        "nprobe": args.nprobe,
        "epochs": args.epochs,
    }

    corpus_dir = tempfile.mkdtemp(prefix="cdc_annstream_corpus_")
    streamed_dir = tempfile.mkdtemp(prefix="cdc_annstream_idx_") + "/streamed"
    oneshot_dir = tempfile.mkdtemp(prefix="cdc_annstream_idx1_") + "/oneshot"
    try:
        step = args.n // args.queries
        t0 = time.monotonic()
        build_vectors_df(spark, args.n, args.partitions, step=step).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
        report["gen_write_s"] = round(time.monotonic() - t0, 1)
        corpus = spark.read.parquet(corpus_dir)

        queries = build_queries(spark, args.n, args.queries).persist()
        queries.count()
        ps = TWINS + 1
        truth = {
            r.query_id: set(range(r.target_id, min(r.target_id + ps, args.n)))
            for r in queries.select("query_id", "target_id").collect()
        }
        q = queries.select("query_id", "embedding")

        # seed = even ids (half the corpus, same distribution); the odd
        # half streams in as encode-only epochs
        seed = corpus.where(F.col("vec_id") % 2 == 0)
        rest = corpus.where(F.col("vec_id") % 2 == 1)

        t0 = time.monotonic()
        S.write_pq_index(
            seed, streamed_dir, dim=DIM, nlist=args.nlist, iters=args.iters
        )
        report["seed_build_s"] = round(time.monotonic() - t0, 1)

        walls = []
        for e in range(args.epochs):
            batch = rest.where(
                (F.col("vec_id") / 2).cast("long") % args.epochs == e
            )
            t0 = time.monotonic()
            S.extend_pq_index(spark, streamed_dir, batch, epoch=e)
            walls.append(round(time.monotonic() - t0, 1))
        report["extend_walls_s"] = walls

        def probe(path, tag):
            idx = S.read_pq_index(spark, path)
            t0 = time.monotonic()
            out = (
                S.pq_topk_indexed(
                    q, idx, corpus, k=args.k, nprobe=args.nprobe, rerank=4
                )
                .select("query_id", "rank", "vec_id")
                .collect()
            )
            report[f"{tag}_probe_s"] = round(time.monotonic() - t0, 1)
            got1 = {r.query_id: r.vec_id for r in out if r.rank == 1}
            qids = {r.query_id for r in out}
            report[f"{tag}_planted_recall@1"] = round(
                sum(1 for qq in qids if got1.get(qq) in truth[qq])
                / max(1, len(qids)),
                4,
            )
            by_q: dict[int, set] = {}
            for r in out:
                if r.rank <= ps:
                    by_q.setdefault(r.query_id, set()).add(r.vec_id)
            report[f"{tag}_planted_recall@{ps}"] = round(
                sum(
                    len(v & truth[qq]) / len(truth[qq])
                    for qq, v in by_q.items()
                )
                / max(1, len(by_q)),
                4,
            )
            n_codes = idx.codes.count()
            report[f"{tag}_codes"] = n_codes

        probe(streamed_dir, "streamed")

        # the index OPTIMIZE: fold the deltas into one base store and
        # re-probe — the probe should drop back to one-generation cost
        t0 = time.monotonic()
        S.compact_pq_index(spark, streamed_dir)
        report["compact_s"] = round(time.monotonic() - t0, 1)
        probe(streamed_dir, "compacted")

        # one-shot reference: train + encode the FULL corpus in one pass
        t0 = time.monotonic()
        S.write_pq_index(
            corpus, oneshot_dir, dim=DIM, nlist=args.nlist, iters=args.iters
        )
        report["oneshot_build_s"] = round(time.monotonic() - t0, 1)
        probe(oneshot_dir, "oneshot")

        print(json.dumps(report))
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(os.path.dirname(streamed_dir), ignore_errors=True)
        shutil.rmtree(os.path.dirname(oneshot_dir), ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
