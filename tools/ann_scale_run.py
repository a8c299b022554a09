#!/usr/bin/env python
"""Corpus-scale ANN evidence run (SCALING.md §18).

§15 measures the near-dup pipeline at corpus scale; this gives the
similarity operators the same treatment: a deterministic multi-million
-vector corpus (executor-generated, never materialized on the driver)
with PLANTED nearest-neighbor ground truth, pushed through every ANN
tier — brute force (the exact baseline), sign-LSH, IVF, and the
durable IVF-PQ index (write once, probe training-free) — recording at
each scale point:

* planted recall@1 per method (each query is a corpus vector plus a
  small perturbation, so its true top-1 neighbor is KNOWN — measured
  against ground truth, not estimated),
* recall@k vs the exact brute-force top-k on a query subset (the
  agreement beyond the planted pair),
* probe wall per method vs the brute-force wall (the price of exact),
* index build wall for the durable PQ store (paid once, amortized
  over every later batch).

Corpus design: vector ``i`` is 64 uniform draws from a counter-based
rng keyed ``[SEED, i]`` — deterministic per id, independent of
partitioning. Query ``j`` targets BASE id ``t_j = j * (n//q)``; the
base's next ``TWINS`` ids (``t_j+1 .. t_j+TWINS``) are planted
perturbations of the base vector, and the query is another
perturbation — so each query has a KNOWN true neighbor set of size
TWINS+1, all at cosine ≈ 1 - eps^2/2 ≈ 0.997, far above the ~0.66
max-random-cosine tail at 1M vectors. Planted recall@k is measured
against that set; agreement with brute force beyond it is ALSO
reported but is a weak signal by design — on a uniform corpus, ranks
past the planted set are statistical ties (cosine gaps ~1e-3) where
"the" exact neighbor is an arbitrary choice among equals.

Usage::

    python tools/ann_scale_run.py --n 100000
    python tools/ann_scale_run.py --n 1000000 --driver-mem 64g
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

SEED = 20260815
DIM = 64
EPS = 0.08
TWINS = 4  # planted near-neighbors per query target, besides the base


def build_vectors_df(spark, n: int, partitions: int, step: int = 0):
    """Lazy generator frame: (vec_id, embedding array<double>). With
    ``step`` > 0, ids ``b+1 .. b+TWINS`` for each base ``b`` (multiple
    of step) are eps-perturbed twins of the base vector."""

    def gen(batches):
        import numpy as np
        import pandas as pd

        def vec_of(i: int) -> "np.ndarray":
            return np.random.default_rng([SEED, i]).uniform(-1.0, 1.0, DIM)

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                i = int(i)
                pos = i % step if step else 0
                if step and 1 <= pos <= TWINS:
                    base = vec_of(i - pos)
                    noise = np.random.default_rng([SEED, 3, i]).uniform(
                        -1.0, 1.0, DIM
                    )
                    vecs.append((base + EPS * noise).tolist())
                else:
                    vecs.append(vec_of(i).tolist())
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return spark.range(n, numPartitions=partitions).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )


def build_queries(spark, n: int, n_queries: int):
    """(query_id, target_id, embedding): corpus base vector + eps*noise;
    the true neighbor set of query j is {t_j, t_j+1, .., t_j+TWINS}."""
    import numpy as np

    rows = []
    step = n // n_queries
    for j in range(n_queries):
        t = j * step
        base = np.random.default_rng([SEED, t]).uniform(-1.0, 1.0, DIM)
        noise = np.random.default_rng([SEED, 7, j]).uniform(-1.0, 1.0, DIM)
        v = base + EPS * noise
        rows.append((j, t, v.tolist()))
    return spark.createDataFrame(
        rows, "query_id long, target_id long, embedding array<double>"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--brute-queries", type=int, default=50)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--partitions", type=int, default=128)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--driver-mem", default="48g")
    ap.add_argument("--nlist", type=int, default=64)
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--bits", type=int, default=6)
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
        "eps": EPS,
        "nlist": args.nlist,
        "nprobe": args.nprobe,
        "lsh_bits": args.bits,
    }

    corpus_dir = tempfile.mkdtemp(prefix="cdc_ann_corpus_")
    index_dir = tempfile.mkdtemp(prefix="cdc_ann_pqindex_")
    try:
        step = args.n // args.queries
        t0 = time.monotonic()
        build_vectors_df(spark, args.n, args.partitions, step=step).write.mode(
            "overwrite"
        ).parquet(corpus_dir)
        report["gen_write_s"] = round(time.monotonic() - t0, 1)
        corpus = spark.read.parquet(corpus_dir)
        report["corpus_gib"] = round(
            sum(
                f.stat().st_size
                for f in os.scandir(corpus_dir)
                if f.name.endswith(".parquet")
            )
            / 2**30,
            2,
        )

        queries = build_queries(spark, args.n, args.queries).persist()
        queries.count()
        ps = TWINS + 1  # planted-set size per query
        truth = {
            r.query_id: set(range(r.target_id, min(r.target_id + ps, args.n)))
            for r in queries.select("query_id", "target_id").collect()
        }
        q = queries.select("query_id", "embedding")
        q_sub = q.where(F.col("query_id") < args.brute_queries)

        results: dict[str, set] = {}

        def score(name, out):
            got1 = {r.query_id: r.vec_id for r in out if r.rank == 1}
            qids = {r.query_id for r in out}
            report[f"{name}_planted_recall@1"] = round(
                sum(1 for qq in qids if got1.get(qq) in truth[qq])
                / max(1, len(qids)),
                4,
            )
            # recall@ps against the full planted neighbor set
            by_q: dict[int, set] = {}
            for r in out:
                if r.rank <= ps:
                    by_q.setdefault(r.query_id, set()).add(r.vec_id)
            report[f"{name}_planted_recall@{ps}"] = round(
                sum(len(v & truth[qq]) / len(truth[qq])
                    for qq, v in by_q.items())
                / max(1, len(by_q)),
                4,
            )
            results[name] = {
                (r.query_id, r.vec_id)
                for r in out
                if r.query_id < args.brute_queries
            }

        def run(name, fn, queries_df):
            t = time.monotonic()
            out = fn(queries_df).select("query_id", "rank", "vec_id").collect()
            report[f"{name}_probe_s"] = round(time.monotonic() - t, 1)
            score(name, out)

        # --- exact baseline on the query subset -----------------------------
        t0 = time.monotonic()
        brute = S.brute_force_topk(q_sub, corpus, k=args.k)
        brute_rows = brute.select("query_id", "rank", "vec_id").collect()
        report["brute_probe_s"] = round(time.monotonic() - t0, 1)
        report["brute_queries"] = args.brute_queries
        score("brute", brute_rows)
        brute_set = {(r.query_id, r.vec_id) for r in brute_rows}

        # --- LSH --------------------------------------------------------------
        run(
            "lsh",
            lambda qq: S.lsh_topk(
                qq, corpus, k=args.k, dim=DIM, bits=args.bits, multiprobe=2
            ),
            q,
        )

        # --- IVF: train timed separately, probe reuses the centroids ---------
        t0 = time.monotonic()
        cents = S.kmeans_centroids(
            corpus, args.nlist, DIM, iters=args.iters
        )
        report["ivf_train_s"] = round(time.monotonic() - t0, 1)
        run(
            "ivf",
            lambda qq: S.ivf_topk(
                qq, corpus, k=args.k, dim=DIM, nlist=args.nlist,
                nprobe=args.nprobe, cents=cents,
            ),
            q,
        )

        # --- durable IVF-PQ: build once, probe training-free -----------------
        t0 = time.monotonic()
        S.write_pq_index(
            corpus, index_dir, dim=DIM, m=8, ksub=16, nlist=args.nlist,
            iters=args.iters,
        )
        report["pq_index_build_s"] = round(time.monotonic() - t0, 1)
        index = S.read_pq_index(spark, index_dir)
        run(
            "pq",
            lambda qq: S.pq_topk_indexed(
                qq, index, corpus, k=args.k, nprobe=args.nprobe, rerank=4
            ),
            q,
        )

        # --- recall@k vs exact on the subset ----------------------------------
        for name, got in results.items():
            if name == "brute":
                continue
            report[f"{name}_recall@{args.k}_vs_brute"] = round(
                len(got & brute_set) / max(1, len(brute_set)), 4
            )

        print(json.dumps(report))
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(index_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
