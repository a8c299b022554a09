#!/usr/bin/env python
"""Codebook-drift erode → rebuild → recover at corpus scale (§19 addendum).

§19 streams a SAME-distribution half through the frozen model and shows
recall holds. This run measures the failure mode that contract
documents and ``rebuild_pq_index`` repairs: the streamed half comes
from a SHIFTED distribution (a displaced, tighter cluster the seed
codebooks never saw), queries target planted twins INSIDE the shifted
region, and the report records

* planted recall@1/@ps through the drifted index (seed model + encode-
  only deltas) — expectation: ERODED (the coarse quantizer collapses
  the whole shifted region into a few cells and the PQ codebooks
  quantize it coarsely, so ADC ordering degrades before the bounded
  re-rank can save it),
* the shifted-code cell skew (top-cell share of shifted codes) before
  and after — the mechanism, not just the symptom,
* rebuild wall (one retrain + full re-encode + rename-first swap), and
* recall through the REBUILT index — expectation: recovered to the
  §18 level (planted recall ≈ 1.0), deltas subsumed.

Deterministic corpus; base half reuses tools/ann_scale_run.py's
generator design, shifted half is ``SHIFT + SHIFT_SPREAD * uniform``
with SHIFT a fixed direction of norm SHIFT_SCALE (outside the base
support) and SHIFT_SPREAD chosen in the regime where the stale
codebooks CANNOT resolve the new domain (codes collide → ADC ties →
the bounded re-rank draws from a tied pool) but a retrained quantizer
CAN (fixture sweep at 20k: spread 1.0 → no erosion at all; 0.12 →
erodes but Lloyd's mean-collapse on a near-zero-variance blob can't
resolve it even retrained; 0.2–0.3 → erodes AND recovers).

Usage::

    python tools/ann_rebuild_scale_run.py --n 250000
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

from ann_scale_run import DIM, EPS, SEED, TWINS  # noqa: E402

SHIFT_SCALE = 2.5   # displacement: the new domain sits outside the base support
SHIFT_SPREAD = 0.25  # new-domain spread: tight enough to defeat the stale codebooks, wide enough for a retrain to resolve


def build_drift_corpus_df(spark, n: int, partitions: int, step: int):
    """(vec_id, embedding): ids < n/2 are the base uniform corpus;
    ids >= n/2 sit in a displaced tighter cluster. In the shifted
    half, each base id ``b`` (b ≡ n/2 mod step) has TWINS planted
    eps-perturbed twins at b+1..b+TWINS."""
    half = n // 2

    def gen(batches):
        import numpy as np
        import pandas as pd

        shift = np.random.default_rng([SEED, 9]).uniform(-1.0, 1.0, DIM)
        shift = SHIFT_SCALE * shift / np.linalg.norm(shift)

        def base_vec(i: int):
            return np.random.default_rng([SEED, i]).uniform(-1.0, 1.0, DIM)

        def shifted_vec(i: int):
            u = np.random.default_rng([SEED, 11, i]).uniform(-1.0, 1.0, DIM)
            return shift + SHIFT_SPREAD * u

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = []
            for i in ids:
                i = int(i)
                if i < half:
                    vecs.append(base_vec(i).tolist())
                else:
                    pos = (i - half) % step
                    if 1 <= pos <= TWINS:
                        b = shifted_vec(i - pos)
                        noise = np.random.default_rng(
                            [SEED, 3, i]
                        ).uniform(-1.0, 1.0, DIM)
                        vecs.append((b + EPS * noise).tolist())
                    else:
                        vecs.append(shifted_vec(i).tolist())
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return spark.range(n, numPartitions=partitions).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )


def build_shifted_queries(spark, n: int, n_queries: int, step: int):
    """Queries target planted twins in the SHIFTED half: query j is an
    eps-perturbation of shifted base t_j = n/2 + j*step."""
    import numpy as np

    half = n // 2
    shift = np.random.default_rng([SEED, 9]).uniform(-1.0, 1.0, DIM)
    shift = SHIFT_SCALE * shift / np.linalg.norm(shift)
    rows = []
    for j in range(n_queries):
        t = half + j * step
        u = np.random.default_rng([SEED, 11, t]).uniform(-1.0, 1.0, DIM)
        base = shift + SHIFT_SPREAD * u
        noise = np.random.default_rng([SEED, 7, j]).uniform(-1.0, 1.0, DIM)
        rows.append((j, t, (base + EPS * noise).tolist()))
    return spark.createDataFrame(
        rows, "query_id long, target_id long, embedding array<double>"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=250_000)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--epochs", type=int, default=4)
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
        "shift_scale": SHIFT_SCALE,
        "shift_spread": SHIFT_SPREAD,
    }

    corpus_dir = tempfile.mkdtemp(prefix="cdc_annreb_corpus_")
    idx_dir = tempfile.mkdtemp(prefix="cdc_annreb_idx_") + "/index"
    try:
        half = args.n // 2
        step = half // args.queries
        t0 = time.monotonic()
        build_drift_corpus_df(
            spark, args.n, args.partitions, step
        ).write.mode("overwrite").parquet(corpus_dir)
        report["gen_write_s"] = round(time.monotonic() - t0, 1)
        corpus = spark.read.parquet(corpus_dir)

        queries = build_shifted_queries(
            spark, args.n, args.queries, step
        ).persist()
        queries.count()
        ps = TWINS + 1
        truth = {
            r.query_id: set(
                range(r.target_id, min(r.target_id + ps, args.n))
            )
            for r in queries.select("query_id", "target_id").collect()
        }
        q = queries.select("query_id", "embedding")

        # seed model: BASE half only — the shifted geometry is unseen
        seed = corpus.where(F.col("vec_id") < half)
        rest = corpus.where(F.col("vec_id") >= half)
        t0 = time.monotonic()
        S.write_pq_index(
            seed, idx_dir, dim=DIM, nlist=args.nlist, iters=args.iters
        )
        report["seed_build_s"] = round(time.monotonic() - t0, 1)

        walls = []
        for e in range(args.epochs):
            batch = rest.where(
                (F.col("vec_id") - half) % args.epochs == e
            )
            t0 = time.monotonic()
            S.extend_pq_index(spark, idx_dir, batch, epoch=e)
            walls.append(round(time.monotonic() - t0, 1))
        report["extend_walls_s"] = walls

        def cell_skew(tag):
            # top-cell share of the SHIFTED half's codes: the coarse-
            # quantizer collapse that drives the erosion
            idx = S.read_pq_index(spark, idx_dir)
            per = (
                idx.codes.where(F.col("vec_id") >= half)
                .groupBy("cell")
                .count()
                .collect()
            )
            tot = sum(r["count"] for r in per)
            report[f"{tag}_shifted_top_cell_share"] = round(
                max(r["count"] for r in per) / max(1, tot), 4
            )
            report[f"{tag}_shifted_cells_used"] = len(per)

        def probe(tag):
            idx = S.read_pq_index(spark, idx_dir)
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
            report[f"{tag}_codes"] = idx.codes.count()

        cell_skew("drifted")
        probe("drifted")

        # r09 DETECT verb: the integer-exact drift statistic over the
        # per-cell stats the build/extends wrote alongside the codes —
        # the trigger that makes the rebuild below policy, not manual
        def drift_totals(tag):
            t0 = time.monotonic()
            tot = S.pq_drift_report(spark, idx_dir).agg(
                F.sum("n_seed").alias("ns"),
                F.sum("err_seed_q").alias("es"),
                F.sum("n_new").alias("nn"),
                F.sum("err_new_q").alias("en"),
            ).collect()[0]
            report[f"{tag}_drift_report_s"] = round(time.monotonic() - t0, 1)
            ns, es, nn, en = (
                int(tot[c] or 0) for c in ("ns", "es", "nn", "en")
            )
            report[f"{tag}_drift_n_new"] = nn
            report[f"{tag}_drift_ppm"] = (
                (en * ns * 1_000_000) // (es * nn) if nn and es else None
            )

        drift_totals("drifted")

        t0 = time.monotonic()
        rebuilt = S.rebuild_pq_index_if_drifted(
            spark, idx_dir, corpus, max_ppm=1_050_000, iters=args.iters
        )
        report["rebuild_s"] = round(time.monotonic() - t0, 1)
        report["rebuild_triggered"] = bool(rebuilt)
        drift_totals("rebuilt")
        cell_skew("rebuilt")
        probe("rebuilt")

        print(json.dumps(report))
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(os.path.dirname(idx_dir), ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
