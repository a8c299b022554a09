#!/usr/bin/env python
"""Durable DSIR term-count store economics at corpus scale (§24).

The §22 question, restated for the selection tier: the batch
`dsir_importance_weights` re-tokenizes the whole corpus to rebuild its
unigram models for every scoring run; the durable store
(`write_dsir_counts` / `extend_dsir_counts` / `dsir_weights_indexed`)
pays the fold once and then (a) extends batch-proportionally and
(b) scores against the folded vocabulary-sized counts. This run
measures, over the §15 synthetic corpus:

* seed build wall (2/3 corpus) and extend wall (1/6 corpus batch —
  must track the batch, not the resident store),
* indexed scoring wall for a SMALL probe slice vs the batch form's
  wall for the same slice (the batch form pays the whole-corpus model
  rebuild regardless of how few docs it scores),
* bit-equality of indexed vs batch weights on the probe slice when
  the store folds the same corpus (spot check, full pin in tests).

Usage::

    python tools/dsir_scale_run.py --docs 1000000
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--avg-tokens", type=int, default=700)
    ap.add_argument("--partitions", type=int, default=128)
    ap.add_argument("--probe-docs", type=int, default=10_000)
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

    from cdc_algorithms_spark.operators.selection import (
        dsir_importance_weights,
        dsir_weights_indexed,
        extend_dsir_counts,
        write_dsir_counts,
    )

    report: dict = {"n_docs": args.docs, "probe_docs": args.probe_docs}
    corpus_dir = tempfile.mkdtemp(prefix="cdc_dsir_corpus_")
    store = tempfile.mkdtemp(prefix="cdc_dsir_store_") + "/counts_store"
    try:
        t0 = time.monotonic()
        build_corpus_df(
            spark, args.docs, args.avg_tokens, args.partitions
        ).write.mode("overwrite").parquet(corpus_dir)
        docs = spark.read.parquet(corpus_dir).withColumn(
            "lang", F.col("source")
        )
        report["gen_write_s"] = round(time.monotonic() - t0, 1)
        tgt = F.col("source").isin(["src0", "src1"])

        seed = docs.where(F.col("doc_id") % 3 != 0)          # 2/3
        batch = docs.where(F.col("doc_id") % 3 == 0)         # 1/3
        t0 = time.monotonic()
        write_dsir_counts(seed, tgt, store)
        report["seed_build_s"] = round(time.monotonic() - t0, 1)
        t0 = time.monotonic()
        extend_dsir_counts(spark, store, batch, tgt, 0)
        report["extend_s"] = round(time.monotonic() - t0, 1)

        probe = docs.where(F.col("doc_id") < args.probe_docs)
        t0 = time.monotonic()
        n_idx = dsir_weights_indexed(spark, store, probe).count()
        report["indexed_probe_s"] = round(time.monotonic() - t0, 1)
        report["indexed_probe_rows"] = n_idx

        # the batch form scoring the SAME slice still models the slice
        # only — to score against the CORPUS models it must see the
        # corpus, which is exactly the rebuild the store amortizes
        t0 = time.monotonic()
        n_full = dsir_importance_weights(docs, tgt).where(
            F.col("doc_id") < args.probe_docs
        ).count()
        report["batch_full_model_s"] = round(time.monotonic() - t0, 1)
        assert n_idx == n_full == args.probe_docs

        # bit-equality spot check on 200 docs (store folds == corpus)
        spot = docs.where(F.col("doc_id") < 200)
        a = sorted(
            map(tuple, dsir_weights_indexed(spark, store, spot).collect())
        )
        b = sorted(
            map(
                tuple,
                dsir_importance_weights(docs, tgt)
                .where(F.col("doc_id") < 200)
                .collect(),
            )
        )
        report["spot_bit_equal"] = a == b
        print(json.dumps(report))
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        shutil.rmtree(os.path.dirname(store), ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
