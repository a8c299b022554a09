#!/usr/bin/env python
"""The r08 selection/tokenizer operators at corpus scale (SCALING.md §23).

Drives the three new per-document curation signals and BPE induction
over the §15 synthetic corpus (~1M docs, 20% planted 2%-mutated
clones) and reports:

* `cross_doc_dup_fraction` wall + the planted-structure check (clone
  pairs share most 8-grams, so clones and their bases must score high
  while the organic corpus scores low),
* `exact_substring_dedup` wall + conservation (kept + removed tokens
  == corpus tokens) + the removable-volume claim (clones lose most of
  their tokens; organic docs lose few),
* `dsir_importance_weights` wall over a synthetic target slice,
* `learn_bpe` wall for 12 rounds + the vocabulary-collapse economics
  (the iterating frame's row count vs the corpus row count).

Usage::

    python tools/selection_scale_run.py --docs 1000000
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
    ap.add_argument(
        "--span-docs",
        type=int,
        default=500_000,
        help="doc count for the span-dedup section: within one action "
        "Spark retains EVERY stage's shuffle files, and the span "
        "surgery chains four gram/token-keyed shuffles — at 1M docs "
        "their sum exceeds this container's ~70 GiB of local disk "
        "even fingerprinted (measured, twice), while 500k fits. On a "
        "real cluster this is a disk-provisioning line, not an "
        "operator limit: shuffle bytes stay batch-linear.",
    )
    ap.add_argument("--avg-tokens", type=int, default=700)
    ap.add_argument("--partitions", type=int, default=128)
    ap.add_argument("--merges", type=int, default=32000)
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

    from cdc_algorithms_spark.operators.bpe import learn_bpe, word_freq_table
    from cdc_algorithms_spark.operators.selection import (
        cross_doc_dup_fraction,
        dsir_importance_weights,
        remove_duplicate_spans,
    )

    report: dict = {"n_docs": args.docs, "merges": args.merges}
    corpus_dir = tempfile.mkdtemp(prefix="cdc_sel_corpus_")
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
        # §15 corpus design: ids with doc_id % 10 >= 8 are 2%-mutated
        # clones of base doc_id - (doc_id % 10 - 7) ... (clone marker)
        is_clone = F.col("doc_id") % 10 >= 8

        # cross-doc duplicate fraction on the DEFAULT path: above
        # FINGERPRINT_AUTO_DOCS the operator auto-selects the 128-bit
        # fingerprint grams (16-byte shuffles, same counts) — the r09
        # change that stops a default caller hitting the measured
        # exact-string disk cliff
        t0 = time.monotonic()
        frac = cross_doc_dup_fraction(docs, n=8).persist()
        stats = (
            frac.join(docs.select("doc_id"), "doc_id")
            .groupBy(is_clone.alias("clone"))
            .agg(
                F.avg("dup_fraction").alias("avg_frac"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        report["dup_fraction_wall_s"] = round(time.monotonic() - t0, 1)
        for r in stats:
            key = "clone" if r["clone"] else "organic"
            report[f"avg_dup_fraction_{key}"] = round(r["avg_frac"], 4)
        frac.unpersist()

        # substring-span dedup (fingerprinted grams; --span-docs subset
        # — see the flag's help for the measured local-disk ceiling) +
        # conservation + removable volume
        span_docs = docs.where(F.col("doc_id") < args.span_docs)
        report["span_docs"] = args.span_docs
        t0 = time.monotonic()
        spans = remove_duplicate_spans(span_docs, n=8).persist()  # default path
        agg = spans.agg(
            F.sum("n_tokens").alias("tok"),
            F.sum("n_removed").alias("rem"),
        ).first()
        report["span_dedup_wall_s"] = round(time.monotonic() - t0, 1)
        report["tokens_total"] = int(agg["tok"])
        report["tokens_removed"] = int(agg["rem"])
        per = (
            spans.join(span_docs.select("doc_id"), "doc_id")
            .groupBy(is_clone.alias("clone"))
            .agg(
                F.avg(F.col("n_removed") * F.lit(1.0) / F.col("n_tokens"))
                .alias("avg_removed_frac")
            )
            .collect()
        )
        for r in per:
            key = "clone" if r["clone"] else "organic"
            report[f"avg_removed_frac_{key}"] = round(
                r["avg_removed_frac"], 4
            )
        # conservation: kept tokens recount equals total - removed
        kept_recount = spans.agg(
            F.sum(
                F.when(F.col("cleaned_text") == "", F.lit(0)).otherwise(
                    F.size(F.split("cleaned_text", r"\s+"))
                )
            )
        ).first()[0]
        report["conservation_ok"] = (
            int(kept_recount) == report["tokens_total"] - report["tokens_removed"]
        )
        spans.unpersist()

        # DSIR weights over a synthetic target slice (sources 0-4)
        t0 = time.monotonic()
        docs_l = docs.withColumn("lang", F.col("source"))
        n_w = dsir_importance_weights(
            docs_l, F.col("source").isin(["src0", "src1"])
        ).count()
        report["dsir_wall_s"] = round(time.monotonic() - t0, 1)
        report["dsir_rows"] = n_w

        # BPE induction at a PRODUCTION merge request: Spark folds the
        # corpus to the word-frequency frame; the merge loop runs
        # driver-side over the collected vocabulary (r09 — the old
        # 2-jobs-per-round form cost ~3 s/round, i.e. ~27 h at 32k)
        t0 = time.monotonic()
        vocab_rows = word_freq_table(docs).count()
        report["vocab_rows"] = vocab_rows
        report["vocab_count_wall_s"] = round(time.monotonic() - t0, 1)
        t0 = time.monotonic()
        merges = learn_bpe(docs, args.merges)
        report["bpe_wall_s"] = round(time.monotonic() - t0, 1)
        report["bpe_rounds"] = len(merges)
        report["bpe_top_merge"] = list(merges[0][1:3]) if merges else None
        print(json.dumps(report))
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
