#!/usr/bin/env python
"""Benchmark harness (driver contract): run headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line with per-query wall-clock seconds.

Timing is harness-level around a terminal action (SURVEY.md §2.4 A4) —
``count()`` on the result, which forces the full pipeline without
collecting payloads to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_algorithms_spark.queries import SPARK_QUERIES  # noqa: E402
from cdc_algorithms_spark.session import get_spark  # noqa: E402

# Headline queries: kept to the pipelines that represent the engine's
# core (chunk → hash → dedup) plus the heaviest extensions.
HEADLINE = [
    # core chunk → hash → dedup pipelines
    "fixed_chunks",
    "fixed_dedup_stats",
    "ae_dedup_stats",
    "rabin_dedup_stats",
    "fastcdc_dedup_stats",
    "parallel_ae_dedup_stats",
    "binaryfile_ae_dedup_stats",
    "file_ranges_ae_dedup_stats",
    "datasource_ae_dedup_stats",
    "synthetic_blob_ae_node_stats",
    # relational suite
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "top_order_per_customer",
    "events_cube",
    "user_sessions",
    "asof_last_view_before_purchase",
    "order_pairs_within_30d",
    # subquery family
    "q4_order_priority",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    # extended TPC-H plan shapes
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q19_disjunctive_revenue",
    "q2_cheapest_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q12_late_priority",
    "q13_order_distribution",
    "q21_waiting_supplier",
    # time series
    "events_hourly_locf",
    # change detection
    "snapshot_diff_fixed",
    "change_ratio_fixed",
    "sync_plan_fixed",
    # training-data extensions
    "exact_dedup_docs",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_near_dup",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "quality_scores",
    "token_counts",
    "doc_fingerprints",
    "dedup_components",
    "tfidf_top_terms",
    "stratified_sample_docs",
    "chunk_overlap_pairs_fixed",
    "chunk_overlap_pairs_ae",
    "repetition_ratios",
    "curation_pipeline",
    "lm_bigram_scores",
    "dedup_sketch_report_fixed",
    "reconstruct_docs_check",
    "boilerplate_chunks",
    "duplicated_spans_fixed",
    "char_entropy_scores",
    "dedup_cluster_reps",
    "pii_scrub_docs",
    "quality_band_by_lang",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("cdc-spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    # Pre-warm the Python UDF workers (fork + numpy/pandas import per
    # worker, ~10 s across 32 cores) so the first Arrow-UDF query isn't
    # charged for interpreter startup the rest of the suite reuses.
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(256, numPartitions=64).select(_warm(F.col("id"))).count()

    queries = [q for q in HEADLINE if q in SPARK_QUERIES]
    timings: dict[str, float] = {}
    for name in queries:
        fn = SPARK_QUERIES[name]
        fn(spark, sf_dir).count()  # warm-up: JIT, parquet footer cache
        best = float("inf")
        for _ in range(2):  # min-of-2: squeeze out GC / scheduler noise
            t0 = time.monotonic()
            fn(spark, sf_dir).count()
            best = min(best, time.monotonic() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
