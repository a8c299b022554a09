#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for flagship queries.

Run from the repo root: ``python tools/dump_plans.py``. The output is a
review artifact — the plan properties that matter (pushed filters,
pruned schemas, broadcast vs shuffle joins, Python confinement) are
ENFORCED by tests/test_plans.py; this file just makes them readable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHOWCASE = [
    ("q1_pricing_summary", "filter pushdown + column pruning + 1 shuffle"),
    ("q5_nation_revenue", "all-broadcast join tree over the fact scan"),
    ("q17_small_quantity_revenue", "correlated subquery -> window, single scan"),
    ("ae_dedup_stats", "Arrow-UDF chunker: Python confined, no shuffle before agg"),
    ("sync_plan_fixed", "min(struct) first-occurrence aggregate + identity join + byte accounting"),
    ("tfidf_top_terms", "deduped doc-term frame, AQE-chosen vocab join, WindowGroupLimit top-k"),
    ("q19_disjunctive_revenue", "OR-of-ANDs: per-side residues pushed to both scans"),
    ("q2_cheapest_supplier", "correlated min -> window on the aggregate's own key"),
    ("chunk_overlap_pairs_fixed", "inverted-index resemblance join on 8-byte chunk keys"),
    ("q8_market_share", "fact-fact shuffle join under dual broadcast dimension lineages"),
    ("q21_waiting_supplier", "EXISTS/NOT-EXISTS pair as per-order counts, no Expand"),
    ("parallel_ae_dedup_stats", "single-pass segment scan: cuts+hashes+1% piece bytes cached, corpus read once"),
    ("lm_bigram_scores", "self-trained bigram model: broadcast model joins, corpus never shuffles"),
    ("curation_pipeline", "aggregate+join dedup + bounded two-phase prefix-sum token budget (no content-keyed or whole-language windows)"),
    ("benchmark_decontamination", "broadcast benchmark shingle set; train side map-only explode + doc-keyed aggregate"),
    ("sequence_packing_plan", "bounded prefix-sum token offsets + metadata-only sequence explode + seq_id aggregate"),
    ("incremental_ingest_stats", "batch collapsed to per-hash groups map-side, hash-keyed join against the index"),
    ("incremental_jaccard_pairs_indexed", "frozen-order prefix probe: batch-side aggregates only, corpus enters via the persisted index (r05)"),
    ("split_assignment_summary", "map-only LCG split carve + one partial-agg shuffle; assignment itself is a pure projection (r05)"),
    ("zorder_layout_plan", "Z-order file assignment via bit-shift prefix — no sort/range exchange anywhere (r05)"),
    ("fuzzy_name_matches", "record linkage at vocabulary level: corpus pre-aggregated before the blocked self-join (r05)"),
    ("value_outliers", "decimal-exact per-group moments broadcast back; detail pass map-only (r05)"),
    ("training_manifest", "dedup -> keep-one -> split -> budget as ONE plan; nothing corpus-sized shuffles after the pair graph (r05)"),
    ("zorder_pruning_gain", "both layouts' file assignments ride one scan via a 2-way metadata explode (r05)"),
    ("zorder_rewrite_check", "executed layout re-aggregated from the WRITTEN files — partition-column scan, one rollup shuffle (r06)"),
    ("zorder3_layout_plan", "3-way Morton interleave: octree-cell assignment stays map-only at k dims (r06)"),
    ("ann_pq_recall", "IVF-PQ through the DURABLE index: training-free probe, codes scan pruned to probed cells, exact re-rank join (r07)"),
    ("zorder3_rewrite_check", "executed 3-D octree layout re-aggregated from the WRITTEN files; x/y/z spans from one rollup shuffle (r07)"),
    ("streaming_ingest_disorder_check", "watermark-guarded ingest disposition: kept/dropped/quarantined accounting over the settled stores (r07)"),
    ("pps_sample_docs", "integer-exact PPS draw: bucketed prefix sum + map-only threshold count, no global-sort window (r07)"),
    ("zorder_append_check", "frozen-bounds append re-aggregated from the written store: base files untouched, batch map-only (r07)"),
    ("streaming_pq_index", "stream-maintained ANN index: probe unions base + epoch deltas, every codes scan cell-pruned (r07)"),
    ("customer_balance_quartiles", "ntile/percent_rank/cume_dist as closed forms of the bounded two-phase rank — no all-rows window (r08)"),
    ("zorder_relayout_check", "drift-triggered RE-PLAN: fresh-bounds rewrite + rename-first swap, verified via the post-relayout drift report (r08)"),
    ("value_quantile_sketch_auto", "discovered-grid sketches: one min/max pass fixes the grid, quantiles walk exact integer counts (r08)"),
    ("bm25_topk_indexed", "BM25 through the durable posting index: every generation's scan bucket-pruned, df derived from the pruned read, WindowGroupLimit top-k (r08)"),
    ("dsir_importance_weights", "DSIR weights: token stream folded to counts before any join, quantized-BIGINT exact sums, AQE-sized vocab joins (r08)"),
    ("hybrid_rrf_search", "hybrid retrieval: BM25 + quantized-integer MIPS legs fused by RRF — every stage integer-deterministic (r08)"),
    ("exact_substring_dedup", "span-level dedup: removable-instance cover explode + per-doc rebuild aggregate, no corpus sort (r08)"),
    ("media_phash_pairs", "media perceptual near-dup: Arrow-UDF fingerprints once, 4×16 band equality joins, JVM bit_count verify — never all-pairs (r10)"),
    ("corpus_build_manifest", "the full corpus-build pipeline as ONE plan: quality filter → keep-one → DSIR → PPS draw → split → per-split packing; nothing corpus-sized crosses the driver (r10)"),
]


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    from cdc_algorithms_spark.queries import SPARK_QUERIES
    from cdc_algorithms_spark.session import get_spark

    spark = get_spark(cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical plans of flagship queries\n",
        "Generated by `python tools/dump_plans.py` (sf0.01 fixtures; plans are",
        "size-independent apart from AQE's final partition coalescing).",
        "Plan-quality assertions live in `tests/test_plans.py` — this file is",
        "the human-readable companion.\n",
    ]
    for name, why in SHOWCASE:
        df = SPARK_QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out.append(f"## {name}\n\n*{why}*\n\n```\n{plan.strip()}\n```\n")
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()
    print("PLANS.md written")


if __name__ == "__main__":
    main()
