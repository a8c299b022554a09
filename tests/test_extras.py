"""Planted-fixture and plan-shape tests for the linkage / funnel /
layout / anomaly operators (queries_extras.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cdc_algorithms_spark import plans as P
from cdc_algorithms_spark.operators.layout import (
    compaction_plan,
    zorder_layout_plan,
    zorder_values,
)
from cdc_algorithms_spark.operators.linkage import (
    blocked_fuzzy_name_pairs,
    event_funnel,
)
from cdc_algorithms_spark.operators.profile import value_outliers
from cdc_algorithms_spark.queries import SPARK_QUERIES

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# Blocked fuzzy matching
# ---------------------------------------------------------------------------


def test_fuzzy_pairs_planted(spark):
    rows = (
        [("red widget",)] * 3
        + [("rad widget",)]
        + [("blue bolt",)] * 2
        + [("blu bolt",)]
        + [("green gear",)]
    )
    df = spark.createDataFrame(rows, ["name"])
    out = blocked_fuzzy_name_pairs(
        df, "name", F.split("name", " ").getItem(1), max_distance=2
    )
    got = {
        (r.block, r.name_a, r.name_b, r.distance, r.n_rows_a, r.n_rows_b)
        for r in out.collect()
    }
    assert got == {
        ("widget", "rad widget", "red widget", 1, 1, 3),
        ("bolt", "blu bolt", "blue bolt", 1, 1, 2),
    }


def test_fuzzy_pairs_block_bounds_candidates(spark):
    # Different blocks are never compared even at distance 1.
    df = spark.createDataFrame([("hot rod",), ("hot rad",)], ["name"])
    out = blocked_fuzzy_name_pairs(
        df, "name", F.split("name", " ").getItem(1), max_distance=2
    )
    assert out.count() == 0


def test_fuzzy_query_plan_vocab_level(spark):
    df = SPARK_QUERIES["fuzzy_name_matches"](spark, SF_DIR)
    # no Python, no cartesian: the pair stage is an equi-join on block
    assert P.python_eval_count(df) == 0
    plan = P.physical_plan(df)
    assert "Cartesian" not in plan


# ---------------------------------------------------------------------------
# Ordered funnel
# ---------------------------------------------------------------------------


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_event_funnel_strict_ordering(spark):
    rows = [
        # u1 completes the funnel in order
        (1, "view", _ts(1)),
        (1, "click", _ts(2)),
        (1, "purchase", _ts(3)),
        # u2 clicked BEFORE first view -> stops after view
        (2, "click", _ts(1)),
        (2, "view", _ts(2)),
        (2, "purchase", _ts(3)),
        # u3 skipped click -> purchase must not count
        (3, "view", _ts(1)),
        (3, "purchase", _ts(2)),
        # u4 never purchases
        (4, "view", _ts(1)),
        (4, "click", _ts(2)),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_type", "ts"])
    out = {
        r.stage: (r.stage_idx, r.n_users, r.conversion)
        for r in event_funnel(ev, ("view", "click", "purchase")).collect()
    }
    assert out == {
        "view": (0, 4, 1.0),
        "click": (1, 2, 0.5),
        "purchase": (2, 1, 0.25),
    }


def test_event_funnel_plan_no_global_window(spark):
    df = SPARK_QUERIES["event_funnel"](spark, SF_DIR)
    assert P.python_eval_count(df) == 0
    # every window-free stage shuffles on user_id only; no empty
    # partitionBy (global) window anywhere
    assert all(cols for cols in P.window_partition_columns(df))


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------


def _morton(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b + 1)
        z |= ((y >> b) & 1) << (2 * b)
    return z


def test_zorder_values_identity_grid(spark):
    # x, y already span [0, 255] so the scaled grid is the identity and
    # zval must equal the reference Morton code exactly.
    pts = [(0, 0), (255, 255), (3, 1), (128, 64), (200, 7)]
    df = spark.createDataFrame(pts, ["x", "y"]).unionByName(
        spark.createDataFrame([(0, 255), (255, 0)], ["x", "y"])
    )
    got = {(r.x, r.y): r.zval for r in zorder_values(df, "x", "y").collect()}
    for (x, y), z in got.items():
        assert z == _morton(x, y), (x, y, z)


def test_zorder_plan_bounds_both_spans(spark):
    # On the identity grid each planned file is one 16x16 quadtree cell:
    # both spans bounded by 16 — the property that makes min/max pruning
    # work for predicates on EITHER dimension.
    pts = [(x, y) for x in range(0, 256, 7) for y in range(0, 256, 11)]
    df = spark.createDataFrame(pts + [(0, 0), (255, 255)], ["x", "y"])
    out = zorder_layout_plan(df, "x", "y", bits=8, file_bits=4).collect()
    assert sum(r.n_rows for r in out) == len(pts) + 2
    for r in out:
        assert r.x_span <= 16 and r.y_span <= 16, r


def test_zorder_query_plan_map_only_assignment(spark):
    df = SPARK_QUERIES["zorder_layout_plan"](spark, SF_DIR)
    plan = P.physical_plan(df)
    # file assignment is a bit-shift, not a sort: no global sort/range
    # exchange anywhere in the plan
    assert "rangepartitioning" not in plan.lower()
    assert P.python_eval_count(df) == 0
    # min/max normalizer is a broadcast, the only shuffles are the two
    # hash aggregates (bounds + per-file stats)
    assert P.broadcast_join_count(df) >= 1
    assert P.exchange_count(df) <= 2


# ---------------------------------------------------------------------------
# Compaction planning
# ---------------------------------------------------------------------------


def test_compaction_plan_planted(spark):
    rows = [
        ("s", 1, 100),
        ("s", 2, 100),
        ("s", 3, 100),
        ("s", 4, 50),
        ("s", 5, 200),
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "n_chars"])
    out = {
        (r.group, r.file_seq): (r.n_items, r.total_bytes, r.first_item, r.last_item)
        for r in compaction_plan(df, "source", "doc_id", "n_chars", 250).collect()
    }
    assert out == {
        ("s", 0): (3, 300, 1, 3),
        ("s", 1): (2, 250, 4, 5),
    }


def test_compaction_plan_cumulative_invariant(spark):
    # Greedy rule invariant: the bytes before bin k (= sum of bins < k)
    # land in [k*target, k*target + max item of bin k-1).
    target = 4096
    df = SPARK_QUERIES["compaction_plan"](spark, SF_DIR)
    rows = df.orderBy("group", "file_seq").collect()
    by_group: dict[str, list] = {}
    for r in rows:
        by_group.setdefault(r.group, []).append(r)
    assert by_group
    for group_rows in by_group.values():
        seqs = [r.file_seq for r in group_rows]
        assert seqs == list(range(len(seqs))), "file_seq must be dense"
        cum = 0
        for k, r in enumerate(group_rows):
            if k > 0:
                assert cum >= k * target, (r.group, k, cum)
            cum += r.total_bytes


def test_compaction_query_plan_bounded_shuffles(spark):
    df = SPARK_QUERIES["compaction_plan"](spark, SF_DIR)
    assert P.python_eval_count(df) == 0
    assert P.exchange_count(df) <= 2  # window on source + final rollup


# ---------------------------------------------------------------------------
# z-score outliers
# ---------------------------------------------------------------------------


def test_value_outliers_planted(spark):
    rows = [("a", i, 10.0) for i in range(99)] + [("a", 99, 100.0)]
    df = spark.createDataFrame(rows, ["grp", "row_id", "value"])
    out = value_outliers(df, "grp", "value", sigma=3.0).collect()
    assert [(r.grp, r.row_id) for r in out] == [("a", 99)]
    # z of the planted outlier: (100-10.9)/sqrt(mean(v^2)-mean^2)
    assert abs(out[0].z_score - 9.9499) < 1e-3


def test_value_outliers_constant_group_not_flagged(spark):
    df = spark.createDataFrame(
        [("c", i, 5.0) for i in range(10)], ["grp", "row_id", "value"]
    )
    assert value_outliers(df, "grp", "value").count() == 0


def test_value_outliers_plan_broadcast_detail_pass(spark):
    df = SPARK_QUERIES["value_outliers"](spark, SF_DIR)
    assert P.python_eval_count(df) == 0
    assert P.broadcast_join_count(df) >= 1
    assert P.exchange_count(df) <= 1  # only the moments aggregate shuffles


# ---------------------------------------------------------------------------
# Curriculum ordering
# ---------------------------------------------------------------------------


def test_curriculum_order_band_then_shuffle(spark):
    from cdc_algorithms_spark.operators.shuffle import curriculum_order

    rows = [(i, i % 3) for i in range(200)]  # (doc_id, band)
    df = spark.createDataFrame(rows, ["doc_id", "band"])
    out = curriculum_order(df, "band", seed=7).collect()
    assert sorted(r.curriculum_rank for r in out) == list(range(1, 201))
    by_rank = sorted(out, key=lambda r: r.curriculum_rank)
    # bands are non-decreasing along the rank; within a band the order
    # follows (shuffle_key, doc_id)
    keys = [(r.band, r.shuffle_key, r.doc_id) for r in by_rank]
    assert keys == sorted(keys)
    # within-band order is actually shuffled (not id order)
    band0_ids = [r.doc_id for r in by_rank if r.band == 0]
    assert band0_ids != sorted(band0_ids)


def test_curriculum_query_no_all_rows_window(spark):
    df = SPARK_QUERIES["curriculum_order"](spark, SF_DIR)
    # the only empty-partition window runs over the tiny bucket frame
    # (<= bands x 1024 rows), never the corpus: corpus rows go through
    # the (band, __bkt)-partitioned row_number only
    parts = P.window_partition_columns(df)
    assert any(cols for cols in parts), "per-bucket window missing"


def test_fixed_dedup_sweep_consistent_with_single_size(spark):
    sweep = {
        r.algo: r for r in SPARK_QUERIES["fixed_dedup_sweep"](spark, SF_DIR).collect()
    }
    assert set(sweep) == {"fixed32", "fixed64", "fixed128", "fixed256"}
    single = SPARK_QUERIES["fixed_dedup_stats"](spark, SF_DIR).collect()[0]
    assert sweep["fixed64"].asDict() == single.asDict()
    # smaller chunks can only expose MORE duplication per byte
    assert sweep["fixed32"].dedup_coeff <= sweep["fixed256"].dedup_coeff


# ---------------------------------------------------------------------------
# Near-dup threshold sweep + streaming outlier screen
# ---------------------------------------------------------------------------


def test_near_dup_threshold_sweep_monotonic_and_consistent(spark):
    sweep = {
        r.threshold: (r.n_pairs, r.n_docs)
        for r in SPARK_QUERIES["near_dup_threshold_sweep"](spark, SF_DIR).collect()
    }
    assert set(sweep) == {0.5, 0.7, 0.8, 0.9}
    # tightening the threshold can only lose pairs/docs
    for lo, hi in [(0.5, 0.7), (0.7, 0.8), (0.8, 0.9)]:
        assert sweep[hi][0] <= sweep[lo][0]
        assert sweep[hi][1] <= sweep[lo][1]
    # the 0.8 bucket must agree with the standalone exact-pair query
    n_08 = SPARK_QUERIES["ngram_jaccard_pairs"](spark, SF_DIR).count()
    assert sweep[0.8][0] == n_08


def test_streaming_outliers_converge_to_batch(spark):
    batch = {
        (r.event_id, r.z_score)
        for r in SPARK_QUERIES["value_outliers"](spark, SF_DIR).collect()
    }
    streamed = {
        (r.event_id, r.z_score)
        for r in SPARK_QUERIES["streaming_value_outliers"](spark, SF_DIR).collect()
    }
    assert batch and streamed == batch


def test_stateful_funnel_cross_batch_and_disorder(spark):
    from cdc_algorithms_spark.streaming import run_staged_stream
    from cdc_algorithms_spark.streaming.funnel import stateful_funnel

    # batch 1: u1 views; u2's click arrives BEFORE its view within the
    #          same batch (in-batch disorder must be sorted in state)
    b1 = spark.createDataFrame(
        [
            (1, "view", _ts(1)),
            (2, "click", _ts(2)),
            (2, "view", _ts(3)),
        ],
        ["user_id", "event_type", "ts"],
    )
    # batch 2: u1 clicks (cross-batch advancement); u2 purchases without
    #          ever clicking after its view -> u2 stays at depth 0
    b2 = spark.createDataFrame(
        [
            (1, "click", _ts(10)),
            (2, "purchase", _ts(11)),
        ],
        ["user_id", "event_type", "ts"],
    )
    # batch 3: u1 completes
    b3 = spark.createDataFrame(
        [(1, "purchase", _ts(20))], ["user_id", "event_type", "ts"]
    )
    sink = run_staged_stream(
        spark,
        [b1, b2, b3],
        lambda s: stateful_funnel(s, ("view", "click", "purchase")),
        output_mode="update",
    )
    from pyspark.sql import functions as SF

    final = {
        r.user_id: r.d
        for r in sink.groupBy("user_id").agg(SF.max("depth").alias("d")).collect()
    }
    assert final == {1: 2, 2: 0}


def test_streaming_funnel_converges_to_batch(spark):
    batch = {
        (r.stage_idx, r.stage, r.n_users, r.conversion)
        for r in SPARK_QUERIES["event_funnel"](spark, SF_DIR).collect()
    }
    streamed = {
        (r.stage_idx, r.stage, r.n_users, r.conversion)
        for r in SPARK_QUERIES["streaming_event_funnel"](spark, SF_DIR).collect()
    }
    assert streamed == batch


def test_training_manifest_composition_consistent(spark):
    from pyspark.sql import functions as SF

    rows = SPARK_QUERIES["training_manifest"](spark, SF_DIR).collect()
    assert {r.split for r in rows} <= {"train", "val", "test"}
    total_kept = sum(r.n_docs for r in rows)
    # kept docs = corpus minus non-representative near-dup members
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    comps = SPARK_QUERIES["dedup_components"](spark, SF_DIR)
    n_dropped = comps.where(SF.col("component_id") != SF.col("doc_id")).count()
    assert total_kept == n_docs - n_dropped
    # the per-cell census must agree with the standalone split summary
    # restricted to kept docs (same seed/fractions by construction)
    assert all(r.n_tokens >= r.n_docs for r in rows)  # every kept doc non-empty


def test_layout_pruning_compare_bounds_both_dims(spark):
    rows = {
        r.layout: r
        for r in SPARK_QUERIES["zorder_pruning_gain"](spark, SF_DIR).collect()
    }
    assert set(rows) == {"zorder", "xsort"}
    z, xs = rows["zorder"], rows["xsort"]
    # both layouts draw from the same 4**file_bits possible cells;
    # OCCUPIED counts may differ on sparse fixtures
    assert z.n_files <= 256 and xs.n_files <= 256
    # the 1-D layout bounds only its sort key; Z bounds both
    assert xs.x_touch_frac < z.x_touch_frac
    assert xs.y_touch_frac > 0.5
    assert z.y_touch_frac < 0.5
    # Z's worst dimension is far better than xsort's worst dimension
    assert max(z.x_touch_frac, z.y_touch_frac) < max(
        xs.x_touch_frac, xs.y_touch_frac
    )


def test_profile_drift_flags_the_perturbation(spark):
    rows = {
        r.column: r
        for r in SPARK_QUERIES["profile_drift_docs"](spark, SF_DIR).collect()
    }
    assert set(rows) == {"doc_id", "text", "lang", "source", "n_chars"}
    # the perturbation rewrites text/n_chars for 20% of docs, touches
    # nothing else
    assert rows["doc_id"].n_nulls_delta == 0
    assert not rows["doc_id"].min_changed and not rows["doc_id"].max_changed
    assert not rows["lang"].min_changed and not rows["source"].min_changed
    assert rows["text"].min_changed or rows["text"].n_distinct_delta != 0
    assert rows["n_chars"].n_distinct_delta != 0 or rows["n_chars"].max_changed
    assert all(r.n_rows_old == r.n_rows_new for r in rows.values())


def test_streaming_compaction_converges_to_batch(spark):
    batch = {
        (r.group, r.file_seq, r.n_items, r.total_bytes, r.first_item, r.last_item)
        for r in SPARK_QUERIES["compaction_plan"](spark, SF_DIR).collect()
    }
    streamed = {
        (r.group, r.file_seq, r.n_items, r.total_bytes, r.first_item, r.last_item)
        for r in SPARK_QUERIES["streaming_compaction_plan"](spark, SF_DIR).collect()
    }
    assert batch and streamed == batch


def test_stateful_compaction_cross_batch_state(spark):
    from cdc_algorithms_spark.streaming import run_staged_stream
    from cdc_algorithms_spark.streaming.funnel import stateful_compaction

    b1 = spark.createDataFrame(
        [("s", 2, 100), ("s", 1, 100)], ["source", "doc_id", "n_chars"]
    )  # in-batch disorder: doc 2 listed before doc 1
    b2 = spark.createDataFrame(
        [("s", 3, 100), ("s", 4, 50)], ["source", "doc_id", "n_chars"]
    )
    sink = run_staged_stream(
        spark,
        [b1, b2],
        lambda s: stateful_compaction(s, "source", "doc_id", "n_chars", 250),
        output_mode="append",
    )
    got = {(r.item, r.file_seq) for r in sink.collect()}
    # before-values: doc1=0, doc2=100, doc3=200 (carried across batches),
    # doc4=300 -> files 0,0,0,1
    assert got == {(1, 0), (2, 0), (3, 0), (4, 1)}


def test_anomaly_runs_stitch_and_split(spark):
    rows = {
        (r.user_id, r.run_id): r
        for r in SPARK_QUERIES["anomaly_runs"](spark, SF_DIR).collect()
    }
    assert rows
    for (_, run_id), r in rows.items():
        assert run_id >= 1 and r.n_events >= 1
        assert r.end_us >= r.start_us
        # events inside one run are within the 24h-gap rule end to end:
        # a run of n events spans at most (n-1) * gap
        assert r.end_us - r.start_us <= (r.n_events - 1) * 86_400_000_000
    # total flagged events must reconcile with the standalone screen
    n_flagged = SPARK_QUERIES["value_outliers"](spark, SF_DIR).count()
    assert sum(r.n_events for r in rows.values()) == n_flagged


def test_catalog_reconciliation_links_typos(spark):
    rows = SPARK_QUERIES["catalog_reconciliation"](spark, SF_DIR).collect()
    by_dist = {}
    for r in rows:
        by_dist.setdefault(r.distance, 0)
        by_dist[r.distance] += 1
    # exact matches for untouched names AND distance-1 typo links exist
    assert by_dist.get(0, 0) > 0
    assert by_dist.get(1, 0) > 0
    # every typo'd vendor name ('x' + tail) must link back to its TRUE
    # original — a row with the same tail at distance exactly 1
    typod = {r.name_b for r in rows if r.name_b.startswith("x")}
    assert typod  # the perturbation produced vendor typos
    for vb in typod:
        assert any(
            r.name_b == vb and r.distance == 1 and r.name_a[1:] == vb[1:]
            for r in rows
        ), f"no original linked for vendor typo {vb!r}"


def test_streaming_zorder_route_converges_to_batch(spark):
    batch = {
        tuple(r) for r in SPARK_QUERIES["zorder_layout_plan"](spark, SF_DIR).collect()
    }
    streamed = {
        tuple(r)
        for r in SPARK_QUERIES["streaming_zorder_route"](spark, SF_DIR).collect()
    }
    assert batch and streamed == batch


def test_training_manifest_plan_shape(spark):
    df = SPARK_QUERIES["training_manifest"](spark, SF_DIR)
    plan = P.physical_plan(df)
    # the component frame broadcasts into the keep-one join; the final
    # manifest rollup is the only corpus-facing hash aggregate pair
    assert P.broadcast_join_count(df) >= 1
    assert "Cartesian" not in plan
    # split assignment is a projection — no window over the corpus
    for cols in P.window_partition_columns(df):
        assert cols, "unexpected all-rows window in the manifest plan"


def test_curriculum_rank_is_bucketed_not_global_sort(spark):
    df = SPARK_QUERIES["curriculum_order"](spark, SF_DIR)
    # the row_number windows are (band, bucket)-partitioned; no global
    # single-task sort materializes the corpus order
    parts = P.window_partition_columns(df)
    assert any(len(cols) >= 2 for cols in parts)


def test_distributed_footer_stats_identical_to_driver_walk(spark, tmp_path):
    """parquet_footer_stats_distributed (executor-side footer parsing
    for unbounded file counts) must return EXACTLY the driver-side
    walk's rows — same files, same n_rows, same typed min/max — on a
    multi-file store with long, double, and string stat columns."""
    from pyspark.sql import functions as F

    from cdc_algorithms_spark.operators import layout as L

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id",
        F.col("source").alias("src"),
        (F.col("n_chars") * 1.5).alias("score"),
    )
    store = str(tmp_path / "store")
    (
        docs.withColumn("b", F.pmod("doc_id", F.lit(7)))
        .repartition("b")
        .write.partitionBy("b")
        .parquet(store)
    )
    cols = ["doc_id", "score", "src"]
    drv = L.parquet_footer_stats(spark, store, cols)
    dist = L.parquet_footer_stats_distributed(spark, store, cols)
    assert drv.schema == dist.schema
    a = sorted(map(tuple, drv.collect()))
    b = sorted(map(tuple, dist.collect()))
    assert len(a) >= 7 and a == b
