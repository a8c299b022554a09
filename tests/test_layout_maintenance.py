"""Incremental Z-layout maintenance (operators/layout.py: zorder_append,
layout_maintenance_plan, zorder_compact_cells).

Oracle comparisons plus the structural contracts: frozen-bounds cell
assignment with edge clamping, conservation through targeted
compaction, untouched cells' files never rewritten, and the
metadata-only shape of the maintenance plan scan.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.layout import (
    layout_maintenance_plan,
    zorder_append,
    zorder_compact_cells,
    zorder_rewrite,
)
from cdc_algorithms_spark.queries_extras import (
    _ZA_SPLIT,
    _Z_BITS,
    _Z_FILE_BITS,
    _order_points,
)

from tests.conftest import SF_DIR, SF_DIR_MID
from tests.oracle import compare_with_oracle


@pytest.mark.parametrize(
    "name", ["zorder_append_check", "zorder_maintenance_check"]
)
@pytest.mark.parametrize("sf", [SF_DIR, SF_DIR_MID])
def test_layout_queries_match_oracle(spark, name, sf):
    compare_with_oracle(spark, name, sf)


def _split_store(spark, tmpdir: str) -> str:
    pts = _order_points(spark, SF_DIR)
    zorder_rewrite(
        pts.where(F.col("y") < _ZA_SPLIT), "x", "y", tmpdir,
        bits=_Z_BITS, file_bits=_Z_FILE_BITS,
    )
    zorder_append(pts.where(F.col("y") >= _ZA_SPLIT), tmpdir)
    return tmpdir


def test_compaction_conserves_content(spark):
    path = _split_store(spark, tempfile.mkdtemp(prefix="t_zm_cons_"))

    def snapshot():
        return sorted(
            tuple(r)
            for r in spark.read.parquet(path)
            .groupBy("file_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("x").alias("xmin"),
                F.max("x").alias("xmax"),
                F.min("y").alias("ymin"),
                F.max("y").alias("ymax"),
            )
            .collect()
        )

    before = snapshot()
    flagged = [
        r["file_id"]
        for r in layout_maintenance_plan(spark, path)
        .where("needs_compaction")
        .collect()
    ]
    assert flagged, "the append must fragment at least one cell"
    zorder_compact_cells(spark, path, flagged)
    assert snapshot() == before
    assert (
        layout_maintenance_plan(spark, path).where("needs_compaction").count()
        == 0
    )


def test_out_of_range_rows_clamp_to_edge_cells(spark):
    """Appended rows with y beyond the frozen y_hi scale past the grid
    and must clamp: their cells' y-nibble is all ones, i.e.
    file_id & 0b01010101 == 0b01010101 (y holds the low bit of each
    interleaved pair)."""
    path = tempfile.mkdtemp(prefix="t_zm_clamp_")
    pts = _order_points(spark, SF_DIR)
    zorder_rewrite(
        pts.where(F.col("y") < _ZA_SPLIT), "x", "y", path,
        bits=_Z_BITS, file_bits=_Z_FILE_BITS,
    )
    beyond = pts.where(F.col("y") >= _ZA_SPLIT).withColumn(
        "y", F.col("y") + F.lit(100000)
    )
    zorder_append(beyond, path)
    y_mask = sum(1 << (2 * b) for b in range(_Z_FILE_BITS))  # 0b01010101
    appended = spark.read.parquet(path).where(F.col("y") >= _ZA_SPLIT)
    n_bad = appended.where(
        F.col("file_id").bitwiseAND(F.lit(y_mask)) != y_mask
    ).count()
    assert n_bad == 0 and appended.count() > 0


def test_append_requires_meta(spark):
    path = tempfile.mkdtemp(prefix="t_zm_nometa_")
    pts = _order_points(spark, SF_DIR).limit(10)
    with pytest.raises(Exception):  # missing {path}_meta store
        zorder_append(pts, path)


def test_compact_empty_list_is_noop(spark):
    path = _split_store(spark, tempfile.mkdtemp(prefix="t_zm_noop_"))
    listing_before = sorted(
        os.path.join(d, f)
        for d, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    zorder_compact_cells(spark, path, [])
    listing_after = sorted(
        os.path.join(d, f)
        for d, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    assert listing_before == listing_after


def test_compact_leaves_untouched_cells_alone(spark):
    path = _split_store(spark, tempfile.mkdtemp(prefix="t_zm_leave_"))
    plan = layout_maintenance_plan(spark, path).collect()
    flagged = [r["file_id"] for r in plan if r["needs_compaction"]]
    untouched = [r["file_id"] for r in plan if not r["needs_compaction"]]
    assert flagged and untouched

    def files_of(cell):
        d = f"{path}/file_id={cell}"
        return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))

    before = {c: files_of(c) for c in untouched}
    zorder_compact_cells(spark, path, flagged)
    assert {c: files_of(c) for c in untouched} == before
    assert all(len(files_of(c)) == 1 for c in flagged)


def test_maintenance_plan_reads_no_data_columns(spark):
    """The fragmentation report must stay metadata-shaped: the parquet
    scan projects no data column (ReadSchema is empty — cells come from
    the partition column, file identity from _metadata)."""
    path = _split_store(spark, tempfile.mkdtemp(prefix="t_zm_meta_"))
    plan = (
        layout_maintenance_plan(spark, path)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ReadSchema: struct<>" in plan, plan


@pytest.mark.parametrize("sf", [SF_DIR, SF_DIR_MID])
def test_drift_check_matches_oracle(spark, sf):
    compare_with_oracle(spark, "zorder_drift_check", sf)


def test_fresh_rewrite_has_zero_drift(spark):
    from cdc_algorithms_spark.operators.layout import layout_drift_report

    path = tempfile.mkdtemp(prefix="t_zm_drift0_")
    zorder_rewrite(
        _order_points(spark, SF_DIR), "x", "y", path,
        bits=_Z_BITS, file_bits=_Z_FILE_BITS,
    )
    rep = layout_drift_report(spark, path)
    assert rep.where("NOT within_plan").count() == 0


def test_append_drift_is_exactly_the_clamped_band(spark):
    """Only cells that received clamped (out-of-range y) rows may show
    y_excess; x stays within plan everywhere (batch x values are inside
    the frozen x bounds)."""
    from cdc_algorithms_spark.operators.layout import layout_drift_report

    path = _split_store(spark, tempfile.mkdtemp(prefix="t_zm_drift_"))
    rep = {r["file_id"]: r for r in layout_drift_report(spark, path).collect()}
    # cells holding appended rows (y >= split): y-nibble all ones
    y_mask = sum(1 << (2 * b) for b in range(_Z_FILE_BITS))
    appended_cells = {
        r["file_id"]
        for r in spark.read.parquet(path)
        .where(F.col("y") >= _ZA_SPLIT)
        .select("file_id")
        .distinct()
        .collect()
    }
    for fid, r in rep.items():
        assert r["x_excess"] == 0, (fid, r)
        if fid not in appended_cells:
            assert r["within_plan"], (fid, r)
        else:
            assert (fid & y_mask) == y_mask
            assert r["y_excess"] > 0, (fid, r)


# --- k-D (octree) append ------------------------------------------------------


@pytest.mark.parametrize("sf", [SF_DIR, SF_DIR_MID])
def test_zorder3_append_matches_oracle(spark, sf):
    compare_with_oracle(spark, "zorder3_append_check", sf)


def test_nd_append_feeds_the_same_maintenance_loop(spark):
    """The OPTIMIZE loop is dimension-agnostic: on a 3-D store the
    append fragments exactly the cells holding batch rows, targeted
    compaction restores one file per cell, and content is conserved."""
    from cdc_algorithms_spark.operators.layout import (
        zorder_append_nd,
        zorder_rewrite_nd,
    )
    from cdc_algorithms_spark.queries_extras import (
        _Z3_BITS,
        _Z3_FILE_BITS,
        _Z3A_SPLIT,
        _event_points3,
    )

    path = tempfile.mkdtemp(prefix="t_zm3_")
    pts = _event_points3(spark, SF_DIR)
    zorder_rewrite_nd(
        pts.where(F.col("y") < _Z3A_SPLIT), ["x", "y", "z"], path,
        bits=_Z3_BITS, file_bits=_Z3_FILE_BITS,
    )
    zorder_append_nd(pts.where(F.col("y") >= _Z3A_SPLIT), path)

    def snapshot():
        return sorted(
            tuple(r)
            for r in spark.read.parquet(path)
            .groupBy("file_id")
            .agg(F.count(F.lit(1)), F.min("x"), F.max("x"), F.min("y"),
                 F.max("y"), F.min("z"), F.max("z"))
            .collect()
        )

    before = snapshot()
    plan = layout_maintenance_plan(spark, path).collect()
    flagged = [r["file_id"] for r in plan if r["needs_compaction"]]
    assert flagged
    zorder_compact_cells(spark, path, flagged)
    assert snapshot() == before
    after = layout_maintenance_plan(spark, path).collect()
    assert all(r["n_files"] == 1 for r in after)


@pytest.mark.parametrize("sf", [SF_DIR, SF_DIR_MID])
def test_zorder3_drift_matches_oracle(spark, sf):
    compare_with_oracle(spark, "zorder3_drift_check", sf)


def test_nd_fresh_rewrite_has_zero_drift(spark):
    from cdc_algorithms_spark.operators.layout import (
        layout_drift_report_nd,
        zorder_rewrite_nd,
    )
    from cdc_algorithms_spark.queries_extras import (
        _Z3_BITS,
        _Z3_FILE_BITS,
        _event_points3,
    )

    path = tempfile.mkdtemp(prefix="t_zm3_drift0_")
    zorder_rewrite_nd(
        _event_points3(spark, SF_DIR), ["x", "y", "z"], path,
        bits=_Z3_BITS, file_bits=_Z3_FILE_BITS,
    )
    rep = layout_drift_report_nd(spark, path)
    assert rep.where("NOT within_plan").count() == 0


# --- the RE-PLAN verb: zorder_relayout / zorder_relayout_nd ----------------


@pytest.mark.parametrize("sf", [SF_DIR, SF_DIR_MID])
def test_relayout_check_matches_oracle(spark, sf):
    compare_with_oracle(spark, "zorder_relayout_check", sf)


def _store_file_set(path: str) -> set[tuple[str, float]]:
    out = set()
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            out.add((p, os.path.getmtime(p)))
    return out


def test_relayout_under_threshold_is_untouched(spark):
    """A fresh store has zero drift: zorder_relayout must return False
    and leave every file byte- and mtime-untouched (no staged write,
    no swap, no meta refresh)."""
    from cdc_algorithms_spark.operators.layout import zorder_relayout

    path = tempfile.mkdtemp(prefix="t_relayout_noop_")
    zorder_rewrite(
        _order_points(spark, SF_DIR), "x", "y", path,
        bits=_Z_BITS, file_bits=_Z_FILE_BITS,
    )
    before = _store_file_set(path)
    assert zorder_relayout(spark, path) is False
    assert _store_file_set(path) == before
    assert not os.path.exists(f"{path}__relayout_tmp")


def test_relayout_clears_drift_and_conserves_rows(spark):
    """Drifted store → relayout fires, post-relayout drift is zero in
    every cell, rows are conserved, and appends against the REFRESHED
    meta land in fresh-bounds cells (no clamping for in-range rows)."""
    from cdc_algorithms_spark.operators.layout import (
        layout_drift_report,
        zorder_relayout,
    )

    path = tempfile.mkdtemp(prefix="t_relayout_")
    _split_store(spark, path)
    n_before = spark.read.parquet(path).count()
    drift_before = layout_drift_report(spark, path)
    assert drift_before.where("NOT within_plan").count() > 0
    assert zorder_relayout(spark, path) is True
    rep = layout_drift_report(spark, path)
    assert rep.where("NOT within_plan").count() == 0
    assert spark.read.parquet(path).count() == n_before
    # the refreshed meta covers the full value range now
    from cdc_algorithms_spark.operators.layout import _meta_path

    meta = spark.read.parquet(_meta_path(path)).collect()[0]
    mm = _order_points(spark, SF_DIR).agg(
        F.min("y").alias("lo"), F.max("y").alias("hi")
    ).collect()[0]
    assert (meta["y_lo"], meta["y_hi"]) == (mm["lo"], mm["hi"])
    # idempotence: a second call sees zero drift and does nothing
    assert zorder_relayout(spark, path) is False


def test_nd_relayout_clears_drift(spark):
    from cdc_algorithms_spark.operators.layout import (
        layout_drift_report_nd,
        zorder_append_nd,
        zorder_relayout_nd,
        zorder_rewrite_nd,
    )
    from cdc_algorithms_spark.queries_extras import (
        _Z3A_SPLIT,
        _Z3_BITS,
        _Z3_FILE_BITS,
        _event_points3,
    )

    path = tempfile.mkdtemp(prefix="t_relayout3_")
    pts = _event_points3(spark, SF_DIR)
    zorder_rewrite_nd(
        pts.where(F.col("y") < _Z3A_SPLIT), ["x", "y", "z"], path,
        bits=_Z3_BITS, file_bits=_Z3_FILE_BITS,
    )
    zorder_append_nd(pts.where(F.col("y") >= _Z3A_SPLIT), path)
    n_before = spark.read.parquet(path).count()
    assert zorder_relayout_nd(spark, path) is True
    rep = layout_drift_report_nd(spark, path)
    assert rep.where("NOT within_plan").count() == 0
    assert spark.read.parquet(path).count() == n_before
    assert zorder_relayout_nd(spark, path) is False
