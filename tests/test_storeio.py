"""storeio: the shared durable-store compaction/manifest machinery.

The *_delta layout's manifest semantics are pinned store-by-store
(tests/test_retrieval.py, tests/test_ann_streaming.py); this file pins
the generic epoch-SUBDIR form (seed + batch_<id>) that
streaming/sync.py-family stores use, including the one failure mode
unique to that layout: an at-least-once replay re-creating a batch
subdirectory AFTER a compaction folded it.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F  # noqa: F401

from cdc_algorithms_spark.operators.storeio import (
    compact_epoch_store,
    read_folded_epochs,
)
from cdc_algorithms_spark.streaming.sync import _list_store_subdirs


def _write_epochs(spark, store, epochs):
    for name, vals in epochs.items():
        spark.createDataFrame(
            [(name, v) for v in vals], "origin string, v long"
        ).write.mode("overwrite").parquet(f"{store}/{name}")


def _rows(spark, store):
    dirs = _list_store_subdirs(spark, store, exclude="")
    return sorted(
        tuple(r) for r in spark.read.parquet(*dirs).collect()
    )


def test_compact_epoch_store_folds_and_preserves(spark, tmp_path):
    store = str(tmp_path / "store")
    _write_epochs(
        spark,
        store,
        {"seed": [1, 2], "batch_0": [3], "batch_1": [4, 5]},
    )
    before = _rows(spark, store)
    assert compact_epoch_store(spark, store)
    # one live generation named seed; manifest retires the batch names
    assert _list_store_subdirs(spark, store, exclude="") == [
        f"file:{store}/seed"
    ] or _list_store_subdirs(spark, store, exclude="")[0].endswith("/seed")
    assert len(_list_store_subdirs(spark, store, exclude="")) == 1
    assert read_folded_epochs(spark, store) == {"batch_0", "batch_1"}
    assert _rows(spark, store) == before
    # compacting a single-generation store is a no-op
    assert not compact_epoch_store(spark, store)
    assert _rows(spark, store) == before


def test_compact_epoch_store_replay_after_fold_is_dead(spark, tmp_path):
    """THE hole the manifest closes for this layout: batch_0 is folded
    into seed, then an at-least-once replay re-creates batch_0 — every
    reader must skip it (its rows already live in seed), and the next
    compaction garbage-collects the corpse."""
    store = str(tmp_path / "store")
    _write_epochs(spark, store, {"seed": [1], "batch_0": [2, 3]})
    before = _rows(spark, store)
    assert compact_epoch_store(spark, store)
    # the replay: batch_0 reappears with identical content
    _write_epochs(spark, store, {"batch_0": [2, 3]})
    assert _rows(spark, store) == before  # NOT double-counted
    # next compaction: nothing live to fold, corpse GC'd
    assert not compact_epoch_store(spark, store)
    assert not os.path.exists(f"{store}/batch_0")
    assert _rows(spark, store) == before


def test_gc_folded_epochs_spares_unlisted_epochs(spark, tmp_path):
    """The concurrent-extend guarantee: post-install GC deletes ONLY
    manifest-folded epochs — an epoch landed after the compactor's
    listing (so absent from the manifest) must survive as live."""
    from cdc_algorithms_spark.operators.storeio import (
        gc_folded_epochs,
        live_epoch_dirs,
        write_folded_epochs,
    )

    base = str(tmp_path / "counts")
    delta = str(tmp_path / "counts_delta")
    spark.createDataFrame([(1,)], "v long").write.parquet(base)
    for name in ("epoch_0", "epoch_7"):
        spark.createDataFrame([(2,)], "v long").write.parquet(
            f"{delta}/{name}"
        )
    write_folded_epochs(spark, base, {"epoch_0"})  # 7 landed concurrently
    gc_folded_epochs(spark, delta, base)
    assert not os.path.exists(f"{delta}/epoch_0")
    assert os.path.exists(f"{delta}/epoch_7")
    live = live_epoch_dirs(spark, delta, base)
    assert len(live) == 1 and live[0].endswith("epoch_7")


def test_compact_epoch_store_new_batches_keep_folding(spark, tmp_path):
    """Epoch ids advance past a compaction: batch_2 arriving after the
    fold is live, reads union it, and a second compaction folds it in
    while the manifest accumulates."""
    store = str(tmp_path / "store")
    _write_epochs(spark, store, {"seed": [1], "batch_0": [2]})
    assert compact_epoch_store(spark, store)
    _write_epochs(spark, store, {"batch_2": [9]})
    rows = _rows(spark, store)
    assert (("batch_2", 9) in rows) and len(rows) == 3
    assert compact_epoch_store(spark, store)
    assert read_folded_epochs(spark, store) == {"batch_0", "batch_2"}
    assert _rows(spark, store) == rows
