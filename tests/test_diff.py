"""Change-detection semantics: CDC chunking must realign after byte
shifts where fixed-grid chunking cannot (the reference's raison d'être)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.chunking import cdc_chunks, fixed_chunks
from cdc_algorithms_spark.operators.diff import (
    perturb_documents,
    snapshot_diff,
    snapshot_diff_summary,
)
from cdc_algorithms_spark.sources.registry import load_table


def _unchanged_bytes_for_shifted(spark, sf_dir, chunker):
    docs = load_table(spark, "documents", sf_dir)
    shifted_ids = docs.where(F.col("doc_id") % 10 == 0).select("doc_id")
    old = chunker(docs)
    new = chunker(perturb_documents(docs))
    d = snapshot_diff(old, new).join(
        shifted_ids, F.col("src_id") == F.col("doc_id")
    )
    row = (
        d.agg(
            F.sum(F.when(F.col("status") == "unchanged", F.col("chunk_bytes"))).alias("u"),
            F.sum("chunk_bytes").alias("t"),
        ).collect()[0]
    )
    return (row["u"] or 0) / row["t"]


def test_cdc_realigns_after_shift_fixed_does_not(spark, sf_dir):
    fixed_frac = _unchanged_bytes_for_shifted(
        spark, sf_dir, lambda d: fixed_chunks(d, 64)
    )
    ae_frac = _unchanged_bytes_for_shifted(
        spark, sf_dir, lambda d: cdc_chunks(d, "rabin", 64)
    )
    # Fixed-grid chunks almost all shift out of alignment; CDC chunks
    # resynchronize after the first boundary past the insertion.
    assert ae_frac > fixed_frac + 0.2, (fixed_frac, ae_frac)


def test_untouched_docs_fully_unchanged(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    old = fixed_chunks(docs, 64)
    new = fixed_chunks(perturb_documents(docs), 64)
    d = snapshot_diff(old, new).where(
        (F.col("src_id") % 10 != 0) & (F.col("src_id") % 10 != 5)
    )
    assert d.where(F.col("status") != "unchanged").count() == 0


def test_summary_statuses(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    s = snapshot_diff_summary(
        fixed_chunks(docs, 64), fixed_chunks(perturb_documents(docs), 64)
    ).collect()
    statuses = {r["status"] for r in s}
    assert statuses == {"unchanged", "inserted", "deleted"}


def test_table_diff_statuses_and_null_safety(spark):
    from cdc_algorithms_spark.operators.diff import table_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d"), (5, "e")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "now-set"), (5, None), (6, "f")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.status for r in table_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "changed",   # NULL -> value must count as changed
        4: "removed",
        5: "changed",   # value -> NULL must count as changed
        6: "added",
    }


def test_apply_changes_roundtrips_arbitrary_edits(spark):
    from cdc_algorithms_spark.operators.diff import apply_changes, table_changes

    old = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(20)], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(i, f"doc {i}" if i % 3 else f"edited {i}") for i in range(20) if i % 7 != 1]
        + [(100, "brand new")],
        ["doc_id", "text"],
    )
    changes = table_changes(old, new)
    assert changes.where(F.col("status") == "unchanged").count() == 0
    rebuilt = {r.doc_id: r.text for r in apply_changes(old, changes).collect()}
    want = {r.doc_id: r.text for r in new.collect()}
    assert rebuilt == want


def test_table_diff_preserves_string_keys(spark):
    """A string-keyed table must diff on its own key type — the id
    column keeps its original type instead of being cast to long
    (which would NULL every id and collapse the join)."""
    from cdc_algorithms_spark.operators.diff import apply_changes, table_changes, table_diff

    old = spark.createDataFrame(
        [("a", "x"), ("b", "y"), ("c", "z")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [("a", "x"), ("b", "Y"), ("d", "w")], ["doc_id", "text"]
    )
    diff = table_diff(old, new)
    assert dict(diff.dtypes)["doc_id"] == "string"
    got = {r.doc_id: r.status for r in diff.collect()}
    assert got == {"a": "unchanged", "b": "changed", "c": "removed", "d": "added"}
    rebuilt = {r.doc_id: r.text for r in
               apply_changes(old, table_changes(old, new)).collect()}
    assert rebuilt == {"a": "x", "b": "Y", "d": "w"}


def test_store_gc_plan_counts_orphans(spark, sf_dir):
    """GC accounting: store entries unreferenced by live recipes are
    orphans; totals partition exactly; a hot chunk referenced many times
    still counts once in the store and live tallies; an empty store
    yields a typed zero row instead of raising."""
    from cdc_algorithms_spark.operators.dedup import (
        store_gc_plan,
        store_refcounts,
    )

    store = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 30), ("d", 40)],
        "hash string, length long",
    )
    # 'a' referenced 3x (hot), 'b' once, 'c'/'d' orphaned
    recipes = spark.createDataFrame(
        [("a",), ("a",), ("a",), ("b",)], "hash string"
    )
    rc = {r["hash"]: (r.bytes, r.refcount)
          for r in store_refcounts(store, recipes).collect()}
    assert rc == {"a": (10, 3), "b": (20, 1), "c": (30, 0), "d": (40, 0)}

    row = store_gc_plan(store, recipes).collect()[0]
    assert (row.n_store, row.store_bytes) == (4, 100)
    assert (row.n_live, row.live_bytes) == (2, 30)
    assert (row.n_orphan, row.orphan_bytes) == (2, 70)
    assert abs(row.reclaim_ratio - 0.7) < 1e-9
    assert row.store_bytes == row.live_bytes + row.orphan_bytes

    empty = store.limit(0)
    z = store_gc_plan(empty, recipes.limit(0)).collect()[0]
    assert (z.n_store, z.store_bytes, z.n_orphan, z.orphan_bytes) == (0, 0, 0, 0)
    assert z.reclaim_ratio == 0.0


def test_store_gc_query_matches_oracle(spark, sf_dir):
    from tests.oracle import compare_with_oracle

    compare_with_oracle(spark, "store_gc_plan_fixed", sf_dir)


def test_chunk_version_index_lifecycle(spark):
    """Version index semantics: first/last/n_versions per identity, a
    reverted-then-restored identity shows the n_versions gap, bytes
    count each identity once, and the matrix rollup partitions the
    index exactly."""
    from cdc_algorithms_spark.operators.diff import (
        chunk_version_index,
        chunk_version_matrix,
    )

    def chunks(rows):
        return spark.createDataFrame(rows, "chunk_text string, length long")

    v0 = chunks([("a", 3), ("b", 4), ("c", 5), ("c", 5)])   # c duplicated
    v1 = chunks([("b", 4), ("d", 6)])                        # a,c gone; d new
    v2 = chunks([("a", 3), ("b", 4)])                        # a resurfaces

    idx = {
        r.chunk_text: (r.first_version, r.last_version, r.n_versions, r.bytes)
        for r in chunk_version_index([v0, v1, v2]).collect()
    }
    assert idx == {
        "a": (0, 2, 2, 3),   # gap: present v0 and v2, absent v1
        "b": (0, 2, 3, 4),
        "c": (0, 0, 1, 5),   # duplicate occurrences count once
        "d": (1, 1, 1, 6),
    }

    mat = {
        (r.first_version, r.last_version): (r.n_chunks, r.bytes)
        for r in chunk_version_matrix([v0, v1, v2]).collect()
    }
    assert mat == {(0, 2): (2, 7), (0, 0): (1, 5), (1, 1): (1, 6)}
    # matrix partitions the index: totals agree
    assert sum(n for n, _ in mat.values()) == len(idx)
    assert sum(b for _, b in mat.values()) == sum(v[3] for v in idx.values())

    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_version_index([])


def test_chunk_version_matrix_matches_oracle(spark, sf_dir):
    from tests.oracle import compare_with_oracle

    compare_with_oracle(spark, "chunk_version_matrix_fixed", sf_dir)


def test_sync_plan_budgeted_boundary_arithmetic(spark):
    """Greedy-by-density class selection: high-coverage classes ship
    first, the boundary class ships floor(remaining/len) members, zero
    budget ships nothing, a sufficient budget ships everything with
    covered_ratio 1.0."""
    from cdc_algorithms_spark.operators.diff import sync_plan_budgeted

    def chunks(rows):
        return spark.createDataFrame(
            rows, "src_id long, offset long, chunk_text string, length long"
        )

    # store holds only 'OLD'; novel classes:
    #   hot:  text 'H'x10 appearing 5x  -> bytes_all 50, len 10, density 5
    #   cold: 4 distinct 10-byte texts  -> bytes_all 10, len 10, density 1
    old = chunks([(0, 0, "OLD", 3)])
    new_rows = [(1, i * 10, "H" * 10, 10) for i in range(5)] + [
        (2, i * 10, f"c{i:08d}x", 10) for i in range(4)
    ] + [(3, 0, "OLD", 3)]
    new = chunks(new_rows)

    def plan(budget):
        return sync_plan_budgeted(old, new, budget).collect()[0]

    r = plan(0)
    assert (r.n_shipped, r.shipped_transfer_bytes, r.covered_ratio) == (0, 0, 0.0)
    assert (r.n_novel, r.novel_transfer_bytes, r.novel_covered_bytes) == (
        5, 50, 90,
    )

    # 25 bytes: hot class (10) ships fully first, then floor(15/10)=1 cold
    r = plan(25)
    assert r.n_shipped == 2
    assert r.shipped_transfer_bytes == 20
    assert r.shipped_covered_bytes == 60  # 50 (hot) + 10 (one cold)
    assert abs(r.covered_ratio - 60 / 90) < 1e-6

    r = plan(1_000_000)
    assert r.n_shipped == r.n_novel == 5
    assert r.shipped_transfer_bytes == r.novel_transfer_bytes == 50
    assert r.covered_ratio == 1.0


def test_sync_plan_budgeted_matches_oracle(spark, sf_dir):
    from tests.oracle import compare_with_oracle

    compare_with_oracle(spark, "sync_plan_budgeted_fixed", sf_dir)
