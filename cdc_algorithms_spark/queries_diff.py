"""Change-detection queries: snapshot diff between the documents table
and a deterministically perturbed "next snapshot" (operators/diff.py).

The fixed-chunk variants are end-to-end SQL-expressible (perturbation,
chunking, diff, rollup) so DuckDB verifies the whole pipeline; the AE
variant demonstrates the same diff over CDC chunks (rows-only check) —
where the prefix-shifted docs show CDC's realignment: most of a shifted
doc's chunks come back 'unchanged', while fixed-grid chunking sees the
entire doc as changed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.chunking import cdc_chunks, fixed_chunks
from cdc_algorithms_spark.operators.diff import (
    PERTURB_SQL,
    change_ratio,
    perturb_documents,
    snapshot_diff_summary,
    sync_plan,
)
from cdc_algorithms_spark.queries import register
from cdc_algorithms_spark.sources.registry import load_table

_SIZE = 64

_DIFF_CHUNKS_SQL = f"""
new_docs AS ({PERTURB_SQL}),
old_chunks AS (
  SELECT d.doc_id AS src_id,
         substring(d.text, CAST(u.off + 1 AS INT), {_SIZE}) AS chunk_text,
         CAST(LEAST({_SIZE}, d.n_chars - u.off) AS BIGINT) AS length
  FROM documents d, UNNEST(range(0, d.n_chars, {_SIZE})) AS u(off)
),
new_chunks AS (
  SELECT d.doc_id AS src_id,
         substring(d.text, CAST(u.off + 1 AS INT), {_SIZE}) AS chunk_text,
         CAST(LEAST({_SIZE}, d.n_chars - u.off) AS BIGINT) AS length
  FROM new_docs d, UNNEST(range(0, d.n_chars, {_SIZE})) AS u(off)
),
o AS (SELECT src_id, chunk_text, COUNT(*) AS n_old, MAX(length) AS len_o
      FROM old_chunks GROUP BY src_id, chunk_text),
n AS (SELECT src_id, chunk_text, COUNT(*) AS n_new, MAX(length) AS len_n
      FROM new_chunks GROUP BY src_id, chunk_text),
j AS (
  SELECT COALESCE(o.src_id, n.src_id) AS src_id,
         CASE WHEN o.chunk_text IS NOT NULL AND n.chunk_text IS NOT NULL
                THEN 'unchanged'
              WHEN o.chunk_text IS NOT NULL THEN 'deleted'
              ELSE 'inserted' END AS status,
         COALESCE(o.len_o, n.len_n) AS chunk_bytes
  FROM o FULL OUTER JOIN n
    ON o.src_id = n.src_id AND o.chunk_text = n.chunk_text
)
"""

_DIFF_SUMMARY_ORACLE = f"""
WITH {_DIFF_CHUNKS_SQL}
SELECT status,
       CAST(COUNT(*) AS BIGINT) AS n_chunk_ids,
       CAST(SUM(chunk_bytes) AS BIGINT) AS bytes
FROM j GROUP BY status
"""

_CHANGE_RATIO_ORACLE = f"""
WITH {_DIFF_CHUNKS_SQL}
SELECT src_id,
       CAST(COALESCE(SUM(CASE WHEN status = 'inserted' THEN chunk_bytes END), 0)
            AS BIGINT) AS inserted_bytes,
       CAST(COALESCE(SUM(CASE WHEN status != 'deleted' THEN chunk_bytes END), 0)
            AS BIGINT) AS new_bytes,
       ROUND(COALESCE(SUM(CASE WHEN status = 'inserted' THEN chunk_bytes END), 0)
             * 1.0 /
             GREATEST(COALESCE(SUM(CASE WHEN status != 'deleted' THEN chunk_bytes END), 0), 1),
             6) AS change_ratio
FROM j GROUP BY src_id
"""


@register("snapshot_diff_fixed", _DIFF_SUMMARY_ORACLE)
def snapshot_diff_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    old = fixed_chunks(docs, _SIZE)
    new = fixed_chunks(perturb_documents(docs), _SIZE)
    return snapshot_diff_summary(old, new)


@register("change_ratio_fixed", _CHANGE_RATIO_ORACLE)
def change_ratio_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    old = fixed_chunks(docs, _SIZE)
    new = fixed_chunks(perturb_documents(docs), _SIZE)
    return change_ratio(old, new)


_SYNC_PLAN_ORACLE = f"""
WITH new_docs AS ({PERTURB_SQL}),
old_chunks AS (
  SELECT substring(d.text, CAST(u.off + 1 AS INT), {_SIZE}) AS chunk_text
  FROM documents d, UNNEST(range(0, d.n_chars, {_SIZE})) AS u(off)
),
new_chunks AS (
  SELECT d.doc_id AS src_id, CAST(u.off AS BIGINT) AS off,
         substring(d.text, CAST(u.off + 1 AS INT), {_SIZE}) AS chunk_text,
         CAST(LEAST({_SIZE}, d.n_chars - u.off) AS BIGINT) AS length
  FROM new_docs d, UNNEST(range(0, d.n_chars, {_SIZE})) AS u(off)
),
store AS (SELECT DISTINCT chunk_text FROM old_chunks),
ranked AS (
  SELECT n.src_id, n.length,
         ROW_NUMBER() OVER (PARTITION BY n.chunk_text
                            ORDER BY n.src_id, n.off) AS rn,
         s.chunk_text IS NOT NULL AS in_store
  FROM new_chunks n LEFT JOIN store s USING (chunk_text)
)
SELECT src_id,
  CAST(SUM(length) AS BIGINT) AS total_bytes,
  CAST(COALESCE(SUM(CASE WHEN in_store THEN length END), 0) AS BIGINT)
    AS reused_old_bytes,
  CAST(COALESCE(SUM(CASE WHEN NOT in_store AND rn = 1 THEN length END), 0) AS BIGINT)
    AS transfer_bytes,
  CAST(COALESCE(SUM(CASE WHEN NOT in_store AND rn > 1 THEN length END), 0) AS BIGINT)
    AS dedup_new_bytes
FROM ranked GROUP BY src_id
"""


@register("sync_plan_fixed", _SYNC_PLAN_ORACLE)
def sync_plan_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-sync transfer plan: bytes to ship per source when the old
    snapshot's content store already exists (operators/diff.py::sync_plan)."""
    docs = load_table(spark, "documents", sf_dir)
    old = fixed_chunks(docs, _SIZE)
    new = fixed_chunks(perturb_documents(docs), _SIZE)
    return sync_plan(old, new)


@register("snapshot_diff_ae")
def snapshot_diff_ae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC diff: prefix-shifted docs realign (rows-only driver check —
    AE cut positions aren't SQL-expressible; byte conservation through
    the same diff is oracle-checked by snapshot_diff_ae_conservation,
    and the CDC-vs-fixed contrast is asserted in tests/test_diff.py)."""
    docs = load_table(spark, "documents", sf_dir)
    old = cdc_chunks(docs, "ae", 320)
    new = cdc_chunks(perturb_documents(docs), "ae", 320)
    return snapshot_diff_summary(old, new)


# AE cut positions aren't SQL-expressible, but the diff must still
# conserve every byte of both snapshots: occurrence-weighted chunk bytes
# on the old side (deleted + unchanged identities × n_old) must equal the
# old corpus size, and the new side (inserted + unchanged × n_new) the
# perturbed corpus size — the concat-check idea pushed through the
# full-outer diff join. A chunker dropping/duplicating a chunk, or the
# diff misclassifying an identity, breaks one of the sums.

_DIFF_AE_CONSERVATION_ORACLE = f"""
WITH new_docs AS ({PERTURB_SQL})
SELECT (SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents) AS old_bytes,
       (SELECT CAST(SUM(length(text)) AS BIGINT) FROM new_docs) AS new_bytes
"""


@register("snapshot_diff_ae_conservation", _DIFF_AE_CONSERVATION_ORACLE)
def snapshot_diff_ae_conservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte conservation of the AE snapshot diff (operators/diff.py::
    snapshot_diff over chunkers/fast.py AE cuts) against independently
    computed corpus sizes."""
    from cdc_algorithms_spark.operators.diff import snapshot_diff

    docs = load_table(spark, "documents", sf_dir)
    old = cdc_chunks(docs, "ae", 320)
    new = cdc_chunks(perturb_documents(docs), "ae", 320)
    d = snapshot_diff(old, new)
    return d.agg(
        F.sum(F.col("n_old") * F.col("chunk_bytes"))
        .cast("long")
        .alias("old_bytes"),
        F.sum(F.col("n_new") * F.col("chunk_bytes"))
        .cast("long")
        .alias("new_bytes"),
    )


# The second AE-diff invariant family (after conservation): snapshot_diff
# keys on (src_id, chunk identity), and AE cuts are a pure function of the
# document's bytes — so a document the perturbation does NOT touch
# (doc_id % 10 ∉ {0, 5}) must diff as ALL-unchanged with stable
# multiplicities, and every deleted/inserted identity must belong to a
# touched document. These are mathematical guarantees, not empirical
# ones; DuckDB independently computes the touched/untouched byte split.

_DIFF_AE_LOCALIZATION_ORACLE = f"""
WITH new_docs AS ({PERTURB_SQL})
SELECT
  (SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents
    WHERE doc_id % 10 NOT IN (0, 5)) AS untouched_bytes,
  (SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents
    WHERE doc_id % 10 IN (0, 5)) AS touched_old_bytes,
  (SELECT CAST(SUM(n_chars) AS BIGINT) FROM new_docs
    WHERE doc_id % 10 IN (0, 5)) AS touched_new_bytes,
  TRUE AS changes_localized,
  TRUE AS untouched_old_conserved,
  TRUE AS untouched_new_conserved
"""


@register("snapshot_diff_ae_localization_check", _DIFF_AE_LOCALIZATION_ORACLE)
def snapshot_diff_ae_localization_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Localization invariants of the AE snapshot diff:
    ``changes_localized`` — no deleted/inserted chunk identity on an
    untouched source; ``untouched_*_conserved`` — occurrence-weighted
    unchanged bytes over untouched sources equal their corpus bytes on
    BOTH sides (so untouched docs also have n_old == n_new everywhere).
    A chunker that is nondeterministic across calls or partitions, or a
    diff that misclassifies an identity, breaks one of the booleans;
    the three byte columns are exact values DuckDB recomputes."""
    from cdc_algorithms_spark.operators.diff import snapshot_diff

    docs = load_table(spark, "documents", sf_dir)
    old = cdc_chunks(docs, "ae", 320)
    new = cdc_chunks(perturb_documents(docs), "ae", 320)
    d = snapshot_diff(old, new)
    touched = F.col("src_id") % 10 == 0
    touched = touched | (F.col("src_id") % 10 == 5)
    agg = d.agg(
        F.sum(
            F.when(~touched, F.col("n_old") * F.col("chunk_bytes")).otherwise(0)
        ).cast("long").alias("__u_old"),
        F.sum(
            F.when(~touched, F.col("n_new") * F.col("chunk_bytes")).otherwise(0)
        ).cast("long").alias("__u_new"),
        F.sum(
            (~touched & (F.col("status") != "unchanged")).cast("long")
        ).cast("long").alias("__n_leaked"),
        F.sum(
            (~touched & (F.col("n_old") != F.col("n_new"))).cast("long")
        ).cast("long").alias("__n_unstable"),
    )
    sizes = (
        docs.select(
            F.sum(F.when(~(
                (F.col("doc_id") % 10 == 0) | (F.col("doc_id") % 10 == 5)
            ), F.col("n_chars")).otherwise(0)).cast("long").alias("untouched_bytes"),
            F.sum(F.when(
                (F.col("doc_id") % 10 == 0) | (F.col("doc_id") % 10 == 5),
                F.col("n_chars"),
            ).otherwise(0)).cast("long").alias("touched_old_bytes"),
        )
    ).crossJoin(
        perturb_documents(docs).agg(
            F.sum(F.when(
                (F.col("doc_id") % 10 == 0) | (F.col("doc_id") % 10 == 5),
                F.col("n_chars"),
            ).otherwise(0)).cast("long").alias("touched_new_bytes")
        )
    )
    return sizes.crossJoin(agg).select(
        "untouched_bytes",
        "touched_old_bytes",
        "touched_new_bytes",
        (F.col("__n_leaked") == 0).alias("changes_localized"),
        (
            (F.col("__u_old") == F.col("untouched_bytes"))
            & (F.col("__n_unstable") == 0)
        ).alias("untouched_old_conserved"),
        (F.col("__u_new") == F.col("untouched_bytes")).alias(
            "untouched_new_conserved"
        ),
    )


# --- doc-level table CDC -----------------------------------------------------
# Row-level change capture between snapshots (operators/diff.py::
# table_diff): the feed an incremental pipeline keys on to re-process
# only touched documents. The "next snapshot" is the perturbed corpus
# minus a deterministic slice of deletions plus a slice of cloned
# additions, so all four statuses appear. The clone-id offset is 2^40 —
# far above any doc_id the generator can emit at any scale factor (sf1
# is ~5e6 docs), so clone ids can never collide with real ids and break
# the full-outer-join's unique-key assumption (a +1e6 offset would
# collide once doc_id reaches a million).

_ADD_OFFSET = 1 << 40

_TDIFF_ORACLE = f"""
WITH new_base AS ({PERTURB_SQL}),
new_snap AS (
  SELECT doc_id, text FROM new_base WHERE doc_id % 17 <> 3
  UNION ALL
  SELECT doc_id + 1099511627776 AS doc_id, text FROM new_base WHERE doc_id % 13 = 1
),
j AS (
  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM documents o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM j GROUP BY status
"""


@register("doc_table_diff", _TDIFF_ORACLE)
def q_doc_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.operators.diff import table_diff_summary

    old = load_table(spark, "documents", sf_dir)
    base = perturb_documents(old)
    new = (
        base.where(F.col("doc_id") % 17 != 3)
        .select("doc_id", "text")
        .unionByName(
            base.where(F.col("doc_id") % 13 == 1).select(
                (F.col("doc_id") + F.lit(_ADD_OFFSET)).alias("doc_id"), "text"
            )
        )
    )
    return table_diff_summary(old, new)


_APPLY_ORACLE = f"""
WITH new_base AS ({PERTURB_SQL}),
new_snap AS (
  SELECT doc_id, text FROM new_base WHERE doc_id % 17 <> 3
  UNION ALL
  SELECT doc_id + 1099511627776 AS doc_id, text FROM new_base WHERE doc_id % 13 = 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(0 AS BIGINT) AS n_mismatch
FROM new_snap
"""


@register("cdc_apply_check", _APPLY_ORACLE)
def q_cdc_apply_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the change feed: extracting changes between snapshots
    and MERGE-applying them onto the old snapshot must reproduce the new
    snapshot exactly (operators/diff.py::table_changes/apply_changes).
    The oracle states the contract: n_docs rows, zero mismatches."""
    from cdc_algorithms_spark.operators.diff import apply_changes, table_changes

    old = load_table(spark, "documents", sf_dir)
    base = perturb_documents(old)
    new = (
        base.where(F.col("doc_id") % 17 != 3)
        .select("doc_id", "text")
        .unionByName(
            base.where(F.col("doc_id") % 13 == 1).select(
                (F.col("doc_id") + F.lit(_ADD_OFFSET)).alias("doc_id"), "text"
            )
        )
    )
    rebuilt = apply_changes(old, table_changes(old, new))
    cmp = rebuilt.join(
        new.select(F.col("doc_id").cast("long").alias("doc_id"),
                   F.col("text").alias("want")),
        "doc_id",
        "full_outer",
    )
    return cmp.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(~F.col("text").eqNullSafe(F.col("want")), 1).otherwise(0)
        ).cast("long").alias("n_mismatch"),
    )


# --- content-store garbage collection ---------------------------------------
# After the new snapshot lands and the old one is dropped from retention,
# chunks only the old snapshot referenced are orphans; the GC plan is the
# maintenance read that says how many bytes a sweep reclaims. Store =
# union of both snapshots' unique chunks (what append_novel_chunks built
# up); live recipes = the new snapshot only.

_STORE_GC_ORACLE = f"""
WITH {_DIFF_CHUNKS_SQL},
store AS (
  SELECT chunk_text, MAX(length) AS length FROM (
    SELECT chunk_text, length FROM old_chunks
    UNION ALL
    SELECT chunk_text, length FROM new_chunks
  ) GROUP BY chunk_text
),
rc AS (
  SELECT s.chunk_text, s.length,
         (SELECT COUNT(*) FROM new_chunks n WHERE n.chunk_text = s.chunk_text)
           AS refcount
  FROM store s
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_store,
       CAST(SUM(length) AS BIGINT) AS store_bytes,
       CAST(SUM(CASE WHEN refcount > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
       CAST(COALESCE(SUM(CASE WHEN refcount > 0 THEN length END), 0) AS BIGINT)
         AS live_bytes,
       CAST(SUM(CASE WHEN refcount = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan,
       CAST(COALESCE(SUM(CASE WHEN refcount = 0 THEN length END), 0) AS BIGINT)
         AS orphan_bytes,
       ROUND(COALESCE(SUM(CASE WHEN refcount = 0 THEN length END), 0)
             * 1.0 / GREATEST(SUM(length), 1), 6) AS reclaim_ratio
FROM rc
"""


@register("store_gc_plan_fixed", _STORE_GC_ORACLE)
def store_gc_plan_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GC plan for the content-addressed store after dropping the old
    snapshot from retention (operators/dedup.py::store_gc_plan): store
    holds both snapshots' unique chunks, live recipes are the new
    snapshot's — old-only chunks are the reclaimable orphans. Identity
    is chunk_text here so DuckDB can replay it; at scale the operator
    runs on the 8-byte xxhash64 identity."""
    from cdc_algorithms_spark.operators.dedup import store_gc_plan

    docs = load_table(spark, "documents", sf_dir)
    old = fixed_chunks(docs, _SIZE)
    new = fixed_chunks(perturb_documents(docs), _SIZE)
    store = (
        old.select("chunk_text", "length")
        .unionByName(new.select("chunk_text", "length"))
        .groupBy("chunk_text")
        .agg(F.max("length").alias("length"))
    )
    return store_gc_plan(
        store, new.select("chunk_text"), key_col="chunk_text"
    )


# --- snapshot-chain version index -------------------------------------------
# Retention accounting across an ordered chain of three snapshots
# (v0 = documents, v1 = perturbed, v2 = perturbed twice): the
# (first_version, last_version) lifecycle matrix of chunk identities —
# which bytes dropping old snapshots reclaims, what each snapshot truly
# added. Fully SQL-expressible with fixed chunks.


def _perturb_from(rel: str) -> str:
    """The PERTURB_SQL transformation over an arbitrary relation (only
    doc_id/text are needed downstream)."""
    return f"""
SELECT doc_id,
       CASE
         WHEN doc_id % 10 = 0 THEN 'PREFIX-SHIFT ' || text
         WHEN doc_id % 10 = 5 THEN 'EDITED ' || substring(text, 8)
         ELSE text
       END AS text
FROM {rel}
"""


def _version_chunks(rel: str) -> str:
    return f"""
SELECT substring(d.text, CAST(u.off + 1 AS INT), {_SIZE}) AS chunk_text,
       CAST(LEAST({_SIZE}, length(d.text) - u.off) AS BIGINT) AS length
FROM {rel} d, UNNEST(range(0, length(d.text), {_SIZE})) AS u(off)
"""


_VERSION_MATRIX_ORACLE = f"""
WITH v1 AS ({_perturb_from('documents')}),
v2 AS ({_perturb_from('v1')}),
c0 AS ({_version_chunks('documents')}),
c1 AS ({_version_chunks('v1')}),
c2 AS ({_version_chunks('v2')}),
tagged AS (
  SELECT chunk_text, MAX(length) AS len, 0 AS v FROM c0 GROUP BY chunk_text
  UNION ALL
  SELECT chunk_text, MAX(length) AS len, 1 AS v FROM c1 GROUP BY chunk_text
  UNION ALL
  SELECT chunk_text, MAX(length) AS len, 2 AS v FROM c2 GROUP BY chunk_text
),
idx AS (
  SELECT chunk_text, MIN(v) AS first_version, MAX(v) AS last_version,
         MAX(len) AS bytes
  FROM tagged GROUP BY chunk_text
)
SELECT CAST(first_version AS BIGINT) AS first_version,
       CAST(last_version AS BIGINT) AS last_version,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(bytes) AS BIGINT) AS bytes
FROM idx GROUP BY first_version, last_version
"""


@register("chunk_version_matrix_fixed", _VERSION_MATRIX_ORACLE)
def chunk_version_matrix_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifecycle matrix of chunk identities across the 3-snapshot chain
    (operators/diff.py::chunk_version_matrix): cells with last_version <
    r are exactly what a retention drop of snapshots < r reclaims."""
    from cdc_algorithms_spark.operators.diff import chunk_version_matrix

    v0 = load_table(spark, "documents", sf_dir)
    v1 = perturb_documents(v0)
    v2 = perturb_documents(v1)
    return chunk_version_matrix(
        [fixed_chunks(v, _SIZE) for v in (v0, v1, v2)]
    )


# --- budget-capped delta sync ------------------------------------------------
# When the link can't carry the whole delta this cycle, highest dedup
# value per shipped byte goes first. Tie-free by construction: identities
# collapse to (bytes_all, len_one) value classes whose members are
# interchangeable, so the greedy boundary takes a COUNT from the class,
# never a specific member — the summary is independent of any tie-break
# and DuckDB replays it exactly.

_SYNC_BUDGET = 10_000

_SYNC_BUDGETED_ORACLE = f"""
WITH new_docs AS ({PERTURB_SQL}),
old_chunks AS (
  SELECT substring(d.text, CAST(u.off + 1 AS INT), {_SIZE}) AS chunk_text
  FROM documents d, UNNEST(range(0, d.n_chars, {_SIZE})) AS u(off)
),
new_chunks AS (
  SELECT substring(d.text, CAST(u.off + 1 AS INT), {_SIZE}) AS chunk_text,
         CAST(LEAST({_SIZE}, d.n_chars - u.off) AS BIGINT) AS length
  FROM new_docs d, UNNEST(range(0, d.n_chars, {_SIZE})) AS u(off)
),
per_id AS (
  SELECT chunk_text, SUM(length) AS bytes_all, MAX(length) AS len_one
  FROM new_chunks GROUP BY chunk_text
),
store AS (SELECT DISTINCT chunk_text FROM old_chunks),
novel AS (
  SELECT p.bytes_all, p.len_one
  FROM per_id p LEFT JOIN store s USING (chunk_text)
  WHERE s.chunk_text IS NULL
),
classes AS (
  SELECT bytes_all, len_one, COUNT(*) AS n,
         COUNT(*) * len_one AS transfer,
         COUNT(*) * bytes_all AS covered
  FROM novel GROUP BY bytes_all, len_one
),
ranked AS (
  SELECT *, COALESCE(SUM(transfer) OVER (
      ORDER BY bytes_all * 1.0 / len_one DESC, bytes_all DESC, len_one
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM classes
),
picked AS (
  SELECT n, transfer, covered,
         CASE WHEN cum_before + transfer <= {_SYNC_BUDGET} THEN n
              ELSE GREATEST(CAST(FLOOR(
                ({_SYNC_BUDGET} - cum_before) / len_one) AS BIGINT), 0)
         END AS take_n,
         len_one, bytes_all
  FROM ranked
)
SELECT CAST({_SYNC_BUDGET} AS BIGINT) AS budget_bytes,
       CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_novel,
       CAST(COALESCE(SUM(transfer), 0) AS BIGINT) AS novel_transfer_bytes,
       CAST(COALESCE(SUM(covered), 0) AS BIGINT) AS novel_covered_bytes,
       CAST(COALESCE(SUM(take_n), 0) AS BIGINT) AS n_shipped,
       CAST(COALESCE(SUM(take_n * len_one), 0) AS BIGINT)
         AS shipped_transfer_bytes,
       CAST(COALESCE(SUM(take_n * bytes_all), 0) AS BIGINT)
         AS shipped_covered_bytes,
       ROUND(COALESCE(SUM(take_n * bytes_all), 0) * 1.0
             / GREATEST(COALESCE(SUM(covered), 0), 1), 6) AS covered_ratio
FROM picked
"""


@register("sync_plan_budgeted_fixed", _SYNC_BUDGETED_ORACLE)
def sync_plan_budgeted_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-capped delta sync (operators/diff.py::sync_plan_budgeted):
    greedy highest-coverage-per-shipped-byte selection over value
    classes, boundary class taken by closed-form count."""
    from cdc_algorithms_spark.operators.diff import sync_plan_budgeted

    docs = load_table(spark, "documents", sf_dir)
    old = fixed_chunks(docs, _SIZE)
    new = fixed_chunks(perturb_documents(docs), _SIZE)
    return sync_plan_budgeted(old, new, _SYNC_BUDGET)
