"""Snapshot diff — change detection between two chunked corpus versions.

The "CDC-for-delta-sync" reading of the reference (SURVEY.md §7 M3):
chunk both snapshots, compare chunk identity sets per source; identical
content regions produce identical chunks regardless of byte shifts
(the defining CDC property), so an edit near the front of a document
only invalidates the chunks it touches.

All of it is declarative: per-side aggregation then a full-outer join on
(src_id, chunk identity) — at scale this is one shuffle per side on the
same key, and Catalyst/AQE pick the join strategy.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def snapshot_diff(
    old_chunks: DataFrame,
    new_chunks: DataFrame,
    key_col: str = "chunk_text",
) -> DataFrame:
    """Per-(src, chunk-identity) classification.

    Returns ``(src_id, status, n_old, n_new, chunk_bytes)`` where status is
    ``unchanged`` (identity present in both), ``deleted`` (old only) or
    ``inserted`` (new only). Multiplicity-aware: a chunk occurring 3× in
    old and 1× in new is still ``unchanged`` but the counts expose the
    delta.
    """
    agg = lambda df, cnt: df.groupBy("src_id", key_col).agg(
        F.count(F.lit(1)).alias(cnt), F.first("length").alias(f"_len_{cnt}")
    )
    old = agg(old_chunks, "n_old")
    new = agg(new_chunks, "n_new")
    joined = old.join(new, ["src_id", key_col], "full_outer")
    return joined.select(
        "src_id",
        F.col(key_col),
        F.when(F.col("n_old").isNotNull() & F.col("n_new").isNotNull(), "unchanged")
        .when(F.col("n_old").isNotNull(), "deleted")
        .otherwise("inserted")
        .alias("status"),
        F.coalesce("n_old", F.lit(0)).cast("long").alias("n_old"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
        F.coalesce("_len_n_old", "_len_n_new").cast("long").alias("chunk_bytes"),
    )


def snapshot_diff_summary(
    old_chunks: DataFrame,
    new_chunks: DataFrame,
    key_col: str = "chunk_text",
) -> DataFrame:
    """Corpus-level rollup: chunks/bytes per status."""
    d = snapshot_diff(old_chunks, new_chunks, key_col)
    return (
        d.groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunk_ids"),
            F.sum("chunk_bytes").cast("long").alias("bytes"),
        )
        .orderBy("status")
    )


def change_ratio(
    old_chunks: DataFrame,
    new_chunks: DataFrame,
    key_col: str = "chunk_text",
    round_to: int = 6,
) -> DataFrame:
    """Per-source change ratio: fraction of new-snapshot chunk identities
    that did not exist in the old snapshot — the delta-sync cost of the
    update (bytes that must be re-transferred)."""
    d = snapshot_diff(old_chunks, new_chunks, key_col)
    return (
        d.groupBy("src_id")
        .agg(
            F.sum(F.when(F.col("status") == "inserted", F.col("chunk_bytes")))
            .alias("_ins"),
            F.sum(F.when(F.col("status") != "deleted", F.col("chunk_bytes")))
            .alias("_new_total"),
        )
        .select(
            "src_id",
            F.coalesce("_ins", F.lit(0)).cast("long").alias("inserted_bytes"),
            F.coalesce("_new_total", F.lit(0)).cast("long").alias("new_bytes"),
            F.round(
                F.coalesce("_ins", F.lit(0))
                / F.greatest("_new_total", F.lit(1)),
                round_to,
            ).alias("change_ratio"),
        )
    )


def perturb_documents(docs: DataFrame) -> DataFrame:
    """Deterministic synthetic "next snapshot" of the documents table
    (FIXTURES.md derived fixtures): every 10th doc gets a prefix insertion
    (byte shift — CDC must realign), every 10th+5 doc gets an in-place
    edit, the rest are untouched. SQL-expressible so the whole diff
    pipeline stays DuckDB-oracle-checkable.
    """
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 0, F.concat(F.lit("PREFIX-SHIFT "), F.col("text")))
        .when(
            F.col("doc_id") % 10 == 5,
            F.concat(F.lit("EDITED "), F.substring(F.col("text"), 8, 1 << 30)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
        "source",
        F.length(
            F.when(F.col("doc_id") % 10 == 0, F.concat(F.lit("PREFIX-SHIFT "), F.col("text")))
            .when(
                F.col("doc_id") % 10 == 5,
                F.concat(F.lit("EDITED "), F.substring(F.col("text"), 8, 1 << 30)),
            )
            .otherwise(F.col("text"))
        ).cast("long").alias("n_chars"),
    )


# DuckDB mirror of perturb_documents (kept adjacent so they evolve together).
PERTURB_SQL = """
SELECT doc_id,
       CASE
         WHEN doc_id % 10 = 0 THEN 'PREFIX-SHIFT ' || text
         WHEN doc_id % 10 = 5 THEN 'EDITED ' || substring(text, 8)
         ELSE text
       END AS text,
       lang, source,
       CAST(length(CASE
         WHEN doc_id % 10 = 0 THEN 'PREFIX-SHIFT ' || text
         WHEN doc_id % 10 = 5 THEN 'EDITED ' || substring(text, 8)
         ELSE text
       END) AS BIGINT) AS n_chars
FROM documents
"""


def sync_plan(old_chunks: DataFrame, new_chunks: DataFrame) -> DataFrame:
    """Per-source transfer plan for delta sync against an existing store.

    The operational payoff of chunk-level dedup (the reference's whole
    point): to ship the new snapshot to a replica that already holds the
    old snapshot's content-addressed store, a chunk costs bytes only if
    its content is new — and globally only once. Per new chunk:

    * ``reused_old`` — identity already in the old store: 0 bytes.
    * ``transfer`` — first occurrence (by (src_id, offset) order) of a
      new identity: its length is shipped.
    * ``dedup_new`` — later occurrence of a new identity: 0 bytes,
      deduplicated within the transfer itself.

    Identity is ``xxhash64(chunk_text)`` computed map-side BEFORE any
    exchange, so both the first-occurrence aggregate and the join-back
    move 8-byte keys + three longs — never chunk payloads (equal hash ⇒
    equal bytes under the repo's 64-bit identity model, ae.rs:75-84
    collision stance; the DuckDB oracle checks the text-keyed
    formulation and results agree absent a 64-bit collision).

    The first-occurrence pick is ``min(struct(src_id, offset))`` per
    identity — a hash aggregate with map-side partial combine — NOT a
    ``row_number`` window partitioned by ``chunk_text``: a content-keyed
    window lands EVERY copy of a hot duplicate (a zero block, a
    boilerplate header) in one task, while the aggregate collapses them
    map-side and AQE's skew handling covers the join-back.

    Precondition: ``new_chunks`` rows are unique on (src_id, offset) —
    true for every chunker in this repo (one chunk per offset). If a
    caller unions overlapping chunk tables, the tied copies of the
    minimum (src_id, offset) would EACH classify as ``transfer``
    (the struct-equality test matches all of them), over-reporting
    bytes to ship; dedupe the input first.
    """
    # ONE scan of new_chunks: collapse immediately to per-(identity,
    # src) metadata (equal hash ⇒ equal length, so len_one is exact).
    # Everything after this first map-side-combined aggregate moves
    # 8-byte keys and longs — no payload ever shuffles, and the chunk
    # generation pipeline feeding new_chunks is not re-executed for the
    # first-occurrence side (it derives from per_sk, not a second scan).
    per_sk = (
        new_chunks.select(
            F.xxhash64("chunk_text").alias("__k"), "src_id", "offset", "length"
        )
        .groupBy("__k", "src_id")
        .agg(
            F.sum("length").alias("bytes_all"),
            F.max("length").alias("len_one"),
            F.min("offset").alias("__moff"),
        )
        # both consumers below need __k-distribution (the first-occurrence
        # rollup and the identity join-back); partitioning here lets
        # Catalyst reuse ONE exchange for both instead of shuffling the
        # per-(identity, src) frame twice
        .repartition("__k")
    )
    # global first occurrence per identity: lexicographic min over
    # (src_id, offset) — the per-src min offset preserves it exactly
    first = per_sk.groupBy("__k").agg(
        F.min(F.struct("src_id", "__moff")).alias("__first")
    )
    identity_tbl = first.join(
        old_chunks.select(F.xxhash64("chunk_text").alias("__k"))
        .distinct()
        .withColumn("in_store", F.lit(True)),
        "__k",
        "left",
    )
    joined = per_sk.join(identity_tbl, "__k").select(
        "src_id",
        "bytes_all",
        "len_one",
        F.col("in_store").isNotNull().alias("__reused"),
        (F.col("src_id") == F.col("__first.src_id")).alias("__is_first_src"),
    )
    zero = F.lit(0)
    new_side = ~F.col("__reused")
    holds_first = new_side & F.col("__is_first_src")
    return joined.groupBy("src_id").agg(
        F.sum("bytes_all").cast("long").alias("total_bytes"),
        F.coalesce(
            F.sum(F.when(F.col("__reused"), F.col("bytes_all"))), zero
        ).cast("long").alias("reused_old_bytes"),
        F.coalesce(
            F.sum(F.when(holds_first, F.col("len_one"))), zero
        ).cast("long").alias("transfer_bytes"),
        F.coalesce(
            F.sum(
                F.when(
                    holds_first, F.col("bytes_all") - F.col("len_one")
                ).when(new_side, F.col("bytes_all"))
            ),
            zero,
        ).cast("long").alias("dedup_new_bytes"),
    )


def _diff_joined(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    cmp_cols: Sequence[str],
) -> DataFrame:
    """Shared core of table_diff/table_changes: one null-safe full-outer
    join on the id key, classified ``(id_col, status, *new-side cmp
    cols)``. Both sides shuffle once on the well-distributed id;
    comparison columns travel exactly once. The id keeps its ORIGINAL
    type — a cast here would silently NULL every id for (e.g.)
    string-keyed tables even though the join itself is type-agnostic."""
    cmp_cols = list(cmp_cols)
    o = old.select(
        F.col(id_col).alias("__id"), *[F.col(c).alias(f"__o_{c}") for c in cmp_cols]
    ).withColumn("__in_old", F.lit(True))
    n = new.select(
        F.col(id_col).alias("__id"), *[F.col(c).alias(f"__n_{c}") for c in cmp_cols]
    ).withColumn("__in_new", F.lit(True))
    same = F.lit(True)
    for c in cmp_cols:
        same = same & F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    return o.join(n, "__id", "full_outer").select(
        F.col("__id").alias(id_col),
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        *[F.col(f"__n_{c}").alias(c) for c in cmp_cols],
    )


def table_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    cmp_cols: Sequence[str] = ("text",),
) -> DataFrame:
    """Row-level change-data-capture between two table snapshots:
    ``(id, status)`` with status ∈ added / removed / changed / unchanged.

    The relational complement of the chunk-level ``snapshot_diff``:
    where snapshot_diff localizes WHICH BYTES moved inside a changed
    document, table_diff answers WHICH ROWS changed at all — the feed an
    incremental pipeline keys on to re-process only touched documents.
    Comparisons are null-safe (`eqNullSafe`), so NULL→value and
    value→NULL edits count as changed.
    """
    return _diff_joined(old, new, id_col, cmp_cols).select(id_col, "status")


def table_diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    cmp_cols: Sequence[str] = ("text",),
) -> DataFrame:
    """``(status, n_rows)`` rollup of :func:`table_diff`."""
    return (
        table_diff(old, new, id_col=id_col, cmp_cols=cmp_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )


def table_changes(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    cmp_cols: Sequence[str] = ("text",),
) -> DataFrame:
    """Change feed between snapshots: non-``unchanged`` rows only, with
    the NEW-side payload (NULL payload for removed rows) — the minimal
    frame a MERGE/upsert consumer needs to advance ``old`` to ``new``."""
    return _diff_joined(old, new, id_col, cmp_cols).where(
        F.col("status") != "unchanged"
    )


def apply_changes(
    old: DataFrame,
    changes: DataFrame,
    id_col: str = "doc_id",
    payload_cols: Sequence[str] = ("text",),
) -> DataFrame:
    """MERGE the :func:`table_changes` feed into ``old``, producing the
    new snapshot: touched ids (any status) leave ``old`` via one
    left-anti join on the id key; added/changed payloads come from the
    feed. ``apply_changes(old, table_changes(old, new)) ≡ new`` — the
    round-trip a sync consumer relies on (pinned in tests and by the
    ``cdc_apply_check`` oracle query)."""
    payload_cols = list(payload_cols)
    touched = changes.select(F.col(id_col))
    kept = old.select(id_col, *payload_cols).join(touched, id_col, "left_anti")
    upserts = changes.where(F.col("status") != "removed").select(
        id_col, *payload_cols
    )
    return kept.unionByName(upserts)


def chunk_version_index(
    chunk_tables: Sequence[DataFrame],
    key_col: str = "chunk_text",
    length_col: str = "length",
) -> DataFrame:
    """Per-identity lifecycle across an ORDERED snapshot chain —
    ``(key, first_version, last_version, n_versions, bytes)`` — the
    retention-planning read of a deduplicated backup chain: an identity
    whose ``last_version`` precedes the retention floor is reclaimable,
    one whose ``first_version`` is the newest snapshot is that
    snapshot's true incremental cost, and ``n_versions <
    last_version − first_version + 1`` marks content that disappeared
    and came back (an edit that was later reverted).

    Scale shape: each snapshot's chunk table collapses to per-(identity,
    version) rows FIRST (map-side combined — hot duplicate chunks never
    reach the shuffle at multiplicity), then one aggregate keyed on the
    identity rolls the chain up. The union is V scans but the shuffled
    volume is unique-chunks × versions metadata rows, never payload
    bytes when ``key_col`` is the 8-byte hash.
    """
    if not chunk_tables:
        raise ValueError("need at least one snapshot's chunk table")
    tagged = None
    for v, t in enumerate(chunk_tables):
        x = t.select(
            F.col(key_col),
            F.col(length_col).alias("__len"),
            F.lit(v).cast("long").alias("__v"),
        )
        tagged = x if tagged is None else tagged.unionByName(x)
    per_ver = tagged.groupBy(key_col, "__v").agg(
        F.max("__len").alias("__len_one")
    )
    return per_ver.groupBy(key_col).agg(
        F.min("__v").cast("long").alias("first_version"),
        F.max("__v").cast("long").alias("last_version"),
        F.count(F.lit(1)).cast("long").alias("n_versions"),
        F.max("__len_one").cast("long").alias("bytes"),
    )


def chunk_version_matrix(
    chunk_tables: Sequence[DataFrame],
    key_col: str = "chunk_text",
    length_col: str = "length",
) -> DataFrame:
    """Rollup of :func:`chunk_version_index` to the (first_version,
    last_version) lifecycle matrix: how many unique chunks (and bytes)
    entered at version i and were last seen at version j. The compact
    answer to every retention question at once — dropping snapshots
    < r reclaims exactly the cells with ``last_version < r``; the
    diagonal cells are single-snapshot transients. At most V² rows
    regardless of corpus size."""
    idx = chunk_version_index(chunk_tables, key_col, length_col)
    return idx.groupBy("first_version", "last_version").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("bytes").cast("long").alias("bytes"),
    )


def sync_plan_budgeted(
    old_chunks: DataFrame,
    new_chunks: DataFrame,
    budget_bytes: int,
) -> DataFrame:
    """Delta-sync under a transfer budget: which novel bytes ship FIRST
    when the link can't carry the whole delta this cycle — highest
    dedup value per shipped byte (bytes covered / bytes shipped) wins.

    One summary row: ``(budget_bytes, n_novel, novel_transfer_bytes,
    novel_covered_bytes, n_shipped, shipped_transfer_bytes,
    shipped_covered_bytes, covered_ratio)`` where a novel identity
    "covers" all its occurrences' bytes once shipped and covered_ratio
    = shipped_covered / novel_covered (1.0 when the budget suffices).

    Scale + determinism design: identities collapse to VALUE CLASSES
    keyed by (bytes_all, len_one) — every member of a class has
    identical cost and benefit, so the greedy boundary can take "any k
    of the class" without the result depending on a tie-break, and the
    whole plan needs NO per-identity ranking: per-class aggregation
    (map-side combined), a cumulative sum over the tiny class frame
    (O(distinct (multiplicity, length) pairs) rows — the only global
    window, deliberately aggregate-sized), then closed-form boundary
    arithmetic ``take = floor(remaining_budget / len_one)``. Equal-hash
    ⇒ equal-bytes as everywhere (ae.rs:75-84 identity model).
    """
    per_id = (
        new_chunks.select(
            F.xxhash64("chunk_text").alias("__k"), "length"
        )
        .groupBy("__k")
        .agg(
            F.sum("length").alias("bytes_all"),
            F.max("length").alias("len_one"),
        )
    )
    store = (
        old_chunks.select(F.xxhash64("chunk_text").alias("__k"))
        .distinct()
        .withColumn("__in", F.lit(True))
    )
    novel = per_id.join(store, "__k", "left").where(F.col("__in").isNull())
    classes = novel.groupBy("bytes_all", "len_one").agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) * F.first("len_one")).alias("transfer"),
        (F.count(F.lit(1)) * F.first("bytes_all")).alias("covered"),
    )
    density = F.col("bytes_all") / F.col("len_one")
    w = (
        Window.orderBy(
            density.desc(), F.col("bytes_all").desc(), F.col("len_one")
        ).rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = classes.withColumn(
        "__cum_before", F.coalesce(F.sum("transfer").over(w), F.lit(0))
    )
    take_n = F.when(
        F.col("__cum_before") + F.col("transfer") <= budget_bytes, F.col("n")
    ).otherwise(
        F.greatest(
            F.floor(
                (budget_bytes - F.col("__cum_before")) / F.col("len_one")
            ),
            F.lit(0),
        )
    )
    picked = ranked.select(
        "n",
        "transfer",
        "covered",
        take_n.cast("long").alias("__take"),
        (take_n * F.col("len_one")).cast("long").alias("__take_transfer"),
        (take_n * F.col("bytes_all")).cast("long").alias("__take_covered"),
    )
    zero = F.lit(0)
    return picked.agg(
        F.lit(int(budget_bytes)).cast("long").alias("budget_bytes"),
        F.coalesce(F.sum("n"), zero).cast("long").alias("n_novel"),
        F.coalesce(F.sum("transfer"), zero)
        .cast("long")
        .alias("novel_transfer_bytes"),
        F.coalesce(F.sum("covered"), zero)
        .cast("long")
        .alias("novel_covered_bytes"),
        F.coalesce(F.sum("__take"), zero).cast("long").alias("n_shipped"),
        F.coalesce(F.sum("__take_transfer"), zero)
        .cast("long")
        .alias("shipped_transfer_bytes"),
        F.coalesce(F.sum("__take_covered"), zero)
        .cast("long")
        .alias("shipped_covered_bytes"),
        F.round(
            F.coalesce(F.sum("__take_covered"), zero)
            / F.greatest(F.sum("covered"), F.lit(1)),
            6,
        ).alias("covered_ratio"),
    )
