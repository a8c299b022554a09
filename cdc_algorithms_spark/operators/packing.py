"""Sequence packing: documents → fixed-length training sequences.

The last batch-prep step of an LLM training pipeline: tokenized documents
are concatenated in a deterministic order and split into fixed
``seq_len``-token sequences (GPT-style concat-and-split packing — no
padding waste, documents may straddle sequence boundaries). The engine
computes the packing PLAN — which sequence ids each document lands in and
per-sequence fill accounting — without materializing token arrays, so it
runs at corpus scale as pure metadata arithmetic.

The reference (letit6E/cdc-algorithms) has no packing operator; this
extends the engine's training-data surface (SURVEY.md §2.5 / the
LLM-pipeline extension mandate) alongside curation and mixture planning.

Scale shape (the 100 TB question):

* the global token offset per document is a bounded two-phase prefix sum
  (operators/prefix.py) — no single-task whole-corpus window;
* each document then expands to the sequences it overlaps
  (``sequence(first_seq, last_seq)`` explode — ceil(toks/seq_len)+1
  rows, metadata only);
* per-sequence accounting is one hash aggregate on the well-distributed
  ``seq_id`` key.

Nothing document-sized shuffles; the only data-sized exchange is the
(doc_id, toks) metadata frame.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.prefix import bounded_running_sum


def doc_token_spans(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    toks: Column | None = None,
    bucket: int = 1024,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-document packing assignment: ``(*group_cols, doc_id, toks,
    tok_start, first_seq, last_seq)`` where ``tok_start`` is the
    document's offset in the concatenated token stream (documents
    ordered by ``id_col``) and ``first_seq``/``last_seq`` the inclusive
    range of ``seq_len``-sized sequences it overlaps.

    ``group_cols`` splits the packing into independent streams (one
    sequence space per language/source/domain — how a curriculum or
    per-domain-mixture run packs); empty means one global stream.

    ``toks`` defaults to the engine's standard chars/4 estimate (the same
    accounting curation and mixture planning use); pass a real token-count
    column when one exists.

    ``id_col`` must be NULL-free and castable to long: the id is the
    packing order, so a row whose id casts to NULL has no position, and
    letting the prefix-sum layer's NULL exclusion eat it would silently
    shift every downstream token offset. Such rows raise at execution
    time instead (JVM-side ``raise_error`` — no extra action/scan).
    """
    group_cols = list(group_cols)
    if toks is None:
        toks = F.ceil(F.length("text") / 4.0).cast("long")
    casted = F.col(id_col).try_cast("long")
    safe_id = F.when(
        casted.isNull(),
        F.raise_error(
            F.concat(
                F.lit(
                    f"doc_token_spans: {id_col!r} must be a non-NULL value "
                    "castable to long (it defines the packing order); got "
                ),
                F.coalesce(F.col(id_col).cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(casted)
    base = docs.select(
        *group_cols, safe_id.alias("doc_id"), toks.alias("toks")
    ).where(F.col("toks") > 0)
    running = bounded_running_sum(base, group_cols, "doc_id", "toks", bucket=bucket)
    return running.select(
        *group_cols,
        "doc_id",
        "toks",
        (F.col("running") - F.col("toks")).alias("tok_start"),
        F.floor((F.col("running") - F.col("toks")) / seq_len).alias("first_seq"),
        F.floor((F.col("running") - 1) / seq_len).alias("last_seq"),
    )


def sequence_packing(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    toks: Column | None = None,
    bucket: int = 1024,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-sequence packing accounting: ``(*group_cols, seq_id, n_docs,
    n_tokens, n_boundary_docs, fill_frac)``.

    * ``n_docs`` — documents contributing ≥1 token to the sequence;
    * ``n_tokens`` — tokens landing in the sequence (== ``seq_len``
      everywhere except each stream's final partial sequence);
    * ``n_boundary_docs`` — documents straddling INTO the next sequence
      (attention-mask / document-boundary bookkeeping downstream);
    * ``fill_frac`` — n_tokens / seq_len.

    With ``group_cols`` each group is an independent packing stream
    (its own seq_id space starting at 0).
    """
    group_cols = list(group_cols)
    spans = doc_token_spans(
        docs, seq_len, id_col=id_col, toks=toks, bucket=bucket,
        group_cols=group_cols,
    )
    per_seq = spans.select(
        *group_cols,
        "doc_id",
        "toks",
        "tok_start",
        "last_seq",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    ).select(
        *group_cols,
        "seq_id",
        # token overlap of [tok_start, tok_start + toks) with
        # [seq_id * seq_len, (seq_id + 1) * seq_len)
        (
            F.least(F.col("tok_start") + F.col("toks"), (F.col("seq_id") + 1) * seq_len)
            - F.greatest(F.col("tok_start"), F.col("seq_id") * seq_len)
        ).alias("overlap"),
        (F.col("seq_id") < F.col("last_seq")).cast("int").alias("straddles"),
    )
    return (
        per_seq.groupBy(*group_cols, "seq_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("overlap").cast("long").alias("n_tokens"),
            F.sum("straddles").cast("long").alias("n_boundary_docs"),
        )
        .withColumn("fill_frac", F.round(F.col("n_tokens") / seq_len, 6))
    )
