"""Training-data mixture planning: weighted per-source token budgets.

A training run specifies a source mixture ("40% web, 30% code, …") over
a total token budget; the pipeline must turn that into a concrete,
deterministic document selection. ``mixture_plan`` computes, per
source: the available tokens, the weight-allocated budget (capped by
availability), and the documents actually selected — lowest doc_id
first until the source's budget is exhausted (the same deterministic
pick rule as the curation pipeline's per-language cap).

Scale shape: token counting is map-only; per-source availability is one
partial-agg shuffle; the weights table is a literal broadcast; document
selection is the bounded two-phase prefix sum (operators/prefix.py) —
no whole-source single-task window anywhere.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.prefix import bounded_running_sum


def mixture_plan(
    docs: DataFrame,
    weights: Mapping[str, float],
    total_tokens: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    bucket: int = 1024,
) -> DataFrame:
    """Per-source mixture summary: ``(source, weight, available_tokens,
    allocated_tokens, tokens_selected, n_docs_selected)``.

    ``allocated = min(available, floor(total_tokens * weight))`` —
    under-weighted surplus is NOT redistributed (deterministic,
    single-pass; callers wanting redistribution re-run with renormalized
    weights over the short sources' leftovers). Sources absent from
    ``weights`` get weight 0 and select nothing but still report
    availability; sources named in ``weights`` but absent from ``docs``
    report availability 0 (so an unfillable budget slice is visible).
    Docs with NULL/empty text carry no tokens and are never selected.
    """
    spark = docs.sparkSession
    # toks > 0 filter: a NULL/empty text carries no tokens — without it
    # such a doc would inflate n_docs_selected while adding nothing to
    # tokens_selected (same contract as packing.doc_token_spans)
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(source_col).alias("source"),
        F.coalesce(F.ceil(F.length(text_col) / 4.0).cast("long"), F.lit(0)).alias(
            "toks"
        ),
    ).where(F.col("toks") > 0)
    wdf = spark.createDataFrame(
        [(s, float(w)) for s, w in sorted(weights.items())],
        "source string, weight double",
    )
    avail = toks.groupBy("source").agg(
        F.sum("toks").cast("long").alias("available_tokens")
    )
    # full outer: a source that is WEIGHTED but absent from docs must
    # still report (available 0, allocated 0) — dropping the row would
    # hide an unfillable slice of the requested budget from the caller
    alloc = (
        avail.join(F.broadcast(wdf), "source", "full_outer")
        .select(
            "source",
            F.coalesce("weight", F.lit(0.0)).alias("weight"),
            F.coalesce("available_tokens", F.lit(0)).cast("long").alias(
                "available_tokens"
            ),
            F.least(
                F.coalesce("available_tokens", F.lit(0)),
                F.floor(total_tokens * F.coalesce("weight", F.lit(0.0))).cast(
                    "long"
                ),
            ).alias("allocated_tokens"),
        )
    )
    running = bounded_running_sum(
        toks, ["source"], "doc_id", "toks", bucket=bucket
    )
    selected = (
        running.join(
            F.broadcast(alloc.select("source", "allocated_tokens")), "source"
        )
        .where(F.col("running") <= F.col("allocated_tokens"))
        .groupBy("source")
        .agg(
            F.sum("toks").cast("long").alias("tokens_selected"),
            F.count(F.lit(1)).cast("long").alias("n_docs_selected"),
        )
    )
    return alloc.join(selected, "source", "left").select(
        "source",
        "weight",
        "available_tokens",
        "allocated_tokens",
        F.coalesce("tokens_selected", F.lit(0)).cast("long").alias(
            "tokens_selected"
        ),
        F.coalesce("n_docs_selected", F.lit(0)).cast("long").alias(
            "n_docs_selected"
        ),
    )


def temperature_weights(
    docs: DataFrame,
    alpha: float,
    total_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-based mixture weights: ``weight_i ∝ available_i^alpha``.

    The standard up-sampling rule for imbalanced sources (multilingual /
    multi-domain training): ``alpha=1`` reproduces natural proportions,
    ``alpha=0`` is uniform, values in between flatten the distribution
    so small sources are seen more often. Output per source:
    ``(source, available_tokens, weight, allocated_tokens, epochs)``
    where ``allocated = floor(total_tokens · weight)`` and ``epochs`` is
    the implied pass count over the source (``allocated / available`` —
    the >1 values are the up-sampled sources).

    Scale shape: token counting is map-only; one partial-agg shuffle to
    per-source totals (rows = #sources); the normalizing constant is a
    1-row broadcast cross join. Nothing row-level survives the first
    aggregate. Unlike :func:`mixture_plan` (which takes weights as
    input), this DERIVES the weights from corpus statistics.
    """
    avail = (
        docs.where(F.length(text_col) > 0)
        .select(
            F.col(source_col).alias("source"),
            F.ceil(F.length(text_col) / 4.0).cast("long").alias("toks"),
        )
        .groupBy("source")
        .agg(F.sum("toks").cast("long").alias("available_tokens"))
    )
    powed = avail.withColumn(
        "__p", F.pow(F.col("available_tokens").cast("double"), F.lit(alpha))
    )
    norm = powed.agg(F.sum("__p").alias("__norm"))
    # The normalizer is a float sum whose accumulation order differs
    # between engines; a raw floor(total·p/norm) can flip by 1 when the
    # ratio lands within float-noise of an integer.  Rounding the ratio
    # to 6 decimals BEFORE flooring (mirrored in the SQL oracle) makes
    # the integer boundary engine-stable.
    alloc = F.floor(
        F.round(total_tokens * F.col("__p") / F.col("__norm"), 6)
    ).cast("long")
    return (
        powed.crossJoin(F.broadcast(norm))
        .select(
            "source",
            "available_tokens",
            F.round(F.col("__p") / F.col("__norm"), 6).alias("weight"),
            alloc.alias("allocated_tokens"),
            F.round(
                alloc / F.col("available_tokens"),
                6,
            ).alias("epochs"),
        )
    )
