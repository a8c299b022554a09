"""Heavy-hitter (frequent-term) detection: Misra-Gries prune + exact
recount.

The exact way to find terms above a frequency threshold is
``explode(words) → groupBy(term) → count`` — but at 100 TB that
shuffles the ENTIRE token stream keyed by term (the vocabulary is
heavy-tailed, so the shuffle is corpus-sized and the hot stopword keys
skew it).  The classic fix is a two-pass summary:

1. **Candidate pass (map-only)**: each partition runs a Misra-Gries
   summary with ``k`` counters over its own tokens.  MG guarantees any
   term with local count > n_p/(k+1) finishes with a live counter; by
   pigeonhole, a term with GLOBAL count > N/(k+1) must exceed that
   local bar in at least one partition — so the union of per-partition
   survivors is a SUPERSET of every global heavy hitter.  Only
   ``k × partitions`` candidate terms leave the mappers.
2. **Recount pass (exact)**: broadcast the candidate set, semi-join the
   token stream against it (map-only), and aggregate exact counts for
   candidates only.  The final threshold filter makes the OUTPUT exact
   and partitioning-independent: MG only ever widens the candidate set,
   never the result.

The MG loop is per-partition imperative state — the one shape the task
brief reserves for ``mapInPandas`` — and runs over Arrow batches, not
rows.  Everything else stays JVM-side.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_algorithms_spark.functions.text import words

__all__ = ["frequent_terms"]


def _mg_candidates(tokens: DataFrame, k: int) -> DataFrame:
    """Per-partition Misra-Gries survivors of ``tokens.term`` — at most
    ``k`` terms per partition, guaranteed to include every term whose
    partition-local count exceeds n_p/(k+1)."""

    def summarize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for term in pdf["term"]:
                if term in counters:
                    counters[term] += 1
                elif len(counters) < k:
                    counters[term] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for t in counters:
                        counters[t] -= 1
                        if counters[t] == 0:
                            dead.append(t)
                    for t in dead:
                        del counters[t]
        yield pd.DataFrame({"term": list(counters.keys())})

    return tokens.mapInPandas(summarize, "term string")


def frequent_terms(
    docs: DataFrame,
    phi: float = 0.005,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact ``(term, freq)`` for every term occurring in more than
    ``phi`` of all token positions, computed without a vocabulary-sized
    shuffle.

    ``k = ceil(2/phi)`` counters give MG a miss bar of N/(k+1) < φN/2 —
    comfortably under the output threshold — so the recount's
    ``freq > φN`` filter returns exactly the true heavy hitters
    regardless of how the candidate pass partitioned.  Output is what a
    full groupBy would produce, which is what the DuckDB oracle checks.
    """
    from cdc_algorithms_spark.operators.dedup_docs import _persist

    k = math.ceil(2.0 / phi)
    # one persisted scan feeds the count, the MG pass, and the recount
    # (scoped via the dedup_docs cache registry / release_cached_frames);
    # token rows are never wider than a single word
    tokens = _persist(docs.select(F.explode(words(text_col)).alias("term")))
    total = tokens.count()  # also materializes the persist
    candidates = _mg_candidates(tokens, k).distinct()
    counted = (
        tokens.join(F.broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    threshold = math.floor(phi * total)
    return counted.where(F.col("freq") > threshold)
