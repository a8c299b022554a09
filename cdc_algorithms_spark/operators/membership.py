"""Approximate-membership operators: a pure-expression Bloom filter.

Reference context: the Rust engine's dedup set is an exact in-memory
``HashSet`` of chunk hashes (ae.rs:75-84).  At 100 TB the analogous
"have we seen this key" question often doesn't need exactness — a Bloom
filter answers it with *zero false negatives* and a bounded false-
positive rate while occupying ``m`` bits instead of the key set itself.
The canonical pipeline use is benchmark decontamination: the eval-set
shingle vocabulary compiles into a few KB of bits that broadcast to
every executor, instead of broadcasting the full distinct-shingle table.

Everything here is JVM-side expression work:

- **build**: each key sets ``num_hashes`` bit positions
  (``xxhash64(key, seed) mod num_bits``); positions pack into
  ``num_bits/64`` longs via a ``bit_or`` aggregate.  The packed filter
  is a ONE-ROW DataFrame — at most a few thousand longs — which is the
  only thing that ever reaches the driver or the broadcast.
- **probe**: cross-join the one-row filter (broadcast — Spark plans a
  ``BroadcastNestedLoopJoin`` with a single build row) and test all
  ``num_hashes`` positions with ``aggregate``/``element_at``/bit math.
  No UDF, no Python, whole-stage codegen throughout.

Sizing: false-positive rate ≈ (1 − e^(−k·n/m))^k; ``num_bits ≈ 10·n``
with ``num_hashes = 7`` gives ≈ 1%.  The guarantee that matters for
correctness is one-sided: a key that WAS inserted always probes true,
so a Bloom-gated filter can only over-select, never drop a true match —
the invariant the ``bloom_decontamination_check`` oracle pins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["build_bloom", "probe_bloom", "bloom_flagged_docs"]


def _positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """array<long> of ``num_hashes`` bit positions for ``key``.

    Seeding: ``xxhash64`` has no seed parameter in the function API, so
    the probe index is mixed in as a second hashed column — the same
    trick the MinHash family uses for its hash bank.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.pmod(F.xxhash64(key, s), F.lit(num_bits)),
    )


def build_bloom(
    keys: DataFrame, key_col: str, num_bits: int, num_hashes: int = 7
) -> DataFrame:
    """Compile the distinct values of ``keys[key_col]`` into a Bloom
    filter: a ONE-ROW DataFrame ``(filter: array<long>)`` of
    ``ceil(num_bits/64)`` packed words.

    Shape: explode each key into its ``num_hashes`` positions, bucket by
    word index, ``bit_or`` the per-word masks (map-side combinable — the
    shuffle carries at most ``num_bits/64`` rows per mapper), then fold
    the sparse (word_idx, bits) pairs into one dense array via a
    ``map_from_entries`` over a bounded ``collect_list``.  The single
    final row is bounded by the filter size, never by the key count.
    """
    if num_bits % 64 != 0:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64
    pos = (
        keys.select(F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("__pos"))
        .select(
            (F.col("__pos") / 64).cast("int").alias("__word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("__pos") % 64).cast("int")
            ).alias("__bit"),
        )
    )
    words = pos.groupBy("__word").agg(F.bit_or("__bit").alias("__bits"))
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("__word", "__bits"))).alias("__m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("__m"), i.cast("int")), F.lit(0).cast("long")
            ),
        ).alias("filter")
    )


def probe_bloom(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    num_bits: int,
    num_hashes: int = 7,
    out_col: str = "might_contain",
) -> DataFrame:
    """``df`` plus a boolean ``out_col``: true iff every one of the
    key's ``num_hashes`` bit positions is set in ``bloom``.

    The one-row filter cross-joins in as a broadcast (a single-row
    ``BroadcastNestedLoopJoin`` — no shuffle on the probe side), and the
    probe is one fold over the position array.  ``num_bits``/
    ``num_hashes`` must match the build call.
    """
    probed = df.crossJoin(F.broadcast(bloom))
    hit = F.aggregate(
        _positions(F.col(key_col), num_bits, num_hashes),
        F.lit(True),
        lambda acc, p: acc
        & (
            F.element_at(F.col("filter"), (p / 64).cast("int") + 1)
            .bitwiseAND(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                )
            )
            != 0
        ),
    )
    return probed.withColumn(out_col, hit).drop("filter")


def bloom_flagged_docs(
    train: DataFrame,
    bench: DataFrame,
    n: int = 5,
    num_bits: int = 1 << 20,
    num_hashes: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bloom-gated decontamination: ``(doc_id, n_shingles, bloom_hit)``
    per training doc, where ``bloom_hit`` means ≥1 of the doc's word
    ``n``-grams probed positive against the benchmark-shingle filter.

    Versus the exact ``decontaminate`` (dedup_docs.py): the broadcast
    here is ``num_bits/8`` bytes of filter instead of the benchmark's
    full distinct-shingle table, and the probe is a map-only expression
    — no join against the benchmark side at all.  Flagged docs are a
    SUPERSET of the exactly-contaminated docs (Bloom filters have no
    false negatives); the standard two-tier pipeline routes only the
    flagged sliver through the exact join.

    Sizing note: the flag is doc-level (ANY shingle probing positive),
    so the per-shingle FP rate compounds across each doc's ~``L``
    shingles — size for ``fp_shingle ≈ target_doc_fp / L``, not for the
    textbook 1%.  The 2^20-bit default holds the doc-level FP at ≈0 for
    benchmark vocabularies up to ~10⁵ shingles while broadcasting only
    128 KB.
    """
    from cdc_algorithms_spark.operators.dedup_docs import doc_shingles

    bench_keys = doc_shingles(bench, n, id_col, text_col).select("shingle").distinct()
    bloom = build_bloom(bench_keys, "shingle", num_bits, num_hashes)
    tr = doc_shingles(train, n, id_col, text_col)
    probed = probe_bloom(tr, "shingle", bloom, num_bits, num_hashes, out_col="__hit")
    return probed.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.max("__hit").alias("bloom_hit"),
    )
