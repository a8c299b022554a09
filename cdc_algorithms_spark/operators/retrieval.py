"""Ranked full-text retrieval (BM25) — batch and durable-index forms.

The training-data use case: given a handful of probe queries (an eval
set's topics, a contamination suspect, a targeted-selection prompt),
rank the corpus by BM25 and keep the top-k per query. This is the
fourth instance of the repo's durable-index pattern (after the Jaccard
shingle index, the PQ/ANN index, and the Z-layout store): the posting
list is written ONCE as term-bucket-partitioned parquet and every probe
statically prunes its reads down to the buckets the query's own terms
hash into — probe I/O is query-proportional, never corpus-proportional.

Determinism contract (what makes the DuckDB oracle bit-exact): each
per-term contribution ``idf(t) * tf_saturation(t, d)`` is an identical
IEEE-double expression tree in Spark and the oracle SQL, then
**quantized to a BIGINT** (``floor(contrib * 1e9)``) before summation.
Integer sums are associative, so the score is independent of Spark's
partition-order-of-summation — the one place a float BM25 would drift
between engines — and ranking on the quantized score with a ``doc_id``
tiebreak is fully deterministic. The reported ``score`` is the
quantized sum scaled back (exact to 1e-9, rounded to 6).

Scale notes (100 TB):
* The fold to ``(doc_id, term, tf)`` happens before anything joins —
  the token stream never shuffles raw.
* Query terms ride an explicit ``broadcast`` (a query is a few words).
* Document frequency is computed ONLY for the query's terms in the
  batch form (filter first, then count) — the full vocabulary df is
  corpus-sized and is only materialized when building the durable
  index, where it is denormalized onto the postings so a probe never
  recomputes it.
* Top-k per query is the rank-window + filter form Catalyst rewrites
  with partial ``WindowGroupLimit``: each input partition keeps only
  its local top-k before the exchange.

Reference tie-in: the reference engine has no text retrieval; this
module is part of the mandated LLM-pipeline surface (task brief), built
on the same tokenizer (`functions/text.py::words`) as the dedup and
TF-IDF operators so every text operator agrees on what a "term" is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_algorithms_spark.functions.text import words

K1 = 1.2
B = 0.75
QUANT = 1_000_000_000  # 1e-9 contribution quantum (see module docstring)


def doc_term_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, dl, term, tf): per-document term frequencies + doc length.

    ``dl`` is the total token count (not distinct), bound to a column
    BEFORE the explode so the regex split runs once per row. Rows are
    unique on (doc_id, term).
    """
    ws = docs.select("doc_id", words("text").alias("__ws"))
    return (
        ws.select(
            "doc_id",
            F.size("__ws").alias("dl"),
            F.explode("__ws").alias("word"),
        )
        .select("doc_id", "dl", F.lower("word").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def corpus_meta(docs: DataFrame) -> DataFrame:
    """One row (n, sum_dl): corpus size + total token count.

    Kept as two exact BIGINTs (avgdl is derived inside the scoring
    expression as ``sum_dl * 1.0 / n``) so the meta row is
    storage-stable — no float round-trips through parquet.
    """
    ws = docs.select(words("text").alias("__ws"))
    return ws.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size("__ws")).alias("sum_dl"),
    )


def query_terms(spark: SparkSession, queries: list[tuple[int, str]]) -> DataFrame:
    """(query_id, term) rows, distinct per query, from literal strings.

    Terms are deduplicated within a query (classic BM25 with binary
    query tf); tokenization is the shared ``words`` + lower, so query
    and corpus agree on term identity.
    """
    qdf = spark.createDataFrame(queries, "query_id long, qtext string")
    return (
        qdf.select("query_id", F.explode(words("qtext")).alias("word"))
        .select("query_id", F.lower("word").alias("term"))
        .distinct()
    )


def _contrib_q(k1: float, b: float) -> Column:
    """Quantized per-(query-term, doc) BM25 contribution.

    Expects columns tf, dl, df, n, sum_dl in scope. The expression tree
    mirrors the oracle SQL token-for-token (operand order matters for
    bit-identity): idf = ln(1 + (n - df + 0.5)/(df + 0.5)), saturation
    = tf / (tf + k1*(1 - b + b*dl/avgdl)), avgdl = sum_dl*1.0/n.
    """
    avgdl = F.col("sum_dl") * F.lit(1.0) / F.col("n")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    sat = F.col("tf") / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / avgdl)
    )
    return F.floor(idf * sat * F.lit(float(QUANT))).cast("long")


def _score_and_rank(
    matched: DataFrame, meta: DataFrame, k: int, k1: float, b: float
) -> DataFrame:
    """Shared tail: quantize, exact-sum, rank, top-k, format."""
    scored = (
        matched.crossJoin(F.broadcast(meta))
        .withColumn("__cq", _contrib_q(k1, b))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("__cq").alias("score_q"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_q"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col("doc_id").cast("long").alias("doc_id"),
            F.round(F.col("score_q") / F.lit(float(QUANT)), 6).alias("score"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    qterms: DataFrame,
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Batch BM25 top-k: (query_id, rank, doc_id, score).

    Postings are filtered to the query's terms FIRST (broadcast join),
    and df is counted over the filtered frame — the full vocabulary's
    document frequency is never materialized, so the batch form's
    working set is (docs containing a query term), not the corpus
    vocabulary.
    """
    postings = doc_term_frame(docs)
    matched = postings.join(F.broadcast(qterms.select("term").distinct()), "term")
    # postings are unique on (doc_id, term) → df is a plain count
    dfq = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    matched = (
        matched.join(F.broadcast(dfq), "term")
        .join(F.broadcast(qterms), "term")
    )
    return _score_and_rank(matched, corpus_meta(docs), k, k1, b)


# --- Durable term-bucket-partitioned index ---------------------------------


def write_text_index(docs: DataFrame, path: str, buckets: int = 32) -> None:
    """Write the BM25 posting index: parquet partitioned by term bucket.

    Layout::

        path/postings/bucket=<pmod(xxhash64(term), buckets)>/...
            (term, doc_id, tf, dl, df)   -- df denormalized per posting
        path/meta/   one row (n, sum_dl) -- exact BIGINTs

    df is constant within a term, so denormalizing costs one BIGINT per
    posting and saves every probe a second dataset + join. The bucket
    count bounds probe fan-in: a q-term query touches ≤ q partition
    directories regardless of corpus size.
    """
    postings = doc_term_frame(docs)
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    indexed = (
        postings.join(dfreq, "term")
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(buckets)))
    )
    (
        indexed.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path + "/postings")
    )
    corpus_meta(docs).write.mode("overwrite").parquet(path + "/meta")


def bm25_topk_indexed(
    spark: SparkSession,
    path: str,
    qterms: DataFrame,
    k: int = 10,
    k1: float = K1,
    b: float = B,
    buckets: int = 32,
) -> DataFrame:
    """Probe the durable index: identical output to :func:`bm25_topk`.

    The probe collects the query terms' bucket ids (≤ #query-terms
    values — a driver list the size of the query, never the corpus) and
    filters the posting scan on the partition column, so Spark prunes
    the read down to those directories statically (PartitionFilters —
    pinned in tests/test_plans.py).
    """
    bkts = [
        r["bucket"]
        for r in qterms.select(
            F.pmod(F.xxhash64("term"), F.lit(buckets)).alias("bucket")
        )
        .distinct()
        .collect()
    ]
    postings = (
        spark.read.parquet(path + "/postings")
        .where(F.col("bucket").isin(bkts))
        .join(F.broadcast(qterms), "term")
    )
    meta = spark.read.parquet(path + "/meta")
    return _score_and_rank(postings, meta, k, k1, b)
