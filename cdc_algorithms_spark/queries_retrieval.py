"""Ranked retrieval + data-selection queries (operators/retrieval.py,
operators/selection.py): BM25 top-k (batch and durable-index probe),
cross-document duplicate n-gram fraction, and DSIR importance weights.

Oracle pairing: every query here is exactly SQL-expressible because the
float work is quantized to BIGINTs before any aggregation (see the
operator module docstrings) — the DuckDB oracles replay the identical
IEEE-double expression trees and integer sums bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_algorithms_spark.queries import register
from cdc_algorithms_spark.sources.registry import load_table

# Same tokenizer CTE as queries_text.py (one definition per file keeps
# each oracle self-contained, as the driver runs them standalone).
_WORDS_CTE = r"""
w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS words
  FROM documents
)
"""

# --- BM25 -------------------------------------------------------------------

BM25_K = 10
BM25_QUERIES: list[tuple[int, str]] = [
    (1, "spark window agg"),
    (2, "customer stream query"),
    (3, "vector hash join sort"),
]

# Pre-tokenized (query_id, term) literals — generated from the SAME
# Python constant the Spark side tokenizes, so the two sides cannot
# drift on what a query term is.
_QT_VALUES = ", ".join(
    f"({qid}, '{t}')"
    for qid, qtext in BM25_QUERIES
    for t in dict.fromkeys(qtext.lower().split())
)

# CTE block shared by the plain BM25 oracles and the hybrid-RRF oracle
# (the `ranked` CTE carries ALL ranks; consumers cut their own depth).
_BM25_CTES = f"""
WITH {_WORDS_CTE},
dl AS (SELECT doc_id, len(words) AS dl FROM w),
tf AS (
  SELECT t.doc_id, lower(u.word) AS term, COUNT(*) AS tf
  FROM w t, UNNEST(t.words) AS u(word) GROUP BY 1, 2
),
qt AS (SELECT DISTINCT * FROM (VALUES {_QT_VALUES}) AS t(query_id, term)),
meta AS (SELECT (SELECT COUNT(*) FROM documents) AS n,
                (SELECT SUM(dl) FROM dl) AS sum_dl),
dfq AS (
  SELECT tf.term, COUNT(*) AS df
  FROM tf JOIN (SELECT DISTINCT term FROM qt) q USING (term) GROUP BY 1
),
scored AS (
  SELECT qt.query_id, tf.doc_id,
         SUM(CAST(FLOOR(
           ln(1.0 + (m.n - dfq.df + 0.5) / (dfq.df + 0.5))
           * (tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl
                                      / (m.sum_dl * 1.0 / m.n))))
           * 1000000000.0) AS BIGINT)) AS score_q
  FROM tf
  JOIN qt USING (term)
  JOIN dfq ON tf.term = dfq.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN meta m
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, score_q,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score_q DESC, doc_id
         ) AS rank
  FROM scored
)"""

_BM25_ORACLE = f"""{_BM25_CTES}
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(rank AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id,
       ROUND(score_q / 1000000000.0, 6) AS score
FROM ranked WHERE rank <= {BM25_K}
"""


@register("bm25_topk_docs", _BM25_ORACLE)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch BM25 top-k over the documents table for a literal query
    set (operators/retrieval.py::bm25_topk). Scores are quantized-sum
    deterministic; ranking tiebreaks on doc_id; top-k is the
    WindowGroupLimit rank-filter form."""
    from cdc_algorithms_spark.operators.retrieval import bm25_topk, query_terms

    docs = load_table(spark, "documents", sf_dir)
    return bm25_topk(docs, query_terms(spark, BM25_QUERIES), k=BM25_K)


# One durable BM25 index per (session, corpus dir) — same contract and
# cache discipline as the Jaccard shingle index (queries_text.py): the
# index is the written-once side, repeat calls measure the PROBE.
_BM25_INDEX_CACHE: dict[tuple[str, str], str] = {}


def bm25_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Durable BM25 posting index over ``sf_dir``'s documents, built
    once per (session, corpus) — shared by every indexed-retrieval
    query so a session pays the tokenize+write exactly once."""
    import tempfile

    from cdc_algorithms_spark.operators.retrieval import write_text_index

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _BM25_INDEX_CACHE.get(key)
    if path is None:
        docs = load_table(spark, "documents", sf_dir)
        path = tempfile.mkdtemp(prefix="cdc_bm25_index_")
        write_text_index(docs, path)
        _BM25_INDEX_CACHE.clear()
        _BM25_INDEX_CACHE[key] = path
    return path


@register("bm25_topk_indexed", _BM25_ORACLE)
def q_bm25_topk_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 through the DURABLE index path (operators/retrieval.py::
    write_text_index → bm25_topk_indexed): postings live as term-bucket-
    partitioned parquet; the probe statically prunes its read to the
    ≤ #query-term buckets the query hashes into and derives df/avgdl
    from exactly what it reads. Same oracle as bm25_topk_docs — the
    index changes where the postings are read from, not what they
    say."""
    from cdc_algorithms_spark.operators.retrieval import (
        bm25_topk_indexed,
        query_terms,
    )

    return bm25_topk_indexed(
        spark,
        bm25_index_path(spark, sf_dir),
        query_terms(spark, BM25_QUERIES),
        k=BM25_K,
    )


# One streamed text index per (session, corpus dir) — the build (seed
# write + two streamed extension epochs) happens once; every call after
# probes the durable store, same contract as _BM25_INDEX_CACHE.
_BM25_STREAM_CACHE: dict[tuple[str, str], str] = {}


@register("streaming_bm25_index", _BM25_ORACLE)
def q_streaming_bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 through a STREAM-MAINTAINED durable index (streaming/
    text_index.py): the index seeds on a 2/3 corpus, the remaining
    third arrives as two foreachBatch epochs appended as bucket-
    partitioned deltas with exact per-epoch counts. Because the store
    holds nothing but counts and the probe derives df/avgdl from what
    it reads, the streamed index is BIT-IDENTICAL to the one-shot
    index AND to the batch query — so this row shares the batch BM25
    oracle verbatim, with no approximation tier (contrast
    streaming_pq_index's recall floor)."""
    import tempfile

    from cdc_algorithms_spark.operators.retrieval import (
        bm25_topk_indexed,
        query_terms,
    )
    from cdc_algorithms_spark.streaming.text_index import (
        run_streaming_text_index,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _BM25_STREAM_CACHE.get(key)
    if path is None:
        docs = load_table(spark, "documents", sf_dir)
        seed = docs.where(F.col("doc_id") % 3 != 0)
        stages = [
            docs.where(
                (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 2 == par)
            ).select("doc_id", "text")
            for par in (0, 1)
        ]
        path = tempfile.mkdtemp(prefix="cdc_bm25_stream_") + "/index"
        run_streaming_text_index(spark, seed, stages, path)
        _BM25_STREAM_CACHE.clear()
        _BM25_STREAM_CACHE[key] = path
    return bm25_topk_indexed(
        spark, path, query_terms(spark, BM25_QUERIES), k=BM25_K
    )


# --- Cross-document duplicate n-gram fraction --------------------------------

_DUP_N = 8

_DUP_FRACTION_ORACLE = f"""
WITH {_WORDS_CTE},
sh AS (
  SELECT doc_id, array_to_string(words[i:i+{_DUP_N - 1}], ' ') AS g
  FROM w, UNNEST(range(1, greatest(len(words) - {_DUP_N - 1}, 1) + 1)) AS t(i)
),
cnt AS (SELECT doc_id, g, COUNT(*) AS cnt FROM sh GROUP BY 1, 2),
df AS (SELECT g, COUNT(*) AS df FROM cnt GROUP BY 1)
SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
       CAST(SUM(c.cnt) AS BIGINT) AS n_ngrams,
       CAST(SUM(CASE WHEN df.df >= 2 THEN c.cnt ELSE 0 END) AS BIGINT)
         AS n_dup_ngrams,
       ROUND(SUM(CASE WHEN df.df >= 2 THEN c.cnt ELSE 0 END) * 1.0
             / SUM(c.cnt), 6) AS dup_fraction
FROM cnt c JOIN df USING (g)
GROUP BY 1
"""


@register("cross_doc_dup_fraction", _DUP_FRACTION_ORACLE)
def q_cross_doc_dup_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicate-text fraction (operators/selection.py::
    cross_doc_dup_fraction): the share of each doc's positional 8-gram
    instances that occur in ≥ 2 documents — the C4/RefinedWeb curation
    signal, complementing the pairwise dedup operators with a per-doc
    marginal you can threshold on."""
    from cdc_algorithms_spark.operators.selection import cross_doc_dup_fraction

    return cross_doc_dup_fraction(
        load_table(spark, "documents", sf_dir), n=_DUP_N
    )


# --- DSIR importance weights --------------------------------------------------

_DSIR_ORACLE = f"""
WITH {_WORDS_CTE},
tf AS (
  SELECT t.doc_id, d.lang, len(t.words) AS dl, lower(u.word) AS term,
         COUNT(*) AS tf
  FROM w t JOIN documents d USING (doc_id), UNNEST(t.words) AS u(word)
  GROUP BY 1, 2, 3, 4
),
raw AS (SELECT term, SUM(tf) AS c_raw FROM tf GROUP BY 1),
tgt AS (SELECT term, SUM(tf) AS c_tgt FROM tf WHERE lang = 'en' GROUP BY 1),
meta AS (SELECT (SELECT SUM(tf) FROM tf) AS total_raw,
                (SELECT COALESCE(SUM(tf), 0) FROM tf WHERE lang = 'en')
                  AS total_tgt,
                (SELECT COUNT(*) FROM raw) AS v),
contrib AS (
  SELECT tf.doc_id, tf.lang, tf.dl,
         CAST(FLOOR(tf.tf * (
           ln((COALESCE(tgt.c_tgt, 0) + 1) * 1.0 / (m.total_tgt + m.v))
           - ln((raw.c_raw + 1) * 1.0 / (m.total_raw + m.v))
         ) * 1000000000.0) AS BIGINT) AS cq
  FROM tf
  JOIN raw USING (term)
  LEFT JOIN tgt USING (term)
  CROSS JOIN meta m
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       lang,
       CAST(dl AS BIGINT) AS n_tokens,
       ROUND(SUM(cq) / 1000000000.0, 6) AS weight
FROM contrib
GROUP BY 1, 2, 3
"""


@register("dsir_importance_weights", _DSIR_ORACLE)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (operators/selection.py::
    dsir_importance_weights): per-doc log-likelihood ratio between a
    smoothed unigram model of the target slice (lang='en') and of the
    raw corpus — the standing input to importance resampling; the
    mixture/PPS operators realize the draw."""
    from cdc_algorithms_spark.operators.selection import dsir_importance_weights

    return dsir_importance_weights(
        load_table(spark, "documents", sf_dir), F.col("lang") == "en"
    )


# One streamed DSIR count store per (session, corpus dir) — the build
# (seed write + two streamed extension epochs) happens once; every call
# after scores against the durable store, same contract as the BM25 /
# PQ index caches.
_DSIR_STREAM_CACHE: dict[tuple[str, str], str] = {}


@register("streaming_dsir_weights", _DSIR_ORACLE)
def q_streaming_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR weights through a STREAM-MAINTAINED durable term-count
    store (streaming/dsir_stream.py → operators/selection.py::
    dsir_weights_indexed): the unigram models seed on a 2/3 corpus, the
    remaining third arrives as two foreachBatch epochs appended as
    bucket-partitioned count deltas with exact token totals. Because
    the store holds nothing but integer counts and scoring derives
    every model quantity (c_raw, c_tgt, totals, vocabulary size) from
    the folded generations through the SAME expression tree as the
    batch form, the streamed store scores the corpus BIT-IDENTICALLY —
    so this row shares the batch DSIR oracle verbatim, closing the
    selection tier's streaming loop (every standing pipeline here now
    has a maintained form)."""
    from cdc_algorithms_spark.operators.selection import dsir_weights_indexed
    from cdc_algorithms_spark.streaming.dsir_stream import (
        run_streaming_dsir_counts,
    )

    docs = load_table(spark, "documents", sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    path = _DSIR_STREAM_CACHE.get(key)
    if path is None:
        seed = docs.where(F.col("doc_id") % 3 != 0)
        stages = [
            docs.where(
                (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 2 == par)
            ).select("doc_id", "text", "lang")
            for par in (0, 1)
        ]
        path = tempfile_mkdtemp_dsir()
        run_streaming_dsir_counts(
            spark, seed, stages, path, F.col("lang") == "en"
        )
        _DSIR_STREAM_CACHE.clear()
        _DSIR_STREAM_CACHE[key] = path
    return dsir_weights_indexed(spark, path, docs)


def tempfile_mkdtemp_dsir() -> str:
    import tempfile

    return tempfile.mkdtemp(prefix="cdc_dsir_stream_") + "/counts_store"


_DSIR_TOPK_M = 50

_DSIR_TOPK_ORACLE = f"""
WITH weights AS ({_DSIR_ORACLE})
SELECT * FROM weights ORDER BY weight DESC, doc_id LIMIT {_DSIR_TOPK_M}
"""


@register("dsir_topk_selection", _DSIR_TOPK_ORACLE)
def q_dsir_topk_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR loop closed planning → realization: the top-m documents
    by importance weight, deterministic under the (weight DESC, doc_id)
    total order. Spark plans the global top-m as TakeOrderedAndProject —
    each partition keeps its local top-m and only m·partitions rows ever
    reach the driver-side merge, never a full sort (the scale-safe
    global-top-k shape; contrast a global ORDER BY window)."""
    from cdc_algorithms_spark.operators.selection import dsir_importance_weights

    weights = dsir_importance_weights(
        load_table(spark, "documents", sf_dir), F.col("lang") == "en"
    )
    return weights.orderBy(F.desc("weight"), F.asc("doc_id")).limit(_DSIR_TOPK_M)


_SPAN_DEDUP_ORACLE = f"""
WITH {_WORDS_CTE},
dl AS (SELECT doc_id, len(words) AS dl FROM w),
tok AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
         words[CAST(t.i + 1 AS INT)] AS token
  FROM w, UNNEST(range(0, len(words))) AS t(i)
),
gr AS (
  SELECT doc_id, CAST(t.i - 1 AS BIGINT) AS gpos,
         array_to_string(words[i:i+{_DUP_N - 1}], ' ') AS g
  FROM w, UNNEST(range(1, greatest(len(words) - {_DUP_N - 1}, 1) + 1)) AS t(i)
),
stats AS (
  SELECT g, COUNT(*) AS df, MIN(doc_id) AS keeper
  FROM (SELECT DISTINCT doc_id, g FROM gr) GROUP BY g
),
removable AS (
  SELECT gr.doc_id, gr.gpos
  FROM gr JOIN stats USING (g)
  WHERE stats.df >= 2 AND gr.doc_id <> stats.keeper
),
covered AS (
  SELECT DISTINCT r.doc_id, CAST(t.p AS BIGINT) AS pos
  FROM removable r JOIN dl USING (doc_id),
       UNNEST(range(r.gpos, LEAST(r.gpos + {_DUP_N}, dl.dl))) AS t(p)
),
kept AS (
  SELECT tok.doc_id, tok.pos, tok.token
  FROM tok LEFT JOIN covered
    ON tok.doc_id = covered.doc_id AND tok.pos = covered.pos
  WHERE covered.pos IS NULL
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(d.dl AS BIGINT) AS n_tokens,
       CAST(d.dl - COUNT(k.pos) AS BIGINT) AS n_removed,
       COALESCE(string_agg(k.token, ' ' ORDER BY k.pos), '') AS cleaned_text
FROM dl d LEFT JOIN kept k USING (doc_id)
GROUP BY d.doc_id, d.dl
"""


@register("exact_substring_dedup", _SPAN_DEDUP_ORACLE)
def q_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup (operators/selection.py::
    remove_duplicate_spans): every cross-doc duplicated 8-gram instance
    is removed from all but its canonical (min-doc_id) document and the
    survivors re-joined — the substring-granularity transform of Lee et
    al. 2022, complementing the doc-level dedup operators. The oracle
    replays removal and text reconstruction verbatim."""
    from cdc_algorithms_spark.operators.selection import remove_duplicate_spans

    return remove_duplicate_spans(
        load_table(spark, "documents", sf_dir), n=_DUP_N
    )


# --- Hybrid retrieval: BM25 + quantized-MIPS fused by RRF ---------------------

HYBRID_QVECS: list[tuple[int, int]] = [(1, 7), (2, 123), (3, 321)]
_RRF_DEPTH = 50
_RRF_K0 = 60
_HYBRID_K = 10

_QV_VALUES = ", ".join(f"({q}, {v})" for q, v in HYBRID_QVECS)

_HYBRID_ORACLE = f"""{_BM25_CTES},
lex AS (SELECT query_id, doc_id, rank FROM ranked WHERE rank <= {_RRF_DEPTH}),
qv AS (SELECT * FROM (VALUES {_QV_VALUES}) AS t(query_id, qvec_id)),
qq AS (
  SELECT qv.query_id, e.embedding
  FROM qv JOIN embeddings e ON e.vec_id = qv.qvec_id
),
pairs AS (
  SELECT q.query_id, d.vec_id AS doc_id,
         CAST(FLOOR(CAST(unnest(q.embedding) AS DOUBLE) * 1048576.0)
              AS BIGINT) AS qa,
         CAST(FLOOR(CAST(unnest(d.embedding) AS DOUBLE) * 1048576.0)
              AS BIGINT) AS da
  FROM qq q, embeddings d
),
dots AS (SELECT query_id, doc_id, SUM(qa * da) AS dot FROM pairs GROUP BY 1, 2),
sem AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY dot DESC, doc_id
           ) AS rank
    FROM dots
  ) WHERE rank <= {_RRF_DEPTH}
),
fused AS (
  SELECT query_id, doc_id,
         SUM(CAST(FLOOR(1000000000.0 / ({_RRF_K0} + rank)) AS BIGINT)) AS rrf_q
  FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)
  GROUP BY 1, 2
),
final AS (
  SELECT query_id, doc_id, rrf_q,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY rrf_q DESC, doc_id
         ) AS rank
  FROM fused
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(rank AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id,
       ROUND(rrf_q / 1000000000.0, 6) AS rrf_score
FROM final WHERE rank <= {_HYBRID_K}
"""


@register("hybrid_rrf_search", _HYBRID_ORACLE)
def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search, the modern retrieval default: the lexical leg
    (BM25 ranks to depth 50) and the semantic leg (top-50 by QUANTIZED
    integer inner product over the aligned embeddings — floats scaled
    by 2^20 and floored, so the dot products are exact BIGINTs and the
    ranking is engine-identical) fused by reciprocal-rank fusion
    (operators/retrieval.py::mips_topk / rrf_fuse). Every stage is
    integer-deterministic, so the whole fusion replays bit-for-bit in
    DuckDB."""
    from cdc_algorithms_spark.operators.retrieval import (
        bm25_ranks,
        mips_topk,
        query_terms,
        rrf_fuse,
    )

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    lex = bm25_ranks(docs, query_terms(spark, BM25_QUERIES), depth=_RRF_DEPTH)
    qmap = spark.createDataFrame(HYBRID_QVECS, "query_id long, qvec_id long")
    qvecs = qmap.join(emb, qmap["qvec_id"] == emb["vec_id"]).select(
        "query_id", "embedding"
    )
    sem = mips_topk(emb, qvecs, k=_RRF_DEPTH)
    return rrf_fuse([lex, sem], k=_HYBRID_K, k0=_RRF_K0)


# Indexed hybrid: the standing-pipeline form — both legs probe their
# durable stores. The lexical leg is BIT-identical to the batch one
# (pure counts → df/avgdl derived at read time), pinned by count +
# checksum the oracle recomputes from scratch; the semantic leg is the
# IVF-PQ probe, so the FUSED top-k carries the module's standard
# recall-floor contract instead of bit-identity (measured fused overlap
# vs the brute fusion: 0.70 / 0.70 / 0.87 at sf0.001/0.01/0.1).
HYBRID_IDX_RECALL_FLOOR = 0.5

_HYBRID_IDX_ORACLE = f"""{_BM25_CTES},
lex AS (SELECT query_id, doc_id, rank FROM ranked WHERE rank <= {_RRF_DEPTH}),
qv AS (SELECT * FROM (VALUES {_QV_VALUES}) AS t(query_id, qvec_id)),
qq AS (
  SELECT qv.query_id, e.embedding
  FROM qv JOIN embeddings e ON e.vec_id = qv.qvec_id
),
pairs AS (
  SELECT q.query_id, d.vec_id AS doc_id,
         CAST(FLOOR(CAST(unnest(q.embedding) AS DOUBLE) * 1048576.0)
              AS BIGINT) AS qa,
         CAST(FLOOR(CAST(unnest(d.embedding) AS DOUBLE) * 1048576.0)
              AS BIGINT) AS da
  FROM qq q, embeddings d
),
dots AS (SELECT query_id, doc_id, SUM(qa * da) AS dot FROM pairs GROUP BY 1, 2),
sem AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY dot DESC, doc_id
           ) AS rank
    FROM dots
  ) WHERE rank <= {_RRF_DEPTH}
),
fused AS (
  SELECT query_id, doc_id,
         SUM(CAST(FLOOR(1000000000.0 / ({_RRF_K0} + rank)) AS BIGINT)) AS rrf_q
  FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem)
  GROUP BY 1, 2
),
final AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY rrf_q DESC, doc_id
         ) AS rank
  FROM fused
)
SELECT CAST((SELECT COUNT(*) FROM lex) AS BIGINT) AS n_lex,
       CAST((SELECT SUM(query_id * 1000000000000 + rank * 100000000
                        + doc_id) FROM lex) AS BIGINT) AS lex_checksum,
       CAST((SELECT COUNT(*) FROM final WHERE rank <= {_HYBRID_K})
            AS BIGINT) AS n_fused_exact,
       CAST({HYBRID_IDX_RECALL_FLOOR} AS DOUBLE) AS recall_floor,
       TRUE AS recall_ok
"""


@register("hybrid_rrf_indexed", _HYBRID_IDX_ORACLE)
def q_hybrid_rrf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search composed over the DURABLE indexes — the form a
    standing 100 TB pipeline actually runs (contrast hybrid_rrf_search,
    which re-tokenizes the corpus and brute-scans the embeddings per
    query set): the lexical leg probes the term-bucket BM25 store
    (bm25_topk_indexed — reads pruned to the query terms' buckets), the
    semantic leg probes the cell-partitioned IVF-PQ store
    (pq_topk_indexed — training-free, cell-pruned ADC + exact re-rank;
    both prunings plan-pinned in tests), and the legs fuse by RRF.

    Verification tiers per leg: the lexical leg is count+checksum
    BIT-identical to the DuckDB-recomputed batch ranks (the index holds
    pure counts); the fused top-k is recall-floored against the brute
    fusion, whose size the oracle also recomputes — the ann_pq_recall
    contract applied to fusion."""
    from cdc_algorithms_spark.queries_text import pq_index_path

    return _hybrid_indexed_check(
        spark, sf_dir, bm25_index_path(spark, sf_dir),
        pq_index_path(spark, sf_dir),
    )


def _hybrid_indexed_check(
    spark: SparkSession, sf_dir: str, text_path: str, pq_path: str
) -> DataFrame:
    """Shared check frame for the indexed-hybrid driver rows: probe the
    given durable stores, fuse, and report (n_lex, lex_checksum,
    n_fused_exact, recall_floor, recall_ok) — the lexical quantities
    are DuckDB-recomputable exactly; the fused recall is floored
    against the brute fusion."""
    from cdc_algorithms_spark.operators.retrieval import (
        bm25_topk_indexed,
        mips_topk,
        query_terms,
        rrf_fuse,
    )
    from cdc_algorithms_spark.operators.similarity import (
        pq_topk_indexed,
        read_pq_index,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    qt = query_terms(spark, BM25_QUERIES)
    lex = bm25_topk_indexed(spark, text_path, qt, k=_RRF_DEPTH).select(
        "query_id", "doc_id", "rank"
    )
    qmap = spark.createDataFrame(HYBRID_QVECS, "query_id long, qvec_id long")
    qvecs = qmap.join(emb, qmap["qvec_id"] == emb["vec_id"]).select(
        "query_id", "embedding"
    )
    index = read_pq_index(spark, pq_path)
    sem_idx = pq_topk_indexed(
        qvecs, index, emb, k=_RRF_DEPTH, nprobe=6, rerank=6
    ).select("query_id", F.col("vec_id").alias("doc_id"), "rank")
    fused_idx = rrf_fuse([lex, sem_idx], k=_HYBRID_K, k0=_RRF_K0).select(
        "query_id", "doc_id"
    )
    # the exact side of the recall check (same brute legs the
    # hybrid_rrf_search query fuses)
    sem_brute = mips_topk(emb, qvecs, k=_RRF_DEPTH)
    fused_exact = rrf_fuse([lex, sem_brute], k=_HYBRID_K, k0=_RRF_K0).select(
        "query_id", "doc_id"
    )
    hits = fused_exact.join(fused_idx, ["query_id", "doc_id"], "left_semi")
    checksum = F.sum(
        F.col("query_id") * F.lit(1_000_000_000_000)
        + F.col("rank") * F.lit(100_000_000)
        + F.col("doc_id")
    ).cast("long")
    return (
        lex.agg(
            F.count(F.lit(1)).cast("long").alias("n_lex"),
            checksum.alias("lex_checksum"),
        )
        .crossJoin(
            fused_exact.agg(
                F.count(F.lit(1)).cast("long").alias("n_fused_exact")
            )
        )
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("__n_hit")))
        .select(
            "n_lex",
            "lex_checksum",
            "n_fused_exact",
            F.lit(HYBRID_IDX_RECALL_FLOOR).cast("double").alias(
                "recall_floor"
            ),
            (
                F.round(F.col("__n_hit") / F.col("n_fused_exact"), 4)
                >= HYBRID_IDX_RECALL_FLOOR
            ).alias("recall_ok"),
        )
    )


# One streamed hybrid store pair per (session, corpus dir) — the build
# (both seeds + two combined foreachBatch epochs) happens once; every
# call after probes the durable stores, same contract as the other
# index caches.
_HYBRID_STREAM_CACHE: dict[tuple[str, str], tuple[str, str]] = {}


@register("streaming_hybrid_index", _HYBRID_IDX_ORACLE)
def q_streaming_hybrid_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval over STREAM-MAINTAINED stores (streaming/
    hybrid_index.py): both halves seed on a 2/3 corpus (text index +
    PQ model), the remaining third arrives as two foreachBatch epochs
    of combined (doc_id, text, embedding) rows, and ONE loop extends
    BOTH stores per micro-batch under a shared epoch id — so replay
    re-lands the two halves in lockstep and no document is findable by
    one leg and invisible to the other. The probe is the
    hybrid_rrf_indexed check verbatim: the streamed text store answers
    BIT-identically to the batch build (pure counts), so the lexical
    checksum shares that oracle; the streamed PQ store is frozen-model
    encode-only, so the fused top-k carries the recall-floor tier
    (measured fused overlap ≥ 0.70 at sf0.001/0.01 with the seed-
    trained model)."""
    from cdc_algorithms_spark.streaming.hybrid_index import (
        run_streaming_hybrid_index,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    paths = _HYBRID_STREAM_CACHE.get(key)
    if paths is None:
        import tempfile

        docs = load_table(spark, "documents", sf_dir)
        emb = load_table(spark, "embeddings", sf_dir)
        # LEFT join: every document streams into the lexical store even
        # when it has no embedding row (at sf0.1 only 2000 of 5000 do) —
        # the loop treats a NULL embedding as partial modality
        combined = docs.select("doc_id", "text").join(
            emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
            "doc_id",
            "left",
        )
        seed = combined.where(F.col("doc_id") % 3 != 0)
        stages = [
            combined.where(
                (F.col("doc_id") % 3 == 0) & (F.col("doc_id") % 2 == par)
            )
            for par in (0, 1)
        ]
        root = tempfile.mkdtemp(prefix="cdc_hybrid_stream_") + "/stores"
        # sweep-sized model geometry (m=4/nlist=8/iters=2 instead of the
        # 8/16/3 default): the verdicts this row pins are the lexical
        # bit-identity checksum and a fused recall FLOOR, not PQ
        # fidelity — the smaller model keeps the fused overlap well over
        # the 0.5 floor (measured ≥0.64 at sf0.001/0.01) at ~2.5× fewer
        # Lloyd jobs, so the driver's verify window stays cheap to
        # rotate (r09 task: this entry was 79 s of the sweep)
        paths = run_streaming_hybrid_index(
            spark,
            seed.select("doc_id", "text"),
            seed.where(F.col("embedding").isNotNull()).select(
                F.col("doc_id").alias("vec_id"), "embedding"
            ),
            stages,
            root,
            m=4,
            nlist=8,
            iters=2,
        )
        _HYBRID_STREAM_CACHE.clear()
        _HYBRID_STREAM_CACHE[key] = paths
    return _hybrid_indexed_check(spark, sf_dir, paths[0], paths[1])


# --- BPE tokenizer induction --------------------------------------------------

_BPE_TOPK = 50
# production-scale request: learning is driver-side over the collected
# vocabulary (operators/bpe.py::learn_bpe_from_counts), so the merge
# count no longer costs Spark jobs — the fixtures' synthetic vocabulary
# exhausts earlier and the learner stops at the true fixpoint
_BPE_MERGES = 1000

_BPE_PAIRS_ORACLE = f"""
WITH {_WORDS_CTE},
wf AS (
  SELECT lower(u.word) AS word, COUNT(*) AS wc
  FROM w, UNNEST(w.words) AS u(word) GROUP BY 1
),
pairs AS (
  SELECT substring(word, CAST(t.i AS INT), 1) AS l,
         substring(word, CAST(t.i + 1 AS INT), 1) AS r,
         wc
  FROM wf, UNNEST(range(1, length(word))) AS t(i)
),
agg AS (
  SELECT l, r, SUM(wc) AS pair_count FROM pairs GROUP BY 1, 2
),
ranked AS (
  SELECT l, r, pair_count,
         ROW_NUMBER() OVER (ORDER BY pair_count DESC, l, r) AS rank
  FROM agg
)
SELECT CAST(rank AS BIGINT) AS rank,
       l AS "left", r AS "right",
       CAST(pair_count AS BIGINT) AS pair_count
FROM ranked WHERE rank <= {_BPE_TOPK}
"""


@register("bpe_pair_counts", _BPE_PAIRS_ORACLE)
def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE round, oracle-exact: adjacent character-pair counts
    over the distinct-word frequency table (operators/bpe.py::
    pair_counts — the corpus collapses to vocabulary scale BEFORE any
    iteration), top-50 by (count, pair). The global rank window here
    runs over the PAIR AGGREGATE — bounded by the square of the
    character alphabet, a tiny frame by construction (same documented
    exemption as the value-class windows in operators/diff.py), never
    the corpus. The iterative merge selection itself is content-defined
    like CDC cuts and gets the rows-only + reference-implementation
    treatment (`bpe_merge_table`, tests/test_bpe.py)."""
    from cdc_algorithms_spark.operators.bpe import (
        _init_symbols,
        pair_counts,
        word_freq_table,
    )
    from pyspark.sql import Window

    wf = word_freq_table(load_table(spark, "documents", sf_dir))
    sym = wf.select(_init_symbols(F.col("word")).alias("__syms"), "wc")
    pc = pair_counts(sym)
    w = Window.orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
    return (
        pc.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _BPE_TOPK)
        .select("rank", "left", "right", "pair_count")
    )


@register("bpe_merge_table")
def q_bpe_merge_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned merge table (operators/bpe.py::learn_bpe) at a
    PRODUCTION merge request (1000; the synthetic fixture vocabulary
    exhausts earlier, so the table is the corpus's true fixpoint).
    Spark folds the corpus to the word-frequency table; the merges are
    learned driver-side in one pass (learn_bpe_from_counts — no
    per-round Spark jobs). Merge selection is iterative and
    content-defined — not SQL-expressible, so this row is rows-only
    for the driver; the table is pinned EXACTLY against an independent
    from-scratch reference implementation and the encoder's reassembly
    conservation in tests/test_bpe.py (the same oracle strategy as the
    CDC cut tables)."""
    from cdc_algorithms_spark.operators.bpe import learn_bpe

    merges = learn_bpe(load_table(spark, "documents", sf_dir), _BPE_MERGES)
    return spark.createDataFrame(
        merges, "merge_rank long, left string, right string, pair_count long"
    )


_BPE_ENCODE_ORACLE = f"""
WITH {_WORDS_CTE},
wf AS (
  SELECT lower(u.word) AS word, COUNT(*) AS wc
  FROM w, UNNEST(w.words) AS u(word) GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(wc * length(word)) AS BIGINT) AS char_occurrences,
       CAST(SUM(wc * length(word)) AS BIGINT) AS token_chars,
       CAST(COUNT(*) AS BIGINT) AS n_roundtrip_ok
FROM wf
"""


@register("bpe_encode_check", _BPE_ENCODE_ORACLE)
def q_bpe_encode_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY half of the tokenizer loop, driver-verified end to end
    (operators/bpe.py::bpe_encode): learn the full merge table, encode
    the distinct-word vocabulary with it, and report the two encoder
    invariants as quantities the oracle recomputes INDEPENDENTLY of any
    merge choice — ``token_chars`` (corpus character occurrences summed
    THROUGH the emitted tokens, weighted by word frequency) must equal
    the oracle's ``SUM(wc·length(word))``, and every word must
    reassemble exactly from its token sequence (``n_roundtrip_ok`` =
    ``n_words``) — the byte-conservation strategy the CDC concat checks
    use, applied to subword tokenization. The merge-dependent
    quantities (token ids, per-word token counts) stay pinned against
    the independent reference implementation in tests/test_bpe.py;
    this row proves the ENCODER run on the real corpus is lossless and
    character-conserving, which no wrong merge application can fake
    (a dropped/duplicated symbol breaks conservation, a misordered
    merge breaks reassembly)."""
    from cdc_algorithms_spark.operators.bpe import bpe_encode, learn_bpe

    docs = load_table(spark, "documents", sf_dir)
    merges = learn_bpe(docs, _BPE_MERGES)
    enc = bpe_encode(docs, merges)
    tok_chars = F.aggregate(
        "tokens", F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return enc.agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.col("wc") * F.length("word")).cast("long").alias(
            "char_occurrences"
        ),
        F.sum(F.col("wc") * tok_chars).cast("long").alias("token_chars"),
        F.sum(
            F.when(F.concat_ws("", F.col("tokens")) == F.col("word"), 1)
            .otherwise(0)
        ).cast("long").alias("n_roundtrip_ok"),
    )


_NEG_K = 10
_NEG_SEM_K = 10

_HARD_NEG_ORACLE = f"""{_BM25_CTES},
lex AS (SELECT query_id, doc_id, rank FROM ranked WHERE rank <= {_RRF_DEPTH}),
qv AS (SELECT * FROM (VALUES {_QV_VALUES}) AS t(query_id, qvec_id)),
qq AS (
  SELECT qv.query_id, e.embedding
  FROM qv JOIN embeddings e ON e.vec_id = qv.qvec_id
),
pairs AS (
  SELECT q.query_id, d.vec_id AS doc_id,
         CAST(FLOOR(CAST(unnest(q.embedding) AS DOUBLE) * 1048576.0)
              AS BIGINT) AS qa,
         CAST(FLOOR(CAST(unnest(d.embedding) AS DOUBLE) * 1048576.0)
              AS BIGINT) AS da
  FROM qq q, embeddings d
),
dots AS (SELECT query_id, doc_id, SUM(qa * da) AS dot FROM pairs GROUP BY 1, 2),
sem AS (
  SELECT query_id, doc_id FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY dot DESC, doc_id
           ) AS rank
    FROM dots
  ) WHERE rank <= {_NEG_SEM_K}
),
neg AS (
  SELECT l.query_id, l.doc_id, l.rank AS lex_rank
  FROM lex l LEFT JOIN sem s
    ON l.query_id = s.query_id AND l.doc_id = s.doc_id
  WHERE s.doc_id IS NULL
),
final AS (
  SELECT query_id, doc_id, lex_rank,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY lex_rank, doc_id
         ) AS rank
  FROM neg
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(rank AS BIGINT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id,
       CAST(lex_rank AS BIGINT) AS lex_rank
FROM final WHERE rank <= {_NEG_K}
"""


@register("contrastive_hard_negatives", _HARD_NEG_ORACLE)
def q_contrastive_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive retriever training
    (operators/retrieval.py::hard_negatives): documents BM25 ranks in
    its top 50 that the quantized-MIPS semantic leg does NOT place in
    its top 10 — lexically confusable, semantically wrong, the standard
    negatives recipe. Pure rank arithmetic over the two deterministic
    legs, so the whole mine replays bit-for-bit in DuckDB."""
    from cdc_algorithms_spark.operators.retrieval import (
        bm25_ranks,
        hard_negatives,
        mips_topk,
        query_terms,
    )

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    lex = bm25_ranks(docs, query_terms(spark, BM25_QUERIES), depth=_RRF_DEPTH)
    qmap = spark.createDataFrame(HYBRID_QVECS, "query_id long, qvec_id long")
    qvecs = qmap.join(emb, qmap["qvec_id"] == emb["vec_id"]).select(
        "query_id", "embedding"
    )
    sem = mips_topk(emb, qvecs, k=_NEG_SEM_K)
    return hard_negatives(lex, sem, k=_NEG_K)
