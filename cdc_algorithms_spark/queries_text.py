"""Training-data pipeline queries: document dedup, similarity search,
text analysis, multimodal plumbing (task brief; registered as
first-class operators alongside SURVEY.md §2).

Oracle pairing: content-defined computations (word shingles, Jaccard,
cosine, regex token counts) are mirrored in DuckDB list/regex functions;
hash-family-dependent paths (MinHash, SimHash, LSH buckets, winnowing
fingerprints — Spark Murmur3 vs DuckDB hash differ) get rows-only
driver checks plus property tests in tests/test_training_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_algorithms_spark.functions.text import words

from cdc_algorithms_spark.operators.dedup_docs import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from cdc_algorithms_spark.operators.multimodal import (
    extract_features,
    media_summary,
    sample_frames,
    synthesize_media,
)
from cdc_algorithms_spark.operators.similarity import brute_force_topk, lsh_topk
from cdc_algorithms_spark.operators.textstats import (
    LANG_MARKERS,
    language_id,
    quality_scores,
    token_counts,
)
from cdc_algorithms_spark.queries import register
from cdc_algorithms_spark.sources.registry import load_table

# Shared DuckDB building blocks ---------------------------------------------

_WORDS_CTE = r"""
w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS words
  FROM documents
)
"""


def _shingles_cte(n: int) -> str:
    return f"""
sh AS (
  SELECT DISTINCT doc_id, array_to_string(words[i:i+{n - 1}], ' ') AS shingle
  FROM w, UNNEST(range(1, greatest(len(words) - {n - 1}, 1) + 1)) AS t(i)
)
"""


# --- Exact dedup -----------------------------------------------------------

_EXACT_DEDUP_ORACLE = r"""
WITH keyed AS (
  SELECT doc_id,
         lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS key
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(MIN(doc_id) OVER (PARTITION BY key) AS BIGINT) AS canonical_id,
       CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS group_size
FROM keyed
"""


@register("exact_dedup_docs", _EXACT_DEDUP_ORACLE)
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, "documents", sf_dir))


# --- Exact n-gram Jaccard near-dup (inverted index join) -------------------

JACCARD_N = 3
JACCARD_THRESHOLD = 0.8

_JACCARD_ORACLE = f"""
WITH {_WORDS_CTE}, {_shingles_cte(JACCARD_N)},
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
s AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)
SELECT * FROM (
  SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
         ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
  FROM p JOIN s sa ON sa.doc_id = id_a JOIN s sb ON sb.doc_id = id_b
) WHERE jaccard >= {JACCARD_THRESHOLD}
"""


@register("ngram_jaccard_pairs", _JACCARD_ORACLE)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        load_table(spark, "documents", sf_dir, spread=True),
        n=JACCARD_N,
        threshold=JACCARD_THRESHOLD,
    )


# LSH band buckets larger than this are dropped before the self-join
# (dedup_docs._cap_band_buckets).  At 100 TB one boilerplate mega-cluster
# collapsing onto a single band hash would otherwise emit |bucket|^2
# candidates from one hot key; capped output is a proven subset of the
# uncapped run (test_training_ops.py pins both the subset property and
# this registered configuration).  At driver scale (sf<=0.1) every bucket
# is far below the cap, so results are identical with or without it.
LSH_MAX_BUCKET = 1000


@register("minhash_lsh_pairs", _JACCARD_ORACLE)
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, Jaccard-verified — checked against the
    EXACT n-gram Jaccard oracle: precision is exact by construction
    (candidates are re-verified with full shingle sets), and at this
    banding (32 hashes / 8 bands, rows=4) the per-pair miss probability
    is (1−J⁴)⁸ ≤ 1.6% at J=0.8 and falls fast above it — empirically
    zero missed pairs at sf0.001/0.01/0.1, and the driver's fixed corpus
    + fixed hash seeds make the result deterministic round-over-round.
    A genuine recall regression (banding bug, seed drift) fails this
    oracle loudly."""
    # spread REVERTED (r12): driver r11 measured 0.7->1.4 s and the
    # quiet-host isolated A/B agrees at 32c (off 0.78 vs on 1.12
    # min-of-5) — the banded-signature path's per-row work is too light
    # to amortize the exchange at this size (tools/ab_spread.py).
    return minhash_lsh_pairs(
        load_table(spark, "documents", sf_dir),
        n=JACCARD_N,
        num_hashes=32,
        bands=8,
        threshold=JACCARD_THRESHOLD,
        max_bucket=LSH_MAX_BUCKET,
    )


@register("simhash_pairs")
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spread KEPT on r12 re-adjudication (VERDICT r11 task 1 allowed
    keeping sites that win a quiet-host min-of-N A/B at BOTH core
    counts): 8c on 0.48 vs off 0.59, 32c wash 0.45 vs 0.46 min-of-5
    (tools/ab_spread.py; the driver's r11 0.5->0.6 was one 0.1 s
    quantization step)."""
    return simhash_pairs(load_table(spark, "documents", sf_dir, spread=True), max_hamming=3)


# --- Embedding near-dup + similarity search --------------------------------

COSINE_THRESHOLD = 0.4

_EMB_NEAR_DUP_ORACLE = f"""
SELECT * FROM (
  SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b,
         ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]), 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
) WHERE cosine >= {COSINE_THRESHOLD}
"""


@register("embedding_near_dup", _EMB_NEAR_DUP_ORACLE)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_near_dup_pairs(
        load_table(spark, "embeddings", sf_dir), threshold=COSINE_THRESHOLD
    )


ANN_K = 5
ANN_QUERIES = 8  # vec_id < 8 are the query set

_ANN_ORACLE = f"""
SELECT query_id, rank, vec_id, cosine FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                      c.embedding::DOUBLE[]), 6) AS cosine,
         CAST(ROW_NUMBER() OVER (
            PARTITION BY q.vec_id
            ORDER BY ROUND(list_cosine_similarity(q.embedding::DOUBLE[],
                                                  c.embedding::DOUBLE[]), 6) DESC,
                     c.vec_id) AS BIGINT) AS rank
  FROM embeddings q JOIN embeddings c ON q.vec_id < {ANN_QUERIES}
) WHERE rank <= {ANN_K}
"""


@register("ann_bruteforce_topk", _ANN_ORACLE)
def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < ANN_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(queries, emb, k=ANN_K)


@register("ann_lsh_topk")
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < ANN_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(queries, emb, k=ANN_K, dim=64, bits=4)


@register("ann_ivf_topk")
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-probed ANN (rows-only driver check; recall vs brute force
    is asserted in tests/test_training_ops.py)."""
    from cdc_algorithms_spark.operators.similarity import ivf_topk

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < ANN_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(queries, emb, k=ANN_K, dim=64, nlist=16, nprobe=4)


_KMEANS_K = 8

_EMB_CLUSTERS_ORACLE = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       TRUE AS n_clusters_ok,
       TRUE AS cells_in_range
FROM embeddings
"""


@register("embedding_clusters", _EMB_CLUSTERS_ORACLE)
def q_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic k-means grouping of the embedding corpus. Lloyd
    iterations aren't SQL-expressible, so the driver row checks the
    conservation invariants the clustering must satisfy: every corpus
    vector assigned to exactly one cell (``n_points`` recomputed
    independently by DuckDB), 1..k non-empty cells, and every emitted
    cell id within [1, k] (ids are 1-based, matching the IVF probe
    indexing) — a falsifiable bound on the assignment
    expression (a min(n_members) >= 1 check would be vacuous: empty
    cells emit no histogram row at all).
    The full (cluster, n_members, avg_sq_dist) histogram remains the
    operator's output (operators/similarity.py::embedding_clusters) and
    its inertia/membership behavior is pinned in
    tests/test_training_ops.py."""
    from cdc_algorithms_spark.operators.similarity import embedding_clusters

    emb = load_table(spark, "embeddings", sf_dir)
    clusters = embedding_clusters(emb, k=_KMEANS_K, dim=64, iters=3)
    return clusters.agg(
        F.sum("n_members").cast("long").alias("n_points"),
        ((F.count(F.lit(1)) >= 1) & (F.count(F.lit(1)) <= _KMEANS_K)).alias(
            "n_clusters_ok"
        ),
        ((F.min("cluster") >= 1) & (F.max("cluster") <= _KMEANS_K)).alias(
            "cells_in_range"
        ),
    )


@register("semantic_dedup_embeddings")
def q_semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup over the embedding corpus:
    k-means cells bound the quadratic work, then per-cell cosine prunes
    near-identical vectors (rows-only driver check — Lloyd iterations
    aren't SQL-expressible; planted-duplicate and determinism invariants
    are asserted in tests/test_training_ops.py)."""
    from cdc_algorithms_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, "embeddings", sf_dir)
    return semantic_dedup(emb, k=8, dim=64, threshold=0.95)


# --- Text analysis ---------------------------------------------------------

# lang marker hits: flat per-language aggregate, mirrored with list_filter
_LANG_HITS_ORACLE = f"""
WITH {_WORDS_CTE},
m(lang, markers) AS (VALUES {", ".join(
    "('" + lang + "', [" + ", ".join("'" + w + "'" for w in ms) + "])"
    for lang, ms in sorted(LANG_MARKERS.items())
)})
SELECT m.lang AS lang,
       CAST(COALESCE(SUM(len(list_filter(w.words, x -> list_contains(m.markers, x)))), 0)
            AS BIGINT) AS total_hits
FROM m CROSS JOIN w
GROUP BY m.lang
"""


@register("lang_marker_hits", _LANG_HITS_ORACLE)
def q_lang_marker_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.operators.textstats import lang_scores

    docs = load_table(spark, "documents", sf_dir)
    scores = lang_scores("text")
    per_doc = docs.select(
        *[scores[lang].alias(lang) for lang in sorted(scores)]
    )
    stacked = per_doc.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(lang).alias("lang"), F.col(lang).alias("hits"))
                    for lang in sorted(scores)
                ]
            )
        ).alias("s")
    )
    return stacked.groupBy(F.col("s.lang").alias("lang")).agg(
        F.sum("s.hits").cast("long").alias("total_hits")
    )


_LANGUAGE_ID_ORACLE = f"""
WITH {_WORDS_CTE},
m(lang, markers) AS (VALUES {", ".join(
    "('" + lang + "', [" + ", ".join("'" + w + "'" for w in ms) + "])"
    for lang, ms in sorted(LANG_MARKERS.items())
)}),
scores AS (
  SELECT w.doc_id, m.lang,
         len(list_filter(w.words, x -> list_contains(m.markers, x))) AS hits
  FROM w CROSS JOIN m
),
best AS (
  SELECT doc_id, lang, hits,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, lang) AS rn
  FROM scores
)
SELECT doc_id,
       CASE WHEN hits > 0 THEN lang ELSE 'und' END AS pred_lang,
       CAST(hits AS BIGINT) AS lang_hits
FROM best WHERE rn = 1
"""


@register("language_id", _LANGUAGE_ID_ORACLE)
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax-of-marker-hits language ID; ties break lexicographically
    (the Spark fold only replaces on strictly-greater hits, the oracle
    orders by hits DESC, lang ASC — same winner)."""
    return language_id(load_table(spark, "documents", sf_dir))


_QUALITY_ORACLE = r"""
WITH base AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS words,
         length(text) AS n_chars
  FROM documents
),
feat AS (
  SELECT doc_id, n_chars,
         len(words) AS n_words,
         length(regexp_replace(text, '\s+', '', 'g')) * 1.0 / len(words) AS mean_word_len,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / n_chars AS alpha_ratio,
         length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) * 1.0 / n_chars AS punct_ratio,
         len(list_filter(words, x -> list_contains(__ALL_STOP__, x))) * 1.0 / len(words) AS stop_ratio,
         len(list_distinct(words)) * 1.0 / len(words) AS distinct_ratio,
         least(n_chars / 200.0, 1.0) AS length_score
  FROM base
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_words AS BIGINT) AS n_words,
       ROUND(mean_word_len, 6) AS mean_word_len,
       ROUND(alpha_ratio, 6) AS alpha_ratio,
       ROUND(punct_ratio, 6) AS punct_ratio,
       ROUND(stop_ratio, 6) AS stop_ratio,
       ROUND(distinct_ratio, 6) AS distinct_ratio,
       ROUND(0.3 * length_score + 0.2 * alpha_ratio + 0.2 * distinct_ratio
             + 0.15 * least(stop_ratio * 5, 1.0)
             + 0.15 * (1 - least(punct_ratio * 10, 1.0)), 6) AS quality_score
FROM feat
""".replace(
    "__ALL_STOP__",
    "[" + ", ".join(
        "'" + w + "'" for ms in LANG_MARKERS.values() for w in ms
    ) + "]",
)


@register("quality_scores", _QUALITY_ORACLE)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scores(load_table(spark, "documents", sf_dir))


_TOKENS_ORACLE = r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x != ''))
            AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
            AS BIGINT) AS bpe_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS budget_tokens
FROM documents
"""


@register("token_counts", _TOKENS_ORACLE)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(load_table(spark, "documents", sf_dir))


@register("doc_fingerprints")
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check (opaque 64-bit hashes — no SQL oracle); the
    Arrow-vectorized path, ~7× the expression version (see
    operators/textstats.py::doc_fingerprints_fast)."""
    from cdc_algorithms_spark.operators.textstats import doc_fingerprints_fast

    return doc_fingerprints_fast(load_table(spark, "documents", sf_dir, spread=True))


# --- Multimodal plumbing ---------------------------------------------------

_MEDIA_SUMMARY_ORACLE = """
SELECT 'image' AS kind,
       CAST(COUNT(*) AS BIGINT) AS n_media,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       ROUND(AVG(length(text) % 640 + 16), 4) AS avg_width,
       ROUND(AVG(length(text) * 10), 4) AS avg_duration_ms
FROM documents
"""


@register("media_summary", _MEDIA_SUMMARY_ORACLE)
def q_media_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(load_table(spark, "documents", sf_dir))
    return media_summary(media)


_FRAME_COUNT_ORACLE = """
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(len(range(0, length(text), 256)) AS BIGINT) AS n_frames,
       CAST(octet_length(encode(text)) AS BIGINT) AS total_bytes
FROM documents
WHERE length(text) > 0  -- sample_frames emits no rows for empty payloads
"""


@register("media_frame_counts", _FRAME_COUNT_ORACLE)
def q_media_frame_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthesize_media(load_table(spark, "documents", sf_dir))
    frames = sample_frames(media, frame_bytes=256)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.sum(F.length("frame")).cast("long").alias("total_bytes"),
    )


@register("media_features")
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (feature values come from an Arrow UDF; the oracle-green
    `media_features_check` twin below carries the value proof). The window
    entry projects driver-canonicalizable columns ONLY — the raw
    array<float> features column breaks the harness' pandas sort
    (unhashable list), so it is folded to a deterministic per-row digest:
    features quantized to micro-units (exact for float32 values in [0,1])
    then xxhash64'd as a bigint array."""
    media = synthesize_media(load_table(spark, "documents", sf_dir))
    feats = extract_features(media)
    return feats.select(
        "media_id",
        F.size("features").cast("long").alias("n_dims"),
        F.xxhash64(
            F.expr(
                "transform(features, f -> CAST(ROUND(CAST(f AS DOUBLE) * 1000000) AS BIGINT))"
            )
        ).alias("features_digest"),
    )


# Invariant twin for the rows-only media_features (r04 pattern — e.g.
# semantic_dedup_check): the feature VALUES come from an Arrow UDF the
# oracle can't run, but the stub's definition (bucketed byte means / 255
# over np.array_split buckets) admits an EXACT independent audit: the
# bucket-size-weighted feature sum × 255 must reconstruct the payload's
# byte sum, which Spark recomputes WITHOUT the UDF (codepoint sum over
# the text — equal to the byte sum exactly on ASCII payloads, and docs
# failing the in-query ASCII guard simply drop out of that one flag).
_MEDIA_FEATURES_CHECK_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_media,
       CAST(COUNT(*) AS BIGINT) AS n_features,
       CAST(SUM(CASE WHEN length(text) = octet_length(encode(text))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_ascii_checked,
       TRUE AS dims_ok,
       TRUE AS values_bounded,
       TRUE AS byte_mean_consistent
FROM documents
"""


@register("media_features_check", _MEDIA_FEATURES_CHECK_ORACLE)
def q_media_features_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked invariants over extract_features' output: row
    parity with the media table (n_features counted through an id join,
    so dropped/duplicated/invented media_ids all move it), fixed dims,
    [0,1] bounds, and exact byte-sum reconstruction per payload (float32
    slack 0.5 absolute vs byte sums in the 10^4..10^6 range). The oracle
    recomputes the counts independently and demands every flag TRUE."""
    from cdc_algorithms_spark.operators.multimodal import FEATURE_DIM

    docs = load_table(spark, "documents", sf_dir)
    media = synthesize_media(docs)
    feats = extract_features(media)
    dim = FEATURE_DIM
    # independent byte statistics — straight off the text, never
    # through the featurizer UDF
    stats = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.length("text").alias("n"),
        F.expr(
            "CASE WHEN length(text) = 0 THEN 0D ELSE "
            "aggregate(sequence(1, length(text)), 0D, "
            "(acc, i) -> acc + ascii(substr(text, i, 1))) END"
        ).alias("byte_sum"),
        F.expr("length(text) = octet_length(encode(text, 'utf-8'))").alias(
            "is_ascii"
        ),
    )
    # np.array_split bucket b has size n div dim + 1 for b < n % dim,
    # else n div dim — so the weighted feature sum reconstructs the
    # byte mean decomposition exactly (up to float32 representation)
    recon = F.expr(
        f"aggregate(zip_with(features, sequence(0, {dim - 1}), "
        f"(f, b) -> CAST(f AS DOUBLE) * (CASE WHEN b < n % {dim} "
        f"THEN n DIV {dim} + 1 ELSE n DIV {dim} END)), 0D, "
        f"(acc, x) -> acc + x) * 255.0"
    )
    # LEFT join from feats: a featurizer row with an INVENTED media_id
    # must still be counted (moving n_features) and must fail the
    # consistency flag — an inner join would silently drop it and the
    # check would stay green on a corrupted-id regression
    per_row = feats.join(stats, "media_id", "left").select(
        (F.size("features") == dim).alias("__dims"),
        (
            (F.array_min("features") >= 0.0) & (F.array_max("features") <= 1.0)
        ).alias("__bounded"),
        F.when(F.col("n").isNull(), F.lit(False))
        .otherwise(~F.col("is_ascii") | (F.abs(recon - F.col("byte_sum")) < 0.5))
        .alias("__consistent"),
        F.coalesce("is_ascii", F.lit(False)).alias("is_ascii"),
    )
    flags = per_row.agg(
        F.count(F.lit(1)).cast("long").alias("n_features"),
        F.sum(F.when(F.col("is_ascii"), 1).otherwise(0))
        .cast("long")
        .alias("n_ascii_checked"),
        F.bool_and("__dims").alias("dims_ok"),
        F.bool_and("__bounded").alias("values_bounded"),
        F.bool_and("__consistent").alias("byte_mean_consistent"),
    )
    n_media = media.agg(F.count(F.lit(1)).cast("long").alias("n_media"))
    return n_media.crossJoin(F.broadcast(flags)).select(
        "n_media",
        "n_features",
        "n_ascii_checked",
        "dims_ok",
        "values_bounded",
        "byte_mean_consistent",
    )


# --- Media near-dup: multimodal content through the dedup machinery --------
#
# Perceptual-fingerprint LSH pairs and CDC chunk-overlap resemblance over
# binary payloads (operators/media_dedup.py). The chunk-overlap pairs
# query stays rows-only (AE cut positions aren't SQL-expressible, its
# oracle twin is the planted-clone check below); the PHASH family is
# fully oracle-backed since r12 — the blockhash fingerprint IS
# SQL-expressible (VERDICT r11 task 7): the payload is encode(text),
# byte i comes out of hex(blob) via a strpos nibble table, the NN
# resample is exact integer index arithmetic, and both the bucket and
# global means are integer sums divided by powers of two — exact dyadic
# rationals in double, so the strict > comparisons cannot be
# float-order sensitive and DuckDB reproduces numpy's bits EXACTLY
# (validated bit-for-bit at sf0.001/0.01/0.1). Bit 0 (value 2^63) is
# added as the int64 two's-complement MIN to match numpy's
# uint64->int64 view without overflow.

_PHASH_CTE = """
raw AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id,
         octet_length(encode(text)) AS n,
         hex(encode(text)) AS hx
  FROM documents
),
canon AS (
  SELECT media_id,
         CASE WHEN n = 0 THEN NULL ELSE
           list_transform(range(0, 256), i ->
             CAST((strpos('0123456789ABCDEF',
                          substr(hx, 2*least((i*n)//256, n-1)+1, 1))-1)*16
                + (strpos('0123456789ABCDEF',
                          substr(hx, 2*least((i*n)//256, n-1)+2, 1))-1)
                  AS DOUBLE))
         END AS c
  FROM raw
),
ph AS (
  SELECT media_id,
         CASE WHEN c IS NULL THEN CAST(0 AS BIGINT) ELSE
           CAST(list_sum(list_transform(range(1, 64), b ->
             CASE WHEN (c[4*b+1]+c[4*b+2]+c[4*b+3]+c[4*b+4])/4.0
                       > list_sum(c)/256.0
                  THEN CAST(1 AS BIGINT) << (63 - b) ELSE 0 END)) AS BIGINT)
           + CASE WHEN (c[1]+c[2]+c[3]+c[4])/4.0 > list_sum(c)/256.0
                  THEN CAST(-9223372036854775808 AS BIGINT)
                  ELSE CAST(0 AS BIGINT) END
         END AS phash
  FROM canon
)
"""

# The pair set equals ALL pairs at hamming <= 3: the Spark side's 4x16
# banding is pigeonhole-COMPLETE for hamming < 4, so the band join is
# an optimization, never a filter — DuckDB can verify with the plain
# quadratic form (oracle-side O(n^2) is the accepted pattern, see
# embedding_near_dup).
_MEDIA_PHASH_PAIRS_ORACLE = f"""
WITH {_PHASH_CTE}
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM ph a JOIN ph b ON a.media_id < b.media_id
WHERE bit_count(xor(a.phash, b.phash)) <= 3
"""

_MEDIA_PHASH_GROUPS_ORACLE = f"""
WITH {_PHASH_CTE},
g AS (
  SELECT phash, MIN(media_id) AS canonical_id,
         CAST(COUNT(*) AS BIGINT) AS group_size
  FROM ph GROUP BY phash
)
SELECT ph.media_id, g.canonical_id, g.group_size
FROM ph JOIN g USING (phash)
"""

_MEDIA_CLONE_EXACT_OFFSET = 1 << 40
_MEDIA_CLONE_RESIZED_OFFSET = 1 << 41


@register("media_phash_pairs", _MEDIA_PHASH_PAIRS_ORACLE)
def q_media_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed since r12 (the blockhash bits ARE SQL-expressible —
    see _PHASH_CTE; media_phash_clone_check remains the planted-clone
    invariant twin). Banded 4×16 pigeonhole join — never an all-pairs
    product; the oracle verifies with the quadratic form, which the
    pigeonhole completeness theorem makes set-equal."""
    from cdc_algorithms_spark.operators.media_dedup import (
        media_fingerprint_pairs,
    )

    media = synthesize_media(load_table(spark, "documents", sf_dir))
    return media_fingerprint_pairs(media, max_hamming=3)


_MEDIA_PHASH_CLONE_ORACLE = """
SELECT CAST(SUM(CASE WHEN doc_id % 13 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exact_clones,
       CAST(0 AS BIGINT) AS n_exact_missing,
       CAST(0 AS BIGINT) AS n_exact_nonzero_hamming,
       CAST(SUM(CASE WHEN doc_id % 13 = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_resized_clones,
       CAST(0 AS BIGINT) AS n_resized_missing,
       CAST(0 AS BIGINT) AS n_resized_nonzero_hamming
FROM documents
"""


@register("media_phash_clone_check", _MEDIA_PHASH_CLONE_ORACLE)
def q_media_phash_clone_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle conversion for media_phash_pairs: the corpus is extended
    with BYTE-IDENTICAL clones (doc_id %13==1, +2^40) and STUB-RESIZED
    clones (doc_id %13==2, +2^41, via resize_media's 64×64
    nearest-neighbor stub); both clone families MUST pair with their
    original at hamming EXACTLY 0 — byte-identical trivially, resized by
    the exact NN-composition invariance theorem (media_dedup.py). DuckDB
    independently counts the planted clones; a missing or
    nonzero-hamming pair flags any id-dependence, nondeterminism, or
    banding-recall bug."""
    from cdc_algorithms_spark.operators.media_dedup import (
        media_fingerprint_pairs,
    )
    from cdc_algorithms_spark.operators.multimodal import resize_media

    media = synthesize_media(load_table(spark, "documents", sf_dir))
    exact_clones = media.where(F.col("media_id") % 13 == 1).withColumn(
        "media_id", F.col("media_id") + F.lit(_MEDIA_CLONE_EXACT_OFFSET)
    )
    resized_clones = resize_media(
        media.where(F.col("media_id") % 13 == 2)
    ).withColumn(
        "media_id", F.col("media_id") + F.lit(_MEDIA_CLONE_RESIZED_OFFSET)
    )
    corpus = media.unionByName(exact_clones).unionByName(resized_clones)
    pairs = media_fingerprint_pairs(corpus, max_hamming=3)

    def clone_stats(mod: int, offset: int, tag: str) -> DataFrame:
        expected = media.where(F.col("media_id") % 13 == mod).select(
            F.col("media_id").alias("id_a"),
            (F.col("media_id") + F.lit(offset)).alias("id_b"),
        )
        got = expected.join(pairs, ["id_a", "id_b"], "left")
        return got.agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{tag}_clones"),
            F.sum(F.col("hamming").isNull().cast("long"))
            .cast("long")
            .alias(f"n_{tag}_missing"),
            F.sum((F.coalesce(F.col("hamming"), F.lit(0)) != 0).cast("long"))
            .cast("long")
            .alias(f"n_{tag}_nonzero_hamming"),
        )

    return clone_stats(1, _MEDIA_CLONE_EXACT_OFFSET, "exact").crossJoin(
        clone_stats(2, _MEDIA_CLONE_RESIZED_OFFSET, "resized")
    )


@register("media_phash_dup_groups", _MEDIA_PHASH_GROUPS_ORACLE)
def q_media_phash_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-backed since r12 (see _PHASH_CTE;
    media_phash_group_clone_check remains the planted-clone twin). The
    SCALE-SAFE duplicate output: linear groups, not quadratic pairs — a
    boilerplate media cluster of m yields m rows."""
    from cdc_algorithms_spark.operators.media_dedup import (
        media_phash_duplicate_groups,
    )

    media = synthesize_media(load_table(spark, "documents", sf_dir))
    return media_phash_duplicate_groups(media)


_MEDIA_GROUP_CLONE_ORACLE = """
SELECT CAST(SUM(CASE WHEN doc_id % 13 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exact_clones,
       CAST(0 AS BIGINT) AS n_exact_misgrouped,
       CAST(SUM(CASE WHEN doc_id % 13 = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_resized_clones,
       CAST(0 AS BIGINT) AS n_resized_misgrouped
FROM documents
"""


@register("media_phash_group_clone_check", _MEDIA_GROUP_CLONE_ORACLE)
def q_media_phash_group_clone_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Oracle conversion for media_phash_dup_groups: every planted
    byte-identical clone (%13==1, +2^40) and stub-resized clone
    (%13==2, +2^41) must land in ITS ORIGINAL'S group (same
    canonical_id) — both mathematical: identical bytes fingerprint
    identically, and the stub resize is exactly fingerprint-invariant
    (NN-composition theorem). DuckDB independently counts the planted
    clones; any grouping split shows as a misgrouped count."""
    from cdc_algorithms_spark.operators.media_dedup import (
        media_phash_duplicate_groups,
    )
    from cdc_algorithms_spark.operators.multimodal import resize_media

    media = synthesize_media(load_table(spark, "documents", sf_dir))
    exact_clones = media.where(F.col("media_id") % 13 == 1).withColumn(
        "media_id", F.col("media_id") + F.lit(_MEDIA_CLONE_EXACT_OFFSET)
    )
    resized_clones = resize_media(
        media.where(F.col("media_id") % 13 == 2)
    ).withColumn(
        "media_id", F.col("media_id") + F.lit(_MEDIA_CLONE_RESIZED_OFFSET)
    )
    groups = media_phash_duplicate_groups(
        media.unionByName(exact_clones).unionByName(resized_clones)
    ).select("media_id", "canonical_id")

    def stats(mod: int, offset: int, tag: str) -> DataFrame:
        expected = media.where(F.col("media_id") % 13 == mod).select(
            F.col("media_id").alias("base_id"),
            (F.col("media_id") + F.lit(offset)).alias("clone_id"),
        )
        gb = groups.withColumnRenamed("media_id", "base_id").withColumnRenamed(
            "canonical_id", "base_canon"
        )
        gc_ = groups.withColumnRenamed(
            "media_id", "clone_id"
        ).withColumnRenamed("canonical_id", "clone_canon")
        j = expected.join(gb, "base_id", "left").join(gc_, "clone_id", "left")
        return j.agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{tag}_clones"),
            F.sum(
                (
                    F.col("base_canon").isNull()
                    | F.col("clone_canon").isNull()
                    | (F.col("base_canon") != F.col("clone_canon"))
                ).cast("long")
            )
            .cast("long")
            .alias(f"n_{tag}_misgrouped"),
        )

    return stats(1, _MEDIA_CLONE_EXACT_OFFSET, "exact").crossJoin(
        stats(2, _MEDIA_CLONE_RESIZED_OFFSET, "resized")
    )


# One streamed media fingerprint store per (session, corpus dir) — the
# build (seed fingerprints + two streamed clone epochs + a mid-stream
# compaction) happens once; every call after re-aggregates the durable
# pair store, same contract as the BM25/Jaccard stream caches.
_MEDIA_STREAM_CACHE: dict[tuple[str, str], "DataFrame"] = {}


@register("streaming_media_phash_index", _MEDIA_PHASH_CLONE_ORACLE)
def q_streaming_media_phash_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media perceptual near-dup through a STREAM-MAINTAINED fingerprint
    store (streaming/media_index.py): the store seeds on the full media
    corpus, then the BYTE-IDENTICAL clones (%13==1, +2^40) and the
    STUB-RESIZED clones (%13==2, +2^41) arrive as two foreachBatch
    epochs — each batch fingerprints once, probes the persisted store,
    emits its pairs, extends the store (with a mid-stream manifest-
    guarded compaction after the first epoch). Because a pair is found
    exactly when its later side arrives, the converged pair set contains
    every (original, clone) pair at hamming EXACTLY 0 — the SAME
    planted-clone oracle as the batch media_phash_clone_check, shared
    verbatim (the NN-composition invariance theorem makes the resized
    family mathematical too)."""
    from cdc_algorithms_spark.operators.multimodal import resize_media
    from cdc_algorithms_spark.streaming.media_index import (
        run_streaming_media_phash_index,
    )

    media = synthesize_media(load_table(spark, "documents", sf_dir))
    key = (spark.sparkContext.applicationId, sf_dir)
    pairs = _MEDIA_STREAM_CACHE.get(key)
    if pairs is None:
        import tempfile

        exact_clones = media.where(F.col("media_id") % 13 == 1).withColumn(
            "media_id", F.col("media_id") + F.lit(_MEDIA_CLONE_EXACT_OFFSET)
        )
        resized_clones = resize_media(
            media.where(F.col("media_id") % 13 == 2)
        ).withColumn(
            "media_id", F.col("media_id") + F.lit(_MEDIA_CLONE_RESIZED_OFFSET)
        )
        work = tempfile.mkdtemp(prefix="cdc_media_stream_")
        pairs = run_streaming_media_phash_index(
            spark, media, [exact_clones, resized_clones], work,
            max_hamming=3, compact_after={0},
        )
        _MEDIA_STREAM_CACHE.clear()
        _MEDIA_STREAM_CACHE[key] = pairs

    def clone_stats(mod: int, offset: int, tag: str) -> DataFrame:
        expected = media.where(F.col("media_id") % 13 == mod).select(
            F.col("media_id").alias("id_a"),
            (F.col("media_id") + F.lit(offset)).alias("id_b"),
        )
        got = expected.join(pairs, ["id_a", "id_b"], "left")
        return got.agg(
            F.count(F.lit(1)).cast("long").alias(f"n_{tag}_clones"),
            F.sum(F.col("hamming").isNull().cast("long"))
            .cast("long")
            .alias(f"n_{tag}_missing"),
            F.sum((F.coalesce(F.col("hamming"), F.lit(0)) != 0).cast("long"))
            .cast("long")
            .alias(f"n_{tag}_nonzero_hamming"),
        )

    return clone_stats(1, _MEDIA_CLONE_EXACT_OFFSET, "exact").crossJoin(
        clone_stats(2, _MEDIA_CLONE_RESIZED_OFFSET, "resized")
    )


@register("media_chunk_overlap_pairs")
def q_media_chunk_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (AE cut positions aren't SQL-expressible; the oracle
    conversion is media_chunk_overlap_clone_check). CDC chunk-set Broder
    resemblance over raw binary payloads — only 8-byte chunk identities
    leave the scan-side UDF."""
    from cdc_algorithms_spark.operators.media_dedup import (
        media_chunk_overlap_pairs,
    )

    media = synthesize_media(load_table(spark, "documents", sf_dir))
    return media_chunk_overlap_pairs(media, "ae", 320, threshold=0.3)


_MEDIA_OVERLAP_CLONE_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_clone_pairs,
       CAST(0 AS BIGINT) AS n_clone_pairs_missing,
       CAST(0 AS BIGINT) AS n_clone_pairs_inexact
FROM documents WHERE doc_id % 13 = 1 AND length(text) > 0
"""


@register("media_chunk_overlap_clone_check", _MEDIA_OVERLAP_CLONE_ORACLE)
def q_media_chunk_overlap_clone_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Oracle conversion for media_chunk_overlap_pairs: AE cuts are a
    pure function of payload BYTES, so planted byte-identical media
    clones (doc_id %13==1, +2^40, nonempty payloads — empty payloads
    chunk to nothing and have no chunk-set resemblance) MUST pair with
    chunk-set jaccard EXACTLY 1.0. DuckDB independently counts the
    planted clones."""
    from cdc_algorithms_spark.operators.media_dedup import (
        media_chunk_overlap_pairs,
    )

    media = synthesize_media(load_table(spark, "documents", sf_dir))
    clones = media.where(F.col("media_id") % 13 == 1).withColumn(
        "media_id", F.col("media_id") + F.lit(_MEDIA_CLONE_EXACT_OFFSET)
    )
    ov = media_chunk_overlap_pairs(
        media.unionByName(clones), "ae", 320, threshold=0.3
    )
    expected = media.where(
        (F.col("media_id") % 13 == 1) & (F.length("content") > 0)
    ).select(
        F.col("media_id").alias("id_a"),
        (F.col("media_id") + F.lit(_MEDIA_CLONE_EXACT_OFFSET)).alias("id_b"),
    )
    got = expected.join(ov, ["id_a", "id_b"], "left").select("id_a", "jaccard")
    return got.agg(
        F.count(F.lit(1)).cast("long").alias("n_clone_pairs"),
        F.sum(F.col("jaccard").isNull().cast("long"))
        .cast("long")
        .alias("n_clone_pairs_missing"),
        F.sum(
            (F.coalesce(F.abs(F.col("jaccard") - 1.0), F.lit(0.0)) > 1e-9).cast(
                "long"
            )
        )
        .cast("long")
        .alias("n_clone_pairs_inexact"),
    )


# One stream-maintained media chunk-key index per (session, corpus dir)
# — the build (seed + two streamed extension epochs + one mid-stream
# compaction) happens once; every call after probes the durable store.
_MEDIA_CHUNK_STREAM_CACHE: dict[tuple[str, str], str] = {}


@register("streaming_media_chunk_index", _MEDIA_OVERLAP_CLONE_ORACLE)
def q_streaming_media_chunk_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CDC chunk-overlap resemblance through a STREAM-MAINTAINED durable
    chunk-key index (streaming/media_chunk_index.py): the index seeds on
    the media_id %3 != 0 two-thirds, the %3 == 0 third arrives as two
    foreachBatch epochs (chunked once, scan-side; only 8-byte keys land,
    bucket-partitioned), with a mid-stream compaction folding the first
    epoch. Planted byte-identical clones (+2^40) of every %13==1
    nonempty payload then PROBE the live store — AE cuts are a pure
    function of bytes, so each clone must pair with its original at
    chunk-set jaccard EXACTLY 1.0, whichever epoch the original arrived
    in. Shares the batch media_chunk_overlap_clone_check oracle
    VERBATIM (exact verification, no approximation tier)."""
    from cdc_algorithms_spark.streaming.media_chunk_index import (
        incremental_media_chunk_pairs,
        run_streaming_media_chunk_index,
    )

    media = synthesize_media(load_table(spark, "documents", sf_dir))
    key = (spark.sparkContext.applicationId, sf_dir)
    path = _MEDIA_CHUNK_STREAM_CACHE.get(key)
    if path is None:
        import tempfile

        seed = media.where(F.col("media_id") % 3 != 0)
        stages = [
            media.where(
                (F.col("media_id") % 3 == 0) & (F.col("media_id") % 2 == par)
            )
            for par in (0, 1)
        ]
        path = tempfile.mkdtemp(prefix="cdc_mediachunk_stream_") + "/index"
        run_streaming_media_chunk_index(
            spark, seed, stages, path, algo="ae", expected_size=320,
            threshold=0.3,
        )
        _MEDIA_CHUNK_STREAM_CACHE.clear()
        _MEDIA_CHUNK_STREAM_CACHE[key] = path
    clones = media.where(F.col("media_id") % 13 == 1).withColumn(
        "media_id", F.col("media_id") + F.lit(_MEDIA_CLONE_EXACT_OFFSET)
    )
    ov = incremental_media_chunk_pairs(
        spark, path, clones, algo="ae", expected_size=320, threshold=0.3
    )
    expected = media.where(
        (F.col("media_id") % 13 == 1) & (F.length("content") > 0)
    ).select(
        F.col("media_id").alias("id_a"),
        (F.col("media_id") + F.lit(_MEDIA_CLONE_EXACT_OFFSET)).alias("id_b"),
    )
    got = expected.join(ov, ["id_a", "id_b"], "left").select("id_a", "jaccard")
    return got.agg(
        F.count(F.lit(1)).cast("long").alias("n_clone_pairs"),
        F.sum(F.col("jaccard").isNull().cast("long"))
        .cast("long")
        .alias("n_clone_pairs_missing"),
        F.sum(
            (F.coalesce(F.abs(F.col("jaccard") - 1.0), F.lit(0.0)) > 1e-9).cast(
                "long"
            )
        )
        .cast("long")
        .alias("n_clone_pairs_inexact"),
    )


# --- ANN quality metrics (recall vs exact top-k) ---------------------------


def _ann_recall(
    spark: SparkSession, sf_dir: str, approx_fn, floor: float
) -> DataFrame:
    """recall@k of an ANN method against brute-force cosine top-k, as a
    1-row metrics frame — the quality dial that justifies the approximate
    path at 100 TB. Joins are on (query_id, vec_id): every ANN hit is a
    real corpus vector, so recall = |approx ∩ exact| / |exact|.

    The hash-seeded recall VALUE isn't SQL-reproducible, so the driver
    row carries it as ``recall_ok`` (recall ≥ ``floor``) next to the
    DuckDB-recomputed ``n_exact``: the oracle independently builds the
    brute-force top-k (so a wrong exact side fails ``n_exact``) and
    asserts the floor held (so a recall collapse fails ``recall_ok``).
    The raw recall number stays pinned in tests/test_training_ops.py.
    """
    from cdc_algorithms_spark.operators.similarity import brute_force_topk

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < ANN_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # persist: the brute-force top-k (the expensive O(|Q|·|C|) subtree)
    # feeds BOTH the semi-join and the n_exact aggregate — without it the
    # two physical branches each run the full scoring pass
    exact = (
        brute_force_topk(queries, emb, k=ANN_K)
        .select("query_id", "vec_id")
        .persist()
    )
    approx = approx_fn(queries, emb).select("query_id", "vec_id")
    hits = exact.join(approx, ["query_id", "vec_id"], "left_semi")
    return exact.agg(F.count(F.lit(1)).alias("n_exact")).crossJoin(
        hits.agg(F.count(F.lit(1)).alias("n_hit"))
    ).select(
        F.lit(ANN_K).cast("long").alias("k"),
        F.lit(ANN_QUERIES).cast("long").alias("n_queries"),
        F.col("n_exact").cast("long").alias("n_exact"),
        F.lit(floor).cast("double").alias("recall_floor"),
        (F.round(F.col("n_hit") / F.col("n_exact"), 4) >= floor).alias(
            "recall_ok"
        ),
    )


def _ann_recall_oracle(floor: float) -> str:
    return f"""
SELECT CAST({ANN_K} AS BIGINT) AS k,
       CAST({ANN_QUERIES} AS BIGINT) AS n_queries,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST({floor} AS DOUBLE) AS recall_floor,
       TRUE AS recall_ok
FROM ({_ANN_ORACLE})
"""


ANN_LSH_RECALL_FLOOR = 0.3
ANN_IVF_RECALL_FLOOR = 0.5


@register("ann_lsh_recall", _ann_recall_oracle(ANN_LSH_RECALL_FLOOR))
def q_ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of hyperplane-LSH ANN vs DuckDB-recomputed brute-force
    top-k; measured recall ≈0.40–0.45 at sf0.001–0.1, floor 0.3."""
    from cdc_algorithms_spark.operators.similarity import lsh_topk

    return _ann_recall(
        spark,
        sf_dir,
        lambda q, e: lsh_topk(q, e, k=ANN_K, dim=64, bits=4),
        ANN_LSH_RECALL_FLOOR,
    )


@register("ann_ivf_recall", _ann_recall_oracle(ANN_IVF_RECALL_FLOOR))
def q_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of IVF cell-probed ANN vs DuckDB-recomputed brute-force
    top-k; measured recall ≈0.60–0.65 at sf0.001–0.1, floor 0.5."""
    from cdc_algorithms_spark.operators.similarity import ivf_topk

    return _ann_recall(
        spark,
        sf_dir,
        lambda q, e: ivf_topk(q, e, k=ANN_K, dim=64, nlist=16, nprobe=4),
        ANN_IVF_RECALL_FLOOR,
    )


ANN_PQ_RECALL_FLOOR = 0.5

# One DURABLE IVF-PQ index per (session, corpus dir) — same contract as
# _JACCARD_INDEX_CACHE below: training + encoding are the written-ONCE
# side of the standing-ANN-service shape (similarity.py::write_pq_index);
# every call after the first measures the TRAINING-FREE probe, which is
# the operator's cost model. Keyed on applicationId so a new session
# never trusts another's temp dir.
_PQ_INDEX_CACHE: dict[tuple[str, str], str] = {}


def pq_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Durable IVF-PQ index over ``sf_dir``'s embeddings, built once per
    (session, corpus) — shared by every indexed-ANN query (and the
    indexed hybrid-retrieval leg in queries_retrieval.py) so a session
    pays the train+encode exactly once."""
    import tempfile

    from cdc_algorithms_spark.operators.similarity import write_pq_index

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _PQ_INDEX_CACHE.get(key)
    if path is None:
        emb = load_table(spark, "embeddings", sf_dir)
        path = tempfile.mkdtemp(prefix="cdc_pq_index_")
        write_pq_index(emb, path, dim=64, m=8, ksub=16, nlist=16)
        _PQ_INDEX_CACHE.clear()
        _PQ_INDEX_CACHE[key] = path
    return path


@register("ann_pq_recall", _ann_recall_oracle(ANN_PQ_RECALL_FLOOR))
def q_ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of IVF-PQ ANN through the DURABLE-index path
    (operators/similarity.py::write_pq_index → read_pq_index →
    pq_topk_indexed): the model (coarse centroids + PQ codebooks) and
    the cell-partitioned (vec_id, cell, code) frame are persisted ONCE
    per (session, corpus); each probe is training-free — no Lloyd, no
    corpus encode — reading only the probed cells' partition
    directories (plan-pinned in tests/test_plans.py) plus candidate-
    proportional vectors for the exact re-rank. Results are
    bit-identical to the inline pq_topk with the same train params, so
    the measured recall is unchanged: ≈0.63–0.68 at sf0.001–0.01,
    floor 0.5; oracle = DuckDB-recomputed brute-force top-k."""
    from cdc_algorithms_spark.operators.similarity import (
        pq_topk_indexed,
        read_pq_index,
    )

    index = read_pq_index(spark, pq_index_path(spark, sf_dir))

    return _ann_recall(
        spark,
        sf_dir,
        lambda q, e: pq_topk_indexed(q, index, e, k=ANN_K, nprobe=6, rerank=6),
        ANN_PQ_RECALL_FLOOR,
    )


# One streamed PQ index per (session, corpus dir) — the build (seed
# train + two streamed extension epochs) happens once; every call after
# probes the durable store, same contract as _PQ_INDEX_CACHE.
_PQ_STREAM_CACHE: dict[tuple[str, str], str] = {}


@register("streaming_pq_index", _ann_recall_oracle(ANN_PQ_RECALL_FLOOR))
def q_streaming_pq_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k through a STREAM-MAINTAINED durable IVF-PQ index
    (streaming/ann_index.py): the model trains once on a 2/3 seed
    corpus, the remaining third arrives as two foreachBatch epochs that
    are ENCODED with the frozen model and appended as cell-partitioned
    deltas (operators/similarity.py::extend_pq_index) — no Lloyd, no
    corpus re-read per batch. The probe then answers against seed ∪
    streamed (base + delta scans, same static cell pruning). Encoding
    is a pure function of the frozen model, so the streamed index is
    bit-identical to a one-shot encode (pinned in
    tests/test_ann_streaming.py); measured recall 0.62–0.67 at
    sf0.001–0.01 (model saw only the seed), floor 0.5; oracle = DuckDB
    -recomputed brute-force top-k over the FULL corpus."""
    import tempfile

    from cdc_algorithms_spark.operators.similarity import (
        pq_topk_indexed,
        read_pq_index,
    )
    from cdc_algorithms_spark.streaming.ann_index import (
        run_streaming_pq_index,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _PQ_STREAM_CACHE.get(key)
    if path is None:
        emb = load_table(spark, "embeddings", sf_dir)
        seed = emb.where(F.col("vec_id") % 3 != 0)
        stages = [
            emb.where(
                (F.col("vec_id") % 3 == 0) & (F.col("vec_id") % 2 == par)
            ).select("vec_id", "embedding")
            for par in (0, 1)
        ]
        path = tempfile.mkdtemp(prefix="cdc_pq_stream_") + "/index"
        run_streaming_pq_index(spark, seed, stages, path)
        _PQ_STREAM_CACHE.clear()
        _PQ_STREAM_CACHE[key] = path
    index = read_pq_index(spark, path)

    return _ann_recall(
        spark,
        sf_dir,
        lambda q, e: pq_topk_indexed(q, index, e, k=ANN_K, nprobe=6, rerank=6),
        ANN_PQ_RECALL_FLOOR,
    )


# One rebuilt PQ index per (session, corpus dir): the erode→rebuild
# lifecycle runs once; every later call probes the REBUILT durable
# store, same written-once contract as _PQ_INDEX_CACHE.
_PQ_REBUILD_CACHE: dict[tuple[str, str], str] = {}


@register("ann_pq_rebuild_check", _ann_recall_oracle(ANN_PQ_RECALL_FLOOR))
def q_ann_pq_rebuild_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codebook-drift REFRESH, verified end-to-end
    (operators/similarity.py::rebuild_pq_index — the verb the r07
    decay contract documented but didn't execute): the model trains on
    a genuinely SHIFTED seed (clusters 0–4 only), the other half of
    the corpus (clusters 5–9 — geometry the codebooks never saw)
    arrives encode-only via extend_pq_index, recall erodes (measured
    and pinned in tests/test_ann_streaming.py), then rebuild_pq_index
    retrains on the full corpus, re-encodes every code, and swaps the
    index rename-first. This query probes the REBUILT durable store:
    recall is back over the standard 0.5 floor — the same guarantee a
    never-drifted index gives — proving the refresh restored the
    model, subsumed the deltas, and conserved the corpus (n_exact is
    DuckDB-recomputed). The ANN seam rule: re-derive the model from
    data instead of trusting stale codebooks."""
    import tempfile

    from cdc_algorithms_spark.operators.similarity import (
        extend_pq_index,
        pq_topk_indexed,
        read_pq_index,
        rebuild_pq_index,
        write_pq_index,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _PQ_REBUILD_CACHE.get(key)
    if path is None:
        emb = load_table(spark, "embeddings", sf_dir)
        path = tempfile.mkdtemp(prefix="cdc_pq_rebuild_") + "/index"
        # sweep-sized model geometry (m=4/nlist=8/iters=2, rerank=10
        # below): the verdict is a threshold crossing — erode, rebuild,
        # recall back over the floor — not PQ fidelity; the smaller
        # model runs the lifecycle in ~1/3 the Lloyd jobs (r09 task:
        # this entry was 101 s of the sweep) and the rebuilt store's
        # measured recall is 0.60–0.63 vs the 0.5 floor
        write_pq_index(
            emb.where(F.col("label") < 5), path, dim=64, m=4, ksub=16,
            nlist=8, iters=2,
        )
        extend_pq_index(
            spark, path,
            emb.where(F.col("label") >= 5).select("vec_id", "embedding"),
            epoch=0,
        )
        rebuild_pq_index(spark, path, emb, iters=2)
        _PQ_REBUILD_CACHE.clear()
        _PQ_REBUILD_CACHE[key] = path
    index = read_pq_index(spark, path)

    return _ann_recall(
        spark,
        sf_dir,
        lambda q, e: pq_topk_indexed(
            q, index, e, k=ANN_K, nprobe=6, rerank=10
        ),
        ANN_PQ_RECALL_FLOOR,
    )


# One drift-lifecycle run per (session, corpus dir): the detect→decide→
# execute loop mutates its store, so the three lifecycle verdicts are
# computed once and cached; the counts are re-derived from the table on
# every call (so the oracle compare stays a real comparison).
_PQ_DRIFT_CACHE: dict[tuple[str, str], tuple[bool, bool, bool]] = {}

# Fresh-vs-seed mean quantized error ratio that triggers the rebuild in
# the check below: 1.05e6 ppm = 5% worse than training data. Measured
# ratio for the label≥5 half under label<5 codebooks: ≈1.21e6 at sf0.01
# (comfortably above; a fresh build reports no evidence at all).
ANN_DRIFT_MAX_PPM = 1_050_000

_ANN_DRIFT_ORACLE = """
SELECT CAST((SELECT COUNT(*) FROM embeddings WHERE label < 5) AS BIGINT)
         AS n_seed,
       CAST((SELECT COUNT(*) FROM embeddings WHERE label >= 5) AS BIGINT)
         AS n_new,
       TRUE AS fresh_has_no_evidence,
       TRUE AS drift_flagged,
       TRUE AS rebuilt_has_no_evidence
"""


@register("ann_drift_check", _ANN_DRIFT_ORACLE)
def q_ann_drift_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DETECT half of the ANN maintenance loop, closed end-to-end
    (operators/similarity.py::pq_drift_report →
    rebuild_pq_index_if_drifted — the analogue of layout_drift_report →
    zorder_relayout): the model trains on clusters 0–4 only; the fresh
    store's drift report carries ZERO streamed evidence; clusters 5–9
    (geometry the codebooks never saw) arrive encode-only via
    extend_pq_index and the integer-exact drift statistic (ppm ratio of
    mean quantized reconstruction error, new vs seed — DECIMAL(38,0)
    cross-multiplication, no float division) flags them against the 5%
    threshold; the policy verb rebuilds; the rebuilt store reports zero
    evidence again. (The verb's SECOND trigger — occupancy collapse for
    tight shifted clusters whose error DEFLATES — is pinned in
    tests/test_ann_streaming.py and measured in
    tools/ann_rebuild_scale_run.py.) The oracle recomputes both
    population counts and pins all three lifecycle verdicts TRUE."""
    from cdc_algorithms_spark.operators.similarity import (
        extend_pq_index,
        pq_drift_report,
        rebuild_pq_index_if_drifted,
        write_pq_index,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    verdicts = _PQ_DRIFT_CACHE.get(key)
    if verdicts is None:
        import tempfile

        path = tempfile.mkdtemp(prefix="cdc_pq_drift_") + "/index"
        # sweep-sized model geometry (m=4/nlist=8/iters=1): the three
        # verdicts are threshold crossings (evidence-free fresh store,
        # drift flag, evidence-free rebuilt store) with no recall
        # dependence at all, and they hold identically under the small
        # model at ~1/3 the Lloyd jobs (r09 task: this entry was 97 s
        # of the sweep)
        write_pq_index(
            emb.where(F.col("label") < 5), path, dim=64, m=4, ksub=16,
            nlist=8, iters=1,
        )
        fresh_clean = (
            pq_drift_report(spark, path)
            .agg(F.sum("n_new").alias("nn"))
            .collect()[0]["nn"]
            == 0
        )
        extend_pq_index(
            spark, path,
            emb.where(F.col("label") >= 5).select("vec_id", "embedding"),
            epoch=0,
        )
        flagged = rebuild_pq_index_if_drifted(
            spark, path, emb, max_ppm=ANN_DRIFT_MAX_PPM, iters=1
        )
        rebuilt_clean = (
            pq_drift_report(spark, path)
            .agg(F.sum("n_new").alias("nn"))
            .collect()[0]["nn"]
            == 0
        )
        verdicts = (bool(fresh_clean), bool(flagged), bool(rebuilt_clean))
        _PQ_DRIFT_CACHE.clear()
        _PQ_DRIFT_CACHE[key] = verdicts
    fresh_clean, flagged, rebuilt_clean = verdicts
    return emb.agg(
        F.sum(F.when(F.col("label") < 5, 1).otherwise(0))
        .cast("long")
        .alias("n_seed"),
        F.sum(F.when(F.col("label") >= 5, 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
    ).select(
        "n_seed",
        "n_new",
        F.lit(fresh_clean).alias("fresh_has_no_evidence"),
        F.lit(flagged).alias("drift_flagged"),
        F.lit(rebuilt_clean).alias("rebuilt_has_no_evidence"),
    )


# --- UDTF surface: chunking as a SQL lateral table function ----------------

_UDTF_CHUNKS_ORACLE = """
SELECT d.doc_id AS src_id,
       CAST(u.off / 64 AS BIGINT) AS chunk_idx,
       CAST(u.off AS BIGINT) AS "offset",
       CAST(LEAST(64, d.n_chars - u.off) AS BIGINT) AS length,
       substring(d.text, CAST(u.off + 1 AS INT), 64) AS chunk_text
FROM documents d, UNNEST(range(0, d.n_chars, 64)) AS u(off)
"""


@register("udtf_fixed_chunks", _UDTF_CHUNKS_ORACLE)
def q_udtf_fixed_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed chunking through the Python UDTF + SQL LATERAL front-end
    (functions/udtfs.py) — same rows as the pure-SQL fixed_chunks query,
    value-checked against the same DuckDB oracle. Row-at-a-time Python:
    the API-parity path, not the scale path."""
    from cdc_algorithms_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id AS src_id, c.chunk_idx, c.offset, c.length, c.chunk_text
        FROM __udtf_docs d, LATERAL chunk_fixed(d.text, 64) c
        """
    )


# --- Dedup groups: connected components over the near-dup pair graph -------

# Shared pair-graph + transitive-closure CTE block (requires the w/sh
# CTEs in scope and WITH RECURSIVE). The threshold filter uses the SAME
# round-to-6 form as _JACCARD_ORACLE / Spark's _verify_pairs — an
# unrounded filter would disagree with the Spark side for pairs whose
# exact Jaccard sits within 5e-7 below the threshold (unreachable on
# the driver fixtures, reachable at production shingle counts).
_COMPONENTS_CTE = f"""
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
s AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT id_a, id_b
  FROM p JOIN s sa ON sa.doc_id = id_a JOIN s sb ON sb.doc_id = id_b
  WHERE ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 6)
        >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(node, seen) AS (
  SELECT src, src FROM edges
  UNION
  SELECT r.node, e.dst FROM reach r JOIN edges e ON r.seen = e.src
)
"""

_COMPONENTS_ORACLE = f"""
WITH RECURSIVE {_WORDS_CTE}, {_shingles_cte(JACCARD_N)},{_COMPONENTS_CTE}
SELECT CAST(node AS BIGINT) AS doc_id,
       CAST(MIN(seen) AS BIGINT) AS component_id
FROM reach GROUP BY node
"""


@register("dedup_components", _COMPONENTS_ORACLE)
def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup groups: connected components (iterative min-label
    propagation) over the exact Jaccard pair graph, value-checked
    against a DuckDB recursive-CTE transitive closure. The closure is
    O(n·edges) and only viable oracle-side; the Spark side is the
    O(diameter)-round join loop that scales."""
    from cdc_algorithms_spark.operators.dedup_docs import connected_components

    pairs = ngram_jaccard_pairs(
        load_table(spark, "documents", sf_dir, spread=True),
        n=JACCARD_N,
        threshold=JACCARD_THRESHOLD,
    )
    return connected_components(pairs)


# --- Stratified sampling (deterministic, per-language proportional) --------

_SAMPLE_FRAC = 0.1

_STRATIFIED_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
FROM ranked WHERE rn <= CEIL({_SAMPLE_FRAC} * n)
"""


@register("stratified_sample_docs", _STRATIFIED_ORACLE)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: exactly ceil(frac·n) docs per
    language, chosen by doc_id rank — reproducible across runs and
    engines, unlike Bernoulli ``sample()`` (whose draw depends on
    partitioning). The per-language rank is the count-form
    ``bounded_running_sum`` (operators/prefix.py), NOT a whole-language
    ``row_number`` window — at corpus scale a single language is a
    multi-GB single-task sort, while the two-phase form bounds every
    window partition to ~``bucket`` doc-ids. Stratum counts join back
    via broadcast (one row per language). At corpus scale swap the rank
    key for ``xxhash64(doc_id)`` to decorrelate the pick from ingestion
    order while staying deterministic."""
    from cdc_algorithms_spark.operators.prefix import bounded_running_sum

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "lang")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    ranked = bounded_running_sum(
        docs.withColumn("__one", F.lit(1)),
        ["lang"],
        "doc_id",
        "__one",
        bucket=4096,
        out_col="rn",
    )
    return (
        ranked.join(F.broadcast(counts), "lang")
        .where(F.col("rn") <= F.ceil(_SAMPLE_FRAC * F.col("n")))
        .select(F.col("doc_id").cast("long").alias("doc_id"), "lang")
    )


# --- TF-IDF: top terms per language ----------------------------------------

_TFIDF_K = 10

_TFIDF_ORACLE = f"""
WITH {_WORDS_CTE},
tokens AS (
  SELECT d.lang, lower(u.word) AS term, d.doc_id
  FROM w JOIN documents d USING (doc_id), UNNEST(w.words) AS u(word)
),
tf AS (
  SELECT lang, term, COUNT(*) AS tf FROM tokens GROUP BY 1, 2
),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tokens GROUP BY 1
),
n_docs AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.lang, tf.term,
         ROUND(tf.tf * ln(n.n * 1.0 / df.df), 6) AS tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY tf.lang ORDER BY tf.tf * ln(n.n * 1.0 / df.df) DESC, tf.term
         ) AS rank
  FROM tf JOIN df USING (term) CROSS JOIN n_docs n
)
SELECT lang, CAST(rank AS BIGINT) AS rank, term, tfidf
FROM scored WHERE rank <= {_TFIDF_K}
"""


@register("tfidf_top_terms", _TFIDF_ORACLE)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TF-IDF terms per language. One explode of the corpus is
    pre-aggregated to a (doc_id, lang, term, tf) frame — per-document
    distinct terms, far smaller than the raw token stream — and THAT is
    what persists and feeds both the per-(lang, term) TF rollup and the
    per-term document frequency (rows are unique on (doc_id, term), so
    df is a plain count, no countDistinct). The tf↔df join on ``term``
    carries NO broadcast hint: the vocabulary is corpus-sized at scale
    (billions of distinct terms would OOM a forced driver broadcast),
    so AQE picks shuffle-vs-broadcast from actual sizes. Only the 1-row
    global doc count rides an explicit broadcast cross join. Top-k per
    stratum is the rank window + ``rank <= k`` filter, which Catalyst
    rewrites with partial ``WindowGroupLimit``: every input partition
    keeps only its local top-k per language BEFORE the exchange, so the
    final per-language sort sees ≤ k·partitions rows, never the whole
    vocabulary (pinned in test_plans.py)."""
    docs = load_table(spark, "documents", sf_dir)
    doc_term = (
        docs.select("doc_id", "lang", F.explode(words("text")).alias("word"))
        .select("doc_id", "lang", F.lower("word").alias("term"))
        .groupBy("doc_id", "lang", "term")
        .agg(F.count(F.lit(1)).alias("tf_dt"))
        .persist()
    )
    tf = doc_term.groupBy("lang", "term").agg(F.sum("tf_dt").alias("tf"))
    # (doc_id, term) is unique in doc_term, so document frequency is a
    # plain count — no countDistinct shuffle-dedup needed.
    df = doc_term.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * F.log(F.col("n") / F.col("df")))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _TFIDF_K)
        .select("lang", "rank", "term", F.round("score", 6).alias("tfidf"))
    )


_RESIZE_ORACLE = """
SELECT 'image' AS kind,
       CAST(COUNT(*) AS BIGINT) AS n_media,
       CAST(COUNT(*) * 4096 AS BIGINT) AS total_bytes,
       ROUND(AVG(64), 4) AS avg_width,
       ROUND(AVG(CAST(n_chars AS DOUBLE) * 10), 4) AS avg_duration_ms
FROM documents
"""


@register("media_resized_summary", _RESIZE_ORACLE)
def q_media_resized_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize pipeline end-to-end: synthesize → resize (stubbed decode,
    real mapInPandas plumbing) → metadata rollup. The byte accounting is
    exact — every resized payload is width*height bytes — so even with
    the decode stubbed the oracle pins the full pipeline's row count,
    byte totals, and metadata rewrite."""
    from cdc_algorithms_spark.operators.multimodal import (
        media_summary,
        resize_media,
        synthesize_media,
    )

    media = synthesize_media(load_table(spark, "documents", sf_dir))
    return media_summary(resize_media(media, 64, 64))


# --- Chunk-overlap resemblance (Broder resemblance over chunk sets) --------
#
# The reference's chunk-hash dedup set (ae.rs:75-84) lifted to per-document
# sets: near-dup docs share content-defined chunks. The fixed-chunk variant
# is fully SQL-expressible (oracle-checked); the AE variant is the
# shift-robust CDC formulation (rows-only driver check — the AE boundary
# rule is not SQL-expressible).

CHUNK_OVERLAP_SIZE = 32
CHUNK_OVERLAP_THRESHOLD = 0.5

_CHUNK_OVERLAP_ORACLE = f"""
WITH s AS (
  SELECT DISTINCT d.doc_id,
         substring(d.text, CAST(u.off + 1 AS INT), {CHUNK_OVERLAP_SIZE}) AS ck
  FROM documents d,
       UNNEST(range(0, d.n_chars, {CHUNK_OVERLAP_SIZE})) AS u(off)
),
sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
  FROM s a JOIN s b ON a.ck = b.ck AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
       CAST(shared AS BIGINT) AS shared,
       ROUND(shared * 1.0 / (za.n + zb.n - shared), 6) AS jaccard
FROM p JOIN sz za ON za.doc_id = id_a JOIN sz zb ON zb.doc_id = id_b
WHERE shared * 1.0 / (za.n + zb.n - shared) >= {CHUNK_OVERLAP_THRESHOLD}
"""


@register("chunk_overlap_pairs_fixed", _CHUNK_OVERLAP_ORACLE)
def q_chunk_overlap_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.operators.chunking import fixed_chunks
    from cdc_algorithms_spark.operators.dedup_docs import chunk_overlap_pairs

    docs = load_table(spark, "documents", sf_dir)
    return chunk_overlap_pairs(
        fixed_chunks(docs, CHUNK_OVERLAP_SIZE),
        threshold=CHUNK_OVERLAP_THRESHOLD,
    )


@register("chunk_overlap_pairs_ae")
def q_chunk_overlap_ae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only by construction (AE cut positions aren't
    SQL-expressible); the operator's contract is oracle-checked by
    chunk_overlap_ae_clone_check below."""
    from cdc_algorithms_spark.operators.chunking import cdc_chunks
    from cdc_algorithms_spark.operators.dedup_docs import chunk_overlap_pairs

    docs = load_table(spark, "documents", sf_dir)
    # AE expected=320 is the documents-scale config (see CDC_PARAMS note
    # in queries.py: the reference window formula needs expected > 256).
    return chunk_overlap_pairs(
        cdc_chunks(docs, "ae", 320),
        threshold=0.3,
    )


# Clone-id offset far above any generator doc_id (same constant as
# queries_diff's doc_table_diff — see the collision note there).
_CLONE_OFFSET = 1 << 40

_OVERLAP_AE_CLONE_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_clone_pairs,
       CAST(0 AS BIGINT) AS n_clone_pairs_missing,
       CAST(0 AS BIGINT) AS n_clone_pairs_inexact
FROM documents WHERE doc_id % 13 = 1
"""


@register("chunk_overlap_ae_clone_check", _OVERLAP_AE_CLONE_ORACLE)
def q_chunk_overlap_ae_clone_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle conversion for chunk_overlap_pairs_ae: AE cuts are a
    pure function of document BYTES, so a corpus extended with verbatim
    clones (doc_id %13==1, id+2^40) must emit every (original, clone)
    pair with chunk-set jaccard EXACTLY 1.0 — a mathematical guarantee,
    not an empirical one. DuckDB independently counts the planted
    clones; any id-dependence, nondeterminism, or partition-dependence
    in the chunker, and any identity/jaccard bug in
    chunk_overlap_pairs, surfaces as a missing or inexact clone pair."""
    from cdc_algorithms_spark.operators.chunking import cdc_chunks
    from cdc_algorithms_spark.operators.dedup_docs import chunk_overlap_pairs

    docs = load_table(spark, "documents", sf_dir)
    clones = docs.where(F.col("doc_id") % 13 == 1).withColumn(
        "doc_id", F.col("doc_id") + F.lit(_CLONE_OFFSET)
    )
    ov = chunk_overlap_pairs(
        cdc_chunks(docs.unionByName(clones), "ae", 320), threshold=0.3
    )
    expected = docs.where(F.col("doc_id") % 13 == 1).select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") + F.lit(_CLONE_OFFSET)).alias("id_b"),
    )
    got = expected.join(ov, ["id_a", "id_b"], "left").select("id_a", "jaccard")
    return got.agg(
        F.count(F.lit(1)).cast("long").alias("n_clone_pairs"),
        F.sum(F.col("jaccard").isNull().cast("long"))
        .cast("long")
        .alias("n_clone_pairs_missing"),
        F.sum(
            (F.coalesce(F.abs(F.col("jaccard") - 1.0), F.lit(0.0)) > 1e-9).cast("long")
        )
        .cast("long")
        .alias("n_clone_pairs_inexact"),
    )


# --- Gopher-style repetition filters ---------------------------------------

_REPETITION_ORACLE = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS words
  FROM documents
),
g AS (
  SELECT doc_id, CAST(ns.n AS INT) AS n,
         CASE WHEN len(words) <= ns.n THEN array_to_string(words, ' ')
              ELSE array_to_string(words[i.i:i.i+ns.n-1], ' ') END AS g
  FROM w, (VALUES (2), (5)) AS ns(n),
       UNNEST(range(1, greatest(len(words) - ns.n + 1, 1) + 1)) AS i(i)
),
c AS (SELECT doc_id, n, g, COUNT(*) AS cnt FROM g GROUP BY 1, 2, 3)
SELECT CAST(doc_id AS BIGINT) AS doc_id, n,
       CAST(SUM(cnt) AS BIGINT) AS total_ngrams,
       ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS top_frac,
       ROUND(CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS DOUBLE)
             / SUM(cnt), 6) AS dup_frac
FROM c GROUP BY 1, 2
"""


@register("repetition_ratios", _REPETITION_ORACLE)
def q_repetition_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.operators.textstats import repetition_ratios

    return repetition_ratios(load_table(spark, "documents", sf_dir, spread=True), ns=(2, 5))


# --- end-to-end curation pipeline ------------------------------------------
# The composite flow a training-data pipeline actually runs, as ONE
# oracle-checked query: quality-filter → exact-dedup → per-language
# token-budget selection → corpus accounting. Every stage is the
# engine's own operator; the DuckDB oracle replays the identical
# semantics, so the value check covers the COMPOSITION, not just the
# parts. Deterministic by construction: the budget pick is a running
# sum over doc_id order (no Bernoulli sampling, no partition-dependent
# draws).

_CURATION_CAP = 5_000  # token budget per language

_CURATION_ORACLE = r"""
WITH base AS (
  SELECT doc_id, lang, text,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS words,
         length(text) AS n_chars
  FROM documents
),
feat AS (
  SELECT doc_id, lang, text,
         ROUND(0.3 * least(n_chars / 200.0, 1.0)
               + 0.2 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / n_chars)
               + 0.2 * (len(list_distinct(words)) * 1.0 / len(words))
               + 0.15 * least(len(list_filter(words, x -> list_contains(__ALL_STOP__, x))) * 5.0 / len(words), 1.0)
               + 0.15 * (1 - least(length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) * 10.0 / n_chars, 1.0)),
               6) AS quality_score
  FROM base
),
kept AS (SELECT doc_id, lang, text FROM feat WHERE quality_score >= 0.5),
dedup AS (
  SELECT doc_id, lang, text,
         ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM kept
),
budget AS (
  SELECT doc_id, lang, CAST(ceil(length(text) / 4.0) AS BIGINT) AS toks
  FROM dedup WHERE rn = 1
),
cum AS (
  SELECT lang, toks,
         SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id) AS running
  FROM budget
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
       CAST(SUM(toks) AS BIGINT) AS tokens_kept
FROM cum WHERE running <= __CAP__
GROUP BY lang
""".replace(
    "__ALL_STOP__",
    "[" + ", ".join(
        "'" + w + "'" for ms in LANG_MARKERS.values() for w in ms
    ) + "]",
).replace("__CAP__", str(_CURATION_CAP))


# Docs per prefix-sum bucket: bounds every running-sum window partition to
# ``_CURATION_BUCKET`` rows regardless of corpus size (pick ~sqrt(N/langs)
# at scale so the per-bucket offsets frame and the in-bucket windows are
# both bounded).
_CURATION_BUCKET = 1024


@register("curation_pipeline", _CURATION_ORACLE)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation: quality filter → exact dedup → per-language
    token budget. Both formerly-degenerate stages are restructured for
    the 100 TB posture:

    * dedup is aggregate+join (groupBy(text).min(doc_id), then a semi
      join on the well-distributed doc_id) — never a text-keyed window,
      which would pin every copy of a hot duplicate on one task
      (COVERAGE.md skew policy; same shape as
      operators/dedup_docs.py::exact_dedup).
    * the per-language running sum is a two-phase prefix sum: bounded
      per-(lang, bucket) partial sums, cumulative offsets computed on
      the tiny aggregated frame, broadcast back, local running sum
      within each bounded bucket — no whole-language single-task window.

    spread REVERTED (r12): driver r11 measured 0.7->1.0 s and the
    quiet-host isolated A/B is a wash at BOTH core counts (32c on 0.86
    vs off 0.85, 8c 0.65 vs 0.66 min-of-5, tools/ab_spread.py) — the
    exchange buys nothing here.
    """
    docs = load_table(spark, "documents", sf_dir)
    good_ids = (
        quality_scores(docs)
        .where(F.col("quality_score") >= 0.5)
        .select("doc_id")
    )
    kept = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "text"
    ).join(good_ids, "doc_id")

    # Exact dedup, survivor = lowest doc_id. Map-side partial aggregation
    # collapses duplicate texts before the shuffle; the semi join runs on
    # doc_id, so no text bytes move after the aggregate.
    canonical = kept.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    unique = kept.join(canonical.select("doc_id"), "doc_id", "left_semi").select(
        "doc_id",
        "lang",
        F.ceil(F.length("text") / 4.0).cast("long").alias("toks"),
    )

    # Two-phase prefix sum over doc_id order (operators/prefix.py): the
    # frame feeds both the bases lineage and the final running sum, so
    # persist it — metadata-only rows (doc_id, lang, toks), never
    # document text.
    from cdc_algorithms_spark.operators.prefix import bounded_running_sum

    running = bounded_running_sum(
        unique.persist(), ["lang"], "doc_id", "toks", bucket=_CURATION_BUCKET
    )
    return (
        running.where(F.col("running") <= _CURATION_CAP)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_kept"),
            F.sum("toks").cast("long").alias("tokens_kept"),
        )
    )


# --- benchmark decontamination ----------------------------------------------
# Train-set hygiene before an LLM run: flag training docs sharing word
# n-grams with an evaluation set. The fixture's "benchmark" is the
# deterministic doc_id % 17 == 0 slice; everything else is "train".

DECONTAM_N = 5
_DECONTAM_MOD = 17

_DECONTAM_ORACLE = f"""
WITH {_WORDS_CTE}, {_shingles_cte(DECONTAM_N)},
tr AS (SELECT * FROM sh WHERE doc_id % {_DECONTAM_MOD} <> 0),
be AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {_DECONTAM_MOD} = 0),
tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM tr GROUP BY doc_id),
hit AS (
  SELECT doc_id, COUNT(*) AS n_shared
  FROM tr JOIN be USING (shingle) GROUP BY doc_id
)
SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
       CAST(t.n_shingles AS BIGINT) AS n_shingles,
       CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared,
       ROUND(COALESCE(h.n_shared, 0) * 1.0 / t.n_shingles, 6) AS overlap_frac
FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
"""


@register("benchmark_decontamination", _DECONTAM_ORACLE)
def q_benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.operators.dedup_docs import decontaminate

    docs = load_table(spark, "documents", sf_dir, spread=True)
    bench = docs.where(F.col("doc_id") % _DECONTAM_MOD == 0)
    train = docs.where(F.col("doc_id") % _DECONTAM_MOD != 0)
    return decontaminate(train, bench, n=DECONTAM_N)


# --- training-data mixture planning -----------------------------------------
# Weighted per-source token budgets → deterministic document selection
# (operators/mixture.py). Fixture weights: src0..src7 get 1%..8% of a
# 10k-token budget (allocation-capped); src8 gets 50% (availability-
# capped); the rest weight 0 (report availability, select nothing).

_MIX_TOTAL = 10_000
_MIX_WEIGHTS = {f"src{i}": (i + 1) / 100 for i in range(8)} | {"src8": 0.5}

_MIXTURE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(ceil(length(text) / 4.0) AS BIGINT) AS toks
  FROM documents
  WHERE length(text) > 0
),
w(source, weight) AS (VALUES {", ".join(f"('{s}', {w})" for s, w in sorted(_MIX_WEIGHTS.items()))}),
avail AS (
  SELECT source, CAST(SUM(toks) AS BIGINT) AS available_tokens
  FROM toks GROUP BY source
),
alloc AS (
  -- full outer: weighted-but-absent sources report availability 0
  SELECT COALESCE(a.source, w.source) AS source,
         CAST(COALESCE(w.weight, 0.0) AS DOUBLE) AS weight,
         CAST(COALESCE(a.available_tokens, 0) AS BIGINT) AS available_tokens,
         LEAST(COALESCE(a.available_tokens, 0),
               CAST(FLOOR({_MIX_TOTAL} * COALESCE(w.weight, 0.0)) AS BIGINT))
           AS allocated_tokens
  FROM avail a FULL OUTER JOIN w ON a.source = w.source
),
run AS (
  SELECT source, toks,
         SUM(toks) OVER (PARTITION BY source ORDER BY doc_id) AS running
  FROM toks
),
sel AS (
  SELECT r.source,
         CAST(SUM(r.toks) AS BIGINT) AS tokens_selected,
         CAST(COUNT(*) AS BIGINT) AS n_docs_selected
  FROM run r JOIN alloc USING (source)
  WHERE r.running <= alloc.allocated_tokens
  GROUP BY r.source
)
SELECT a.source, a.weight, a.available_tokens, a.allocated_tokens,
       CAST(COALESCE(s.tokens_selected, 0) AS BIGINT) AS tokens_selected,
       CAST(COALESCE(s.n_docs_selected, 0) AS BIGINT) AS n_docs_selected
FROM alloc a LEFT JOIN sel s USING (source)
"""


@register("mixture_plan_by_source", _MIXTURE_ORACLE)
def q_mixture_plan_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.operators.mixture import mixture_plan

    docs = load_table(spark, "documents", sf_dir)
    return mixture_plan(docs, _MIX_WEIGHTS, _MIX_TOTAL)


_TEMP_ALPHA = 0.5

_TEMP_MIX_ORACLE = f"""
WITH avail AS (
  SELECT source,
         CAST(SUM(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT)
           AS available_tokens
  FROM documents WHERE length(text) > 0 GROUP BY source
),
p AS (
  SELECT source, available_tokens,
         POWER(CAST(available_tokens AS DOUBLE), {_TEMP_ALPHA}) AS pw
  FROM avail
),
n AS (SELECT SUM(pw) AS norm FROM p)
SELECT p.source, p.available_tokens,
       ROUND(p.pw / n.norm, 6) AS weight,
       CAST(FLOOR(ROUND({_MIX_TOTAL} * p.pw / n.norm, 6)) AS BIGINT)
         AS allocated_tokens,
       ROUND(FLOOR(ROUND({_MIX_TOTAL} * p.pw / n.norm, 6))
             / p.available_tokens, 6) AS epochs
FROM p CROSS JOIN n
"""


@register("mixture_temperature_weights", _TEMP_MIX_ORACLE)
def q_mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling weights (weight ∝ tokens^alpha) derived from
    corpus statistics — the up-sampling rule for imbalanced sources;
    epochs > 1 marks the sources an alpha-flattened mixture repeats
    (operators/mixture.py::temperature_weights)."""
    from cdc_algorithms_spark.operators.mixture import temperature_weights

    docs = load_table(spark, "documents", sf_dir)
    return temperature_weights(docs, _TEMP_ALPHA, _MIX_TOTAL)


# --- bigram language-model perplexity scoring -------------------------------
# The statistical tier of quality scoring: a word-bigram MLE model trained
# on the corpus itself, each document scored by its mean ln-probability.
# Fully SQL-expressible (explode → two count aggregates → join → avg), so
# the oracle checks the whole train+score composition.

_LM_BIGRAM_ORACLE = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x != '') AS words
  FROM documents
),
bi AS (
  SELECT doc_id, words[i] AS w1, words[i + 1] AS w2
  FROM w, UNNEST(range(1, len(words))) AS t(i)
  WHERE len(words) >= 2
),
bc AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY 1, 2),
uc AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY 1)
SELECT CAST(bi.doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(ln(c2 * 1.0 / c1)), 6) AS avg_logprob
FROM bi JOIN bc USING (w1, w2) JOIN uc USING (w1)
GROUP BY bi.doc_id
"""


@register("lm_bigram_scores", _LM_BIGRAM_ORACLE)
def q_lm_bigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.operators.textstats import lm_bigram_scores

    return lm_bigram_scores(load_table(spark, "documents", sf_dir))


# --- character-entropy scoring ----------------------------------------------
# Both tails are curation signals: near-0 = template spam, near-ceiling =
# ciphertext/compressed junk. Pure explode + two aggregates, no UDF.

_CHAR_ENTROPY_ORACLE = r"""
WITH ch AS (
  SELECT doc_id, length(text) AS n_chars, substring(text, CAST(i AS INT), 1) AS ch
  FROM documents, UNNEST(range(1, length(text) + 1)) AS t(i)
  WHERE length(text) > 0
),
freq AS (SELECT doc_id, n_chars, ch, COUNT(*) AS cnt FROM ch GROUP BY 1, 2, 3)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(MAX(n_chars) AS BIGINT) AS n_chars,
       CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
       ROUND(-SUM((cnt * 1.0 / n_chars) * log2(cnt * 1.0 / n_chars)), 6)
         AS entropy_bits
FROM freq GROUP BY doc_id
"""


@register("char_entropy_scores", _CHAR_ENTROPY_ORACLE)
def q_char_entropy_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.operators.textstats import char_entropy_scores

    return char_entropy_scores(load_table(spark, "documents", sf_dir))


# --- dedup cluster representatives ------------------------------------------
# Turning dedup groups into an actionable keep/drop list: per near-dup
# component, keep the highest-quality member (ties to the smallest
# doc_id) — the selection policy a curation pipeline applies after
# clustering. Oracle replays components (recursive closure) + the exact
# quality formula + arg-max.

_CLUSTER_REPS_ORACLE = (
    _COMPONENTS_ORACLE.replace(
        "SELECT CAST(node AS BIGINT) AS doc_id,\n"
        "       CAST(MIN(seen) AS BIGINT) AS component_id\n"
        "FROM reach GROUP BY node",
        """,
comp AS (
  SELECT node AS doc_id, MIN(seen) AS component_id FROM reach GROUP BY node
),
q AS (
  SELECT d.doc_id,
         ROUND(0.3 * least(length(d.text) / 200.0, 1.0)
               + 0.2 * (length(regexp_replace(d.text, '[^A-Za-z]', '', 'g')) * 1.0 / length(d.text))
               + 0.2 * (len(list_distinct(w.words)) * 1.0 / len(w.words))
               + 0.15 * least(len(list_filter(w.words, x -> list_contains(__ALL_STOP__, x))) * 5.0 / len(w.words), 1.0)
               + 0.15 * (1 - least(length(regexp_replace(d.text, '[^.,;:!?''"()]', '', 'g')) * 10.0 / length(d.text), 1.0)),
               6) AS quality_score
  FROM documents d JOIN w ON w.doc_id = d.doc_id
)
SELECT CAST(c.component_id AS BIGINT) AS component_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST((ARRAY_AGG(c.doc_id ORDER BY q.quality_score DESC, c.doc_id ASC))[1] AS BIGINT) AS rep_doc_id,
       ROUND(MAX(q.quality_score), 6) AS rep_quality
FROM comp c JOIN q ON q.doc_id = c.doc_id
GROUP BY c.component_id""",
    )
).replace(
    "__ALL_STOP__",
    "[" + ", ".join("'" + w + "'" for ms in LANG_MARKERS.values() for w in ms) + "]",
)


@register("dedup_cluster_reps", _CLUSTER_REPS_ORACLE)
def q_dedup_cluster_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.operators.dedup_docs import connected_components

    # spread REVERTED (r12): driver r11 measured 1.7->1.9 s and the
    # quiet-host isolated A/B has spread losing slightly at both core
    # counts (32c 1.49 vs 1.43, 8c 1.32 vs 1.31 min-of-5,
    # tools/ab_spread.py) — the CC loop dominates; the extra exchange
    # only costs.
    docs = load_table(spark, "documents", sf_dir)
    comp = connected_components(
        ngram_jaccard_pairs(docs, n=JACCARD_N, threshold=JACCARD_THRESHOLD)
    )
    q = quality_scores(docs).select("doc_id", "quality_score")
    return (
        comp.join(q, "doc_id")
        .groupBy("component_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max_by(
                "doc_id", F.struct(F.col("quality_score"), -F.col("doc_id"))
            )
            .cast("long")
            .alias("rep_doc_id"),
            F.round(F.max("quality_score"), 6).alias("rep_quality"),
        )
        .select(
            F.col("component_id").cast("long").alias("component_id"),
            "n_members",
            "rep_doc_id",
            "rep_quality",
        )
    )


# --- PII scrubbing ----------------------------------------------------------
# The fixtures carry no PII, so the query scrubs a deterministic
# PII-bearing augmentation of each document (same construction in the
# oracle) — the redaction itself is what the value-hash checks.

_PII_AUG_SQL = (
    "concat(text, ' contact user', doc_id, '@example.com from 10.0.', "
    "doc_id % 256, '.7 tel +1415550', lpad(CAST(doc_id % 1000 AS VARCHAR), 4, '0'))"
)

_PII_ORACLE = rf"""
WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS text FROM documents)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '\b(?:\d{{1,3}}\.){{3}}\d{{1,3}}\b')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(text, '\+\d{{9,15}}')) AS BIGINT) AS n_phones,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
           '\b(?:\d{{1,3}}\.){{3}}\d{{1,3}}\b', '<IP>', 'g'),
         '\+\d{{9,15}}', '<PHONE>', 'g') AS redacted_text
FROM aug
"""


@register("pii_scrub_docs", _PII_ORACLE)
def q_pii_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.operators.textstats import pii_scrub

    docs = load_table(spark, "documents", sf_dir)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@example.com from 10.0."),
            F.col("doc_id") % 256,
            F.lit(".7 tel +1415550"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return pii_scrub(aug)


# --- quantile-band quality filtering ---------------------------------------
# Keep each language's middle quality band (p10..p90). The scalable
# shape: one percentile AGGREGATE per language (exact, sort-based
# partial agg) broadcast back as thresholds — never a global-order
# percent_rank window, which would funnel the corpus through one
# partition.

_QUALITY_BAND_ORACLE = (
    """
WITH base AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS words,
         length(text) AS n_chars, text
  FROM documents
),
q AS (
  SELECT doc_id, lang,
         ROUND(0.3 * least(n_chars / 200.0, 1.0)
               + 0.2 * (length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / n_chars)
               + 0.2 * (len(list_distinct(words)) * 1.0 / len(words))
               + 0.15 * least(len(list_filter(words, x -> list_contains(__ALL_STOP__, x))) * 5.0 / len(words), 1.0)
               + 0.15 * (1 - least(length(regexp_replace(text, '[^.,;:!?''"()]', '', 'g')) * 10.0 / n_chars, 1.0)),
               6) AS quality_score
  FROM base
),
t AS (
  SELECT lang,
         quantile_cont(quality_score, 0.1) AS p10,
         quantile_cont(quality_score, 0.9) AS p90
  FROM q GROUP BY lang
)
SELECT CAST(q.doc_id AS BIGINT) AS doc_id, q.lang, q.quality_score
FROM q JOIN t ON q.lang = t.lang
WHERE q.quality_score >= t.p10 AND q.quality_score <= t.p90
"""
).replace(
    "__ALL_STOP__",
    "[" + ", ".join("'" + w + "'" for ms in LANG_MARKERS.values() for w in ms) + "]",
)


@register("quality_band_by_lang", _QUALITY_BAND_ORACLE)
def q_quality_band_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spread KEPT on r12 re-adjudication: quiet-host min-of-5 A/B wins
    at BOTH core counts (32c on 0.64 vs off 0.80, 8c 0.63 vs 0.80 —
    tools/ab_spread.py), the criterion VERDICT r11 task 1 set; the
    driver's 0.9->1.0 was one 0.1 s quantization step."""
    docs = load_table(spark, "documents", sf_dir, spread=True)
    scored = quality_scores(docs).select("doc_id", "quality_score").join(
        docs.select(F.col("doc_id").cast("long").alias("doc_id"), "lang"), "doc_id"
    )
    thresholds = scored.groupBy("lang").agg(
        F.percentile("quality_score", F.lit(0.1)).alias("p10"),
        F.percentile("quality_score", F.lit(0.9)).alias("p90"),
    )
    return (
        scored.join(F.broadcast(thresholds), "lang")
        .where(
            (F.col("quality_score") >= F.col("p10"))
            & (F.col("quality_score") <= F.col("p90"))
        )
        .select("doc_id", "lang", "quality_score")
    )


# --- sequence packing --------------------------------------------------------
# Concat-and-split packing of the token stream into fixed-length training
# sequences (operators/packing.py): per-sequence doc/token/boundary
# accounting. The running token offset is the bounded two-phase prefix
# sum — no whole-corpus single-task window — and the oracle replays the
# identical packing arithmetic.

_SEQ_LEN = 512

_PACKING_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, CAST(ceil(length(text) / 4.0) AS BIGINT) AS toks
  FROM documents WHERE length(text) > 0
),
run AS (
  SELECT doc_id, toks, SUM(toks) OVER (ORDER BY doc_id) AS running FROM toks
),
spans AS (
  SELECT doc_id, toks, running - toks AS tok_start,
         CAST(FLOOR((running - toks) / {_SEQ_LEN}) AS BIGINT) AS first_seq,
         CAST(FLOOR((running - 1) / {_SEQ_LEN}) AS BIGINT) AS last_seq
  FROM run
),
per AS (
  SELECT u.seq_id,
         LEAST(s.tok_start + s.toks, (u.seq_id + 1) * {_SEQ_LEN})
           - GREATEST(s.tok_start, u.seq_id * {_SEQ_LEN}) AS overlap,
         CASE WHEN u.seq_id < s.last_seq THEN 1 ELSE 0 END AS straddles
  FROM spans s, UNNEST(range(s.first_seq, s.last_seq + 1)) AS u(seq_id)
)
SELECT CAST(seq_id AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(overlap) AS BIGINT) AS n_tokens,
       CAST(SUM(straddles) AS BIGINT) AS n_boundary_docs,
       ROUND(SUM(overlap) * 1.0 / {_SEQ_LEN}, 6) AS fill_frac
FROM per GROUP BY seq_id
"""


@register("sequence_packing_plan", _PACKING_ORACLE)
def q_sequence_packing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.operators.packing import sequence_packing

    return sequence_packing(load_table(spark, "documents", sf_dir), _SEQ_LEN)


# --- text cleaning -----------------------------------------------------------
# The normalization pass ahead of scoring/dedup: strip control chars,
# collapse whitespace runs, trim (operators/textstats.py::clean_text).
# Map-only codegen regexes; character classes are enumerated identically
# on both engines (Java vs RE2 shorthand classes differ).

_CLEAN_ORACLE = r"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(length(text) AS BIGINT) AS raw_len,
       CAST(length(cleaned) AS BIGINT) AS clean_len,
       CAST(length(text) - length(cleaned) AS BIGINT) AS n_removed,
       cleaned AS clean_text
FROM (
  -- COALESCE mirrors clean_text's NULL-text-as-empty contract
  SELECT doc_id, COALESCE(text, '') AS text,
         trim(regexp_replace(
                regexp_replace(COALESCE(text, ''),
                               '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]', '', 'g'),
                '[ \t\n\r]+', ' ', 'g')) AS cleaned
  FROM documents
)
"""


@register("text_cleaning", _CLEAN_ORACLE)
def q_text_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.operators.textstats import clean_text

    return clean_text(load_table(spark, "documents", sf_dir))


# --- per-group sequence packing ---------------------------------------------
# Independent packing streams per language (curriculum / per-domain
# mixture runs pack each domain separately): same arithmetic, prefix sum
# and seq_id space partitioned by lang.

_PACKING_BY_LANG_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, CAST(ceil(length(text) / 4.0) AS BIGINT) AS toks
  FROM documents WHERE length(text) > 0
),
run AS (
  SELECT doc_id, lang, toks,
         SUM(toks) OVER (PARTITION BY lang ORDER BY doc_id) AS running
  FROM toks
),
spans AS (
  SELECT doc_id, lang, toks, running - toks AS tok_start,
         CAST(FLOOR((running - toks) / {_SEQ_LEN}) AS BIGINT) AS first_seq,
         CAST(FLOOR((running - 1) / {_SEQ_LEN}) AS BIGINT) AS last_seq
  FROM run
),
per AS (
  SELECT s.lang, u.seq_id,
         LEAST(s.tok_start + s.toks, (u.seq_id + 1) * {_SEQ_LEN})
           - GREATEST(s.tok_start, u.seq_id * {_SEQ_LEN}) AS overlap,
         CASE WHEN u.seq_id < s.last_seq THEN 1 ELSE 0 END AS straddles
  FROM spans s, UNNEST(range(s.first_seq, s.last_seq + 1)) AS u(seq_id)
)
SELECT lang,
       CAST(seq_id AS BIGINT) AS seq_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(overlap) AS BIGINT) AS n_tokens,
       CAST(SUM(straddles) AS BIGINT) AS n_boundary_docs,
       ROUND(SUM(overlap) * 1.0 / {_SEQ_LEN}, 6) AS fill_frac
FROM per GROUP BY lang, seq_id
"""


@register("sequence_packing_by_lang", _PACKING_BY_LANG_ORACLE)
def q_sequence_packing_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.operators.packing import sequence_packing

    return sequence_packing(
        load_table(spark, "documents", sf_dir), _SEQ_LEN, group_cols=["lang"]
    )


# --- deterministic corpus shuffle -------------------------------------------
# Reproducible global training order (operators/shuffle.py): LCG key +
# bucketed two-phase global rank — no single-task total sort. The LCG is
# exact integer arithmetic in both engines, so key AND rank value-check.

_SHUFFLE_SEED = 7

_SHUFFLE_ORACLE = f"""
WITH keyed AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         ((((doc_id % 2147483648) * 1103515245 + 12345 + {_SHUFFLE_SEED})
           % 2147483648)
          * 1103515245 + 12345) % 2147483648 AS shuffle_key
  FROM documents
)
SELECT doc_id,
       CAST(shuffle_key AS BIGINT) AS shuffle_key,
       CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT)
         AS shuffle_rank
FROM keyed
"""


@register("shuffled_corpus_order", _SHUFFLE_ORACLE)
def q_shuffled_corpus_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.operators.shuffle import deterministic_shuffle

    return deterministic_shuffle(
        load_table(spark, "documents", sf_dir), seed=_SHUFFLE_SEED
    ).select(
        "doc_id", "shuffle_key", F.col("shuffle_rank").cast("long").alias("shuffle_rank")
    )


# --- UDTF surface for CDC chunkers ------------------------------------------
# chunk_cdc(text, algo, expected, seed) as a SQL LATERAL front-end over
# the same vectorized kernels the DataFrame pipeline uses. Cut positions
# aren't SQL-expressible, but byte conservation is: per-doc chunk
# lengths must sum to n_chars (the same oracle as ae_concat_check).

_UDTF_CDC_CONCAT_ORACLE = """
SELECT doc_id AS src_id, CAST(n_chars AS BIGINT) AS total_len
FROM documents
WHERE n_chars > 0  -- the LATERAL join drops chunkless (empty) docs
"""


@register("udtf_ae_concat_check", _UDTF_CDC_CONCAT_ORACLE)
def q_udtf_ae_concat_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    load_table(spark, "documents", sf_dir).createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id AS src_id, CAST(SUM(c.length) AS BIGINT) AS total_len
        FROM __udtf_docs d, LATERAL chunk_cdc(d.text, 'ae', 320, 0) c
        GROUP BY d.doc_id
        """
    )


# --- incremental near-dup: batch vs corpus ----------------------------------
# The document-level ingest analog (operators/dedup_docs.py::
# incremental_jaccard_pairs): the batch (doc_id % 3 == 0) finds its
# near-dups against the whole union without any corpus-vs-corpus work.
# Oracle = the pairs-touching-batch subset of the full exact join.

_INCR_JACCARD_ORACLE = f"""
WITH {_WORDS_CTE}, {_shingles_cte(JACCARD_N)},
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
s AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)
SELECT * FROM (
  SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
         ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
  FROM p JOIN s sa ON sa.doc_id = id_a JOIN s sb ON sb.doc_id = id_b
) WHERE jaccard >= {JACCARD_THRESHOLD}
  AND (id_a % 3 = 0 OR id_b % 3 = 0)
"""


@register("incremental_jaccard_pairs", _INCR_JACCARD_ORACLE)
def q_incremental_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cdc_algorithms_spark.operators.dedup_docs import incremental_jaccard_pairs

    docs = load_table(spark, "documents", sf_dir)
    return incremental_jaccard_pairs(
        docs.where(F.col("doc_id") % 3 != 0),
        docs.where(F.col("doc_id") % 3 == 0),
        n=JACCARD_N,
        threshold=JACCARD_THRESHOLD,
    )


# One DURABLE corpus index per (session, corpus dir): the index is the
# written-ONCE side of the incremental contract — rebuilding it on every
# call would make the bench time the build, not the probe, and no
# standing pipeline rebuilds its corpus index per batch. The cache holds
# the parquet path of the written index (keyed on the applicationId so a
# new session never trusts another's temp dir); the probe re-reads it
# from disk per call, exactly as a standing pipeline's batches would.
_JACCARD_INDEX_CACHE: dict[tuple[str, str], str] = {}


@register("incremental_jaccard_pairs_indexed", _INCR_JACCARD_ORACLE)
def q_incremental_jaccard_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact incremental near-dup through the DURABLE-index path
    (operators/dedup_docs.py::jaccard_prefix_index →
    write_jaccard_index → read_jaccard_index →
    incremental_jaccard_pairs_indexed): the corpus index is written ONCE
    as shingle-bucket-partitioned parquet, and each batch probe
    statically prunes every index read down to the partition directories
    its own shingles hash into — batch-proportional index I/O, no full
    index scan and no corpus-side aggregate per batch. Same oracle as
    incremental_jaccard_pairs — the frozen order changes only the
    candidate superset, and exact verification decides membership.
    The bucket-pruned probe shape (PartitionFilters on every index scan)
    is pinned in tests/test_plans.py. The index is built+written once
    per (session, corpus) — repeat calls (bench timed runs after the
    warm-up, every batch of a standing pipeline) measure the PROBE,
    which is the operator's cost model."""
    import tempfile

    from cdc_algorithms_spark.operators.dedup_docs import (
        incremental_jaccard_pairs_indexed,
        jaccard_prefix_index,
        read_jaccard_index,
        write_jaccard_index,
    )

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _JACCARD_INDEX_CACHE.get(key)
    if path is None:
        docs = load_table(spark, "documents", sf_dir)
        index = jaccard_prefix_index(
            docs.where(F.col("doc_id") % 3 != 0), n=JACCARD_N,
            threshold=JACCARD_THRESHOLD,
        )
        path = tempfile.mkdtemp(prefix="cdc_jaccard_index_")
        write_jaccard_index(index, path)
        # the build's persisted sets frame has served its one write;
        # release it so probes hold NO executor storage at all
        index[1].unpersist()
        # cap the cache at ONE entry: stale sessions' dirs are dead and
        # another sf_dir's index would just shadow this one
        _JACCARD_INDEX_CACHE.clear()
        _JACCARD_INDEX_CACHE[key] = path

    docs = load_table(spark, "documents", sf_dir)
    return incremental_jaccard_pairs_indexed(
        read_jaccard_index(spark, path),
        docs.where(F.col("doc_id") % 3 == 0),
        n=JACCARD_N,
        threshold=JACCARD_THRESHOLD,
    )


# One stream-maintained Jaccard index per (session, corpus dir) — the
# build (seed write + two streamed extension epochs + one mid-stream
# compaction) happens once; every call after probes the durable store,
# same contract as the BM25 stream cache.
_JACCARD_STREAM_CACHE: dict[tuple[str, str], str] = {}


@register("streaming_jaccard_index", _INCR_JACCARD_ORACLE)
def q_streaming_jaccard_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact near-dup through a STREAM-MAINTAINED durable
    Jaccard index (streaming/jaccard_index.py): the index seeds on the
    doc_id %3==1 third, the %3==2 third arrives as two foreachBatch
    epochs appended as bucket-partitioned sets/prefix deltas (the frozen
    total order needs no df deltas), with a mid-stream compaction folding
    the first epoch while the stream is quiesced. The %3==0 batch then
    probes the live store. Because the frozen order is a fixed function
    and verification is exact, the probe equals the one-shot
    incremental join over the whole corpus — this row shares the batch
    incremental-Jaccard oracle VERBATIM, no approximation tier.
    Replay idempotence and fold-then-extend exactness are pinned in
    tests/test_streaming.py."""
    from cdc_algorithms_spark.operators.dedup_docs import (
        incremental_jaccard_pairs_indexed,
        read_jaccard_index_live,
    )
    from cdc_algorithms_spark.streaming.jaccard_index import (
        run_streaming_jaccard_index,
    )

    docs = load_table(spark, "documents", sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    path = _JACCARD_STREAM_CACHE.get(key)
    if path is None:
        import tempfile

        seed = docs.where(F.col("doc_id") % 3 == 1)
        stages = [
            docs.where(
                (F.col("doc_id") % 3 == 2) & (F.col("doc_id") % 2 == par)
            ).select("doc_id", "text")
            for par in (0, 1)
        ]
        path = tempfile.mkdtemp(prefix="cdc_jaccard_stream_") + "/index"
        run_streaming_jaccard_index(
            spark, seed, stages, path, n=JACCARD_N, threshold=JACCARD_THRESHOLD
        )
        _JACCARD_STREAM_CACHE.clear()
        _JACCARD_STREAM_CACHE[key] = path
    return incremental_jaccard_pairs_indexed(
        read_jaccard_index_live(spark, path),
        docs.where(F.col("doc_id") % 3 == 0),
        n=JACCARD_N,
        threshold=JACCARD_THRESHOLD,
    )


@register("incremental_minhash_pairs", _INCR_JACCARD_ORACLE)
def q_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate incremental near-dup (operators/dedup_docs.py::
    incremental_minhash_pairs): the batch's bands probe the corpus band
    index. Oracle: the EXACT Jaccard pairs restricted to pairs touching
    the batch (doc_id % 3 = 0) — valid because verification makes
    precision exact and the 32/8 banding empirically misses zero J≥0.8
    pairs on the fixed driver corpus (see minhash_lsh_pairs); the
    pairs-touching-batch equivalence vs the full LSH join is also
    pinned in tests/test_training_ops.py."""
    from cdc_algorithms_spark.operators.dedup_docs import incremental_minhash_pairs

    docs = load_table(spark, "documents", sf_dir)
    return incremental_minhash_pairs(
        docs.where(F.col("doc_id") % 3 != 0),
        docs.where(F.col("doc_id") % 3 == 0),
        n=JACCARD_N,
        num_hashes=32,
        bands=8,
        threshold=JACCARD_THRESHOLD,
        max_bucket=LSH_MAX_BUCKET,
    )


# --- duplicate-n-gram coverage (span-level dedup signal) ---------------------
# Lee et al., "Deduplicating Training Data Makes Language Models Better"
# (arXiv:2107.06499) at n-gram granularity: per doc, the fraction of its
# distinct word n-grams that occur in >= 2 documents.

DUP_NGRAM_N = 5

_DUP_NGRAM_ORACLE = f"""
WITH {_WORDS_CTE}, {_shingles_cte(DUP_NGRAM_N)},
f AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
SELECT CAST(sh.doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       CAST(SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_ngrams,
       ROUND(SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS dup_rate
FROM sh JOIN f USING (shingle)
GROUP BY sh.doc_id
"""


@register("dup_ngram_coverage", _DUP_NGRAM_ORACLE)
def q_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/template detector exact and near dedup both miss: a
    doc can be 40% duplicated spans yet far from any single other doc.
    Value-checked per doc against the DuckDB shingle-frequency join;
    the Spark side shuffles only (doc_id, xxhash64(shingle)) pairs."""
    from cdc_algorithms_spark.operators.dedup_docs import dup_ngram_coverage

    return dup_ngram_coverage(
        load_table(spark, "documents", sf_dir), n=DUP_NGRAM_N
    )


# --- heavy hitters: Misra-Gries candidates + exact recount -------------------

FREQ_PHI = 0.005

_FREQUENT_TERMS_ORACLE = rf"""
WITH {_WORDS_CTE},
tok AS (SELECT unnest(words) AS term FROM w)
SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
FROM tok
GROUP BY term
HAVING COUNT(*) > FLOOR({FREQ_PHI} * (SELECT COUNT(*) FROM tok))
"""


@register("frequent_terms", _FREQUENT_TERMS_ORACLE)
def q_frequent_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms above a {FREQ_PHI:.1%}-of-corpus frequency bar via the
    two-pass Misra-Gries shape (operators/frequency.py): map-only
    candidate summaries, then an exact broadcast-gated recount — never
    a vocabulary-sized shuffle. The recount makes the output exact, so
    the oracle is the plain DuckDB frequency query."""
    from cdc_algorithms_spark.operators.frequency import frequent_terms

    return frequent_terms(load_table(spark, "documents", sf_dir), phi=FREQ_PHI)


# --- Bloom-gated decontamination: zero-false-negative check ------------------

_BLOOM_BITS = 1 << 20
_BLOOM_HASHES = 7
# generous FP headroom: with 2^20 bits over ~1.4k bench shingles the
# expected doc-level FP count is ~0; the bound only exists to make the
# column falsifiable without being seed-brittle.
_BLOOM_FP_FRAC = 0.02

_BLOOM_DECONTAM_ORACLE = f"""
WITH {_WORDS_CTE}, {_shingles_cte(DECONTAM_N)},
tr AS (SELECT * FROM sh WHERE doc_id % {_DECONTAM_MOD} <> 0),
be AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {_DECONTAM_MOD} = 0),
per_doc AS (
  SELECT tr.doc_id,
         MAX(CASE WHEN be.shingle IS NOT NULL THEN 1 ELSE 0 END) AS hit
  FROM tr LEFT JOIN be ON tr.shingle = be.shingle
  GROUP BY tr.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_train_docs,
       CAST(SUM(hit) AS BIGINT) AS n_exact_flagged,
       CAST(0 AS BIGINT) AS n_bloom_missed,
       TRUE AS fp_within_bound
FROM per_doc
"""


@register("bloom_decontamination_check", _BLOOM_DECONTAM_ORACLE)
def q_bloom_decontamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-gated decontamination (operators/membership.py) against
    the exact shingle join: Bloom filters have NO false negatives, so
    every exactly-contaminated doc must probe positive —
    ``n_bloom_missed`` is structurally zero and any probe/build bug
    (position math, packing, seeding) breaks it loudly.  The FP side is
    bounded, not pinned: flagged-but-clean docs stay under
    ``max(ceil(2% of train), 8)`` (measured 0 at sf0.001/0.01/0.1 with
    2^20 bits)."""
    from cdc_algorithms_spark.operators.dedup_docs import decontaminate
    from cdc_algorithms_spark.operators.membership import bloom_flagged_docs

    docs = load_table(spark, "documents", sf_dir)
    bench = docs.where(F.col("doc_id") % _DECONTAM_MOD == 0)
    train = docs.where(F.col("doc_id") % _DECONTAM_MOD != 0)
    flagged = bloom_flagged_docs(
        train, bench, n=DECONTAM_N, num_bits=_BLOOM_BITS, num_hashes=_BLOOM_HASHES
    )
    exact = decontaminate(train, bench, n=DECONTAM_N).select("doc_id", "n_shared")
    j = flagged.join(exact, "doc_id")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_train_docs"),
        F.sum((F.col("n_shared") > 0).cast("long")).cast("long").alias("n_exact_flagged"),
        F.sum(((F.col("n_shared") > 0) & ~F.col("bloom_hit")).cast("long"))
        .cast("long")
        .alias("n_bloom_missed"),
        (
            F.sum(((F.col("n_shared") == 0) & F.col("bloom_hit")).cast("long"))
            <= F.greatest(
                F.ceil(F.lit(_BLOOM_FP_FRAC) * F.count(F.lit(1))), F.lit(8)
            )
        ).alias("fp_within_bound"),
    )


# --- near-dup clusters through the LSH candidate path ------------------------


@register("near_dup_clusters_lsh", _COMPONENTS_ORACLE)
def q_near_dup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full production dedup pipeline end-to-end: MinHash banding →
    skew-capped candidate join → exact-Jaccard verification →
    connected components — value-checked against the DuckDB transitive
    closure over the EXACT pair graph.  Valid for the same reason
    minhash_lsh_pairs shares the exact oracle: verification makes
    precision exact, and the 32/8 banding empirically misses zero
    J≥0.8 pairs on the fixed driver corpus, so the edge sets (hence the
    components) coincide — while the Spark side only ever touches
    banded candidates, never the all-pairs product."""
    from cdc_algorithms_spark.operators.dedup_docs import connected_components

    pairs = minhash_lsh_pairs(
        load_table(spark, "documents", sf_dir),
        n=JACCARD_N,
        num_hashes=32,
        bands=8,
        threshold=JACCARD_THRESHOLD,
        max_bucket=LSH_MAX_BUCKET,
    )
    return connected_components(pairs)


# --- winnowing fingerprints: near-dup sensitivity check ----------------------

_FP_CHECK_ORACLE = f"""
WITH {_WORDS_CTE}, {_shingles_cte(JACCARD_N)},
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
s AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT id_a, id_b
  FROM p JOIN s sa ON sa.doc_id = id_a JOIN s sb ON sb.doc_id = id_b
  WHERE ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 6)
        >= {JACCARD_THRESHOLD}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_near_dup_pairs,
       CAST(0 AS BIGINT) AS n_pairs_sharing_no_fp
FROM pairs
"""


@register("fingerprint_near_dup_check", _FP_CHECK_ORACLE)
def q_fingerprint_near_dup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (textstats.py::doc_fingerprints_fast) are
    a MOSS-style containment signal: two docs sharing a long-enough
    run share a selected fingerprint.  The check: every exact J≥0.8
    pair shares ≥1 fingerprint (measured true at sf0.001/0.01 — these
    near-identical docs share runs far above the winnowing guarantee
    length).  DuckDB independently recomputes the pair count; a
    fingerprint-selection bug (window math, hash drift) that blinds
    the signal flips ``n_pairs_sharing_no_fp`` nonzero."""
    from cdc_algorithms_spark.operators.textstats import doc_fingerprints_fast

    docs = load_table(spark, "documents", sf_dir)
    pairs = ngram_jaccard_pairs(
        docs, n=JACCARD_N, threshold=JACCARD_THRESHOLD
    ).select("id_a", "id_b")
    fp = doc_fingerprints_fast(docs)
    shared = (
        pairs.join(
            fp.select(F.col("doc_id").alias("id_a"), "fingerprint"), "id_a"
        )
        .join(
            fp.select(
                F.col("doc_id").alias("id_b"), F.col("fingerprint").alias("__f2")
            ),
            "id_b",
        )
        .where(F.col("fingerprint") == F.col("__f2"))
        .select("id_a", "id_b")
        .distinct()
    )
    missed = pairs.join(shared, ["id_a", "id_b"], "left_anti")
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_near_dup_pairs")
    ).crossJoin(
        missed.agg(F.count(F.lit(1)).cast("long").alias("n_pairs_sharing_no_fp"))
    )


# --- simhash: signal-quality + banding-completeness check --------------------

_SIMHASH_RECALL_HAMMING = 16  # measured max over exact J>=0.8 pairs: 11
                              # (sf0.001); 5 (sf0.01). Random/broken
                              # fingerprints center at 32 on 64 bits.

_SIMHASH_CHECK_ORACLE = f"""
WITH {_WORDS_CTE}, {_shingles_cte(JACCARD_N)},
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
s AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
pairs AS (
  SELECT id_a, id_b
  FROM p JOIN s sa ON sa.doc_id = id_a JOIN s sb ON sb.doc_id = id_b
  WHERE ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 6)
        >= {JACCARD_THRESHOLD}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_near_dup_pairs,
       CAST(0 AS BIGINT) AS n_pairs_beyond_hamming,
       CAST(0 AS BIGINT) AS n_banding_missed
FROM pairs
"""


@register("simhash_near_dup_check", _SIMHASH_CHECK_ORACLE)
def q_simhash_near_dup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The simhash oracle conversion (the fingerprint itself is
    hash-seeded, so DuckDB can't recompute it — but its CONTRACT is
    checkable): (a) signal quality — every exact J≥0.8 pair, which
    DuckDB recomputes independently, sits within Hamming 16 of 64 bits
    (measured max 11; a seeding/window/vote bug randomizes fingerprints
    toward the binomial center of 32 and trips this loudly); (b)
    banding completeness — the 4×16-bit pigeonhole join of
    simhash_pairs (operators/dedup_docs.py) finds EVERY pair within
    Hamming ≤ 3, verified against a brute-force fingerprint self-join.
    The O(n²) self-join is CHECK APPARATUS at driver scale, not the
    production path (which is the banded join)."""
    from cdc_algorithms_spark.operators.dedup_docs import (
        simhash_fingerprints,
        simhash_pairs,
    )

    docs = load_table(spark, "documents", sf_dir)
    fps = simhash_fingerprints(docs)
    fa = fps.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("__fa"))
    fb = fps.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("__fb"))
    ham = F.expr("bit_count(__fa ^ __fb)")
    exact = ngram_jaccard_pairs(
        docs, n=JACCARD_N, threshold=JACCARD_THRESHOLD
    ).select("id_a", "id_b")
    recall = (
        exact.join(fa, "id_a")
        .join(fb, "id_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_near_dup_pairs"),
            F.sum((ham > _SIMHASH_RECALL_HAMMING).cast("long"))
            .cast("long")
            .alias("n_pairs_beyond_hamming"),
        )
    )
    brute = (
        fa.crossJoin(fb)
        .where((F.col("id_a") < F.col("id_b")) & (ham <= 3))
        .select("id_a", "id_b")
    )
    banded = simhash_pairs(docs, max_hamming=3).select("id_a", "id_b")
    missed = brute.join(banded, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).cast("long").alias("n_banding_missed")
    )
    return recall.crossJoin(missed)


# --- semantic dedup: removal-justification check -----------------------------

_SEMDEDUP_T = COSINE_THRESHOLD  # the corpus's duplicate band (0.4)

_SEMDEDUP_CHECK_ORACLE = f"""
WITH pr AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[],
                                     b.embedding::DOUBLE[]), 6) >= {_SEMDEDUP_T}
),
ids AS (SELECT id_a AS vec_id FROM pr UNION SELECT id_b FROM pr)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM embeddings) AS n_points,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ids) AS n_dup_docs,
       TRUE AS removals_justified,
       TRUE AS removals_bounded
"""


@register("semantic_dedup_check", _SEMDEDUP_CHECK_ORACLE)
def q_semantic_dedup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup's safety contract, driver-checked: a removed vector
    ALWAYS has an exact-cosine neighbor ≥ t (its in-cell keeper), so
    the removal set is a subset of the exactly-duplicated ids — which
    DuckDB recomputes independently via brute-force
    ``list_cosine_similarity``.  ``removals_justified`` = no removed
    vector lacks an exact neighbor; ``removals_bounded`` = |removed| ≤
    |dup ids|.  Both booleans are falsified by any assignment/kernel
    bug that prunes a lonely vector; n_points/n_dup_docs are exact
    value columns (24 removals from 99 dup ids at sf0.01)."""
    from cdc_algorithms_spark.operators.dedup_docs import embedding_near_dup_pairs
    from cdc_algorithms_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, "embeddings", sf_dir)
    pairs = embedding_near_dup_pairs(emb, threshold=_SEMDEDUP_T)
    dup_ids = (
        pairs.select(F.explode(F.array("id_a", "id_b")).alias("vec_id")).distinct()
    )
    removed = semantic_dedup(emb, k=8, dim=64, threshold=_SEMDEDUP_T).where(
        ~F.col("keep")
    )
    n_points = emb.agg(F.count(F.lit(1)).cast("long").alias("n_points"))
    n_dups = dup_ids.agg(F.count(F.lit(1)).cast("long").alias("n_dup_docs"))
    n_removed = removed.agg(F.count(F.lit(1)).cast("long").alias("__n_removed"))
    n_unjust = (
        removed.join(dup_ids, "vec_id", "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("__n_unjustified"))
    )
    return (
        n_points.crossJoin(n_dups)
        .crossJoin(n_removed)
        .crossJoin(n_unjust)
        .select(
            "n_points",
            "n_dup_docs",
            (F.col("__n_unjustified") == 0).alias("removals_justified"),
            (F.col("__n_removed") <= F.col("n_dup_docs")).alias("removals_bounded"),
        )
    )


# --- Train/val/test splits + near-dup leakage (operators/splits.py) ---------
# Deterministic hash-threshold split assignment (same LCG as the corpus
# shuffle — exact integer arithmetic in both engines), the cross-split
# near-dup leakage audit, and the cluster-safe assignment that makes
# leakage structurally impossible. Reference has no split machinery;
# this is the §2.5 training-pipeline surface (task brief).

_SPLIT_SEED = 11
_SPLIT_FRACTIONS = (("train", 0.8), ("val", 0.1), ("test", 0.1))


def _split_case_sql(key_expr: str) -> str:
    from cdc_algorithms_spark.operators.splits import split_thresholds

    bounds = split_thresholds(_SPLIT_FRACTIONS)
    whens = " ".join(
        f"WHEN {key_expr} < {upper} THEN '{name}'" for name, upper in bounds[:-1]
    )
    return f"CASE {whens} ELSE '{bounds[-1][0]}' END"


def _split_lcg_sql(expr: str) -> str:
    """The split-seeded two-round LCG in DuckDB SQL — byte-identical
    integer arithmetic to operators/shuffle.shuffle_key (single-sourced:
    every split oracle keys through this)."""
    return (
        f"(((({expr} % 2147483648) * 1103515245 + 12345 + {_SPLIT_SEED})"
        f" % 2147483648) * 1103515245 + 12345) % 2147483648"
    )


def _split_keyed_cte(rep_expr: str = "doc_id") -> str:
    """DuckDB CTE assigning each doc its split off ``rep_expr``'s LCG key."""
    return f"""
keyed AS (
  SELECT doc_id, lang, n_chars,
         {_split_case_sql("k")} AS split
  FROM (
    SELECT doc_id, lang, n_chars,
           {_split_lcg_sql(rep_expr)} AS k
    FROM documents
  )
)
"""


_SPLIT_SUMMARY_ORACLE = f"""
WITH {_split_keyed_cte()}
SELECT split, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars
FROM keyed GROUP BY split, lang
"""


@register("split_assignment_summary", _SPLIT_SUMMARY_ORACLE)
def q_split_assignment_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (operators/splits.py::
    split_assignment — MAP-ONLY: LCG key vs integer cumulative
    thresholds, no shuffle, no join; plan pinned in tests/test_plans.py)
    summarized per (split, lang). The full assignment value-checks via
    the summary: any per-doc disagreement moves a (split, lang) count."""
    from cdc_algorithms_spark.operators.splits import split_assignment

    docs = load_table(spark, "documents", sf_dir)
    return (
        split_assignment(docs, _SPLIT_FRACTIONS, seed=_SPLIT_SEED)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
    )


_SPLIT_LEAKAGE_ORACLE = f"""
WITH {_WORDS_CTE}, {_shingles_cte(JACCARD_N)},
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
s AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
jp AS (
  SELECT * FROM (
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           ROUND(n_common * 1.0 / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM p JOIN s sa ON sa.doc_id = id_a JOIN s sb ON sb.doc_id = id_b
  ) WHERE jaccard >= {JACCARD_THRESHOLD}
),
{_split_keyed_cte()}
SELECT jp.id_a, jp.id_b, jp.jaccard,
       ka.split AS split_a, kb.split AS split_b
FROM jp
JOIN keyed ka ON ka.doc_id = jp.id_a
JOIN keyed kb ON kb.doc_id = jp.id_b
WHERE ka.split != kb.split
"""


@register("split_leakage_pairs", _SPLIT_LEAKAGE_ORACLE)
def q_split_leakage_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split near-dup leakage audit (operators/splits.py::
    split_leakage): exact J>={JACCARD_THRESHOLD} pairs whose docs landed
    in different splits under the naive per-doc assignment. Plan: the
    corpus-sized assignment is semi-joined down to pair-touched ids,
    then broadcast — one corpus scan, pair-list-sized joins."""
    from cdc_algorithms_spark.operators.splits import (
        split_assignment,
        split_leakage,
    )

    docs = load_table(spark, "documents", sf_dir)
    pairs = ngram_jaccard_pairs(docs, n=JACCARD_N, threshold=JACCARD_THRESHOLD)
    assignment = split_assignment(docs, _SPLIT_FRACTIONS, seed=_SPLIT_SEED)
    return split_leakage(assignment, pairs).select(
        "id_a", "id_b", "jaccard", "split_a", "split_b"
    )


_CLUSTER_SPLIT_ORACLE = f"""
WITH RECURSIVE {_WORDS_CTE}, {_shingles_cte(JACCARD_N)},{_COMPONENTS_CTE},
comp AS (SELECT node AS doc_id, MIN(seen) AS component_id FROM reach GROUP BY node),
keyed AS (
  SELECT doc_id, split FROM (
    SELECT d.doc_id,
           {_split_case_sql("k")} AS split
    FROM (
      SELECT d0.doc_id,
             {_split_lcg_sql("COALESCE(c.component_id, d0.doc_id)")} AS k
      FROM documents d0 LEFT JOIN comp c ON c.doc_id = d0.doc_id
    ) d
  )
),
leaks AS (
  SELECT COUNT(*) AS leaked_pairs
  FROM pairs
  JOIN keyed ka ON ka.doc_id = pairs.id_a
  JOIN keyed kb ON kb.doc_id = pairs.id_b
  WHERE ka.split != kb.split
)
SELECT keyed.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MAX(leaks.leaked_pairs) AS BIGINT) AS leaked_pairs
FROM keyed, leaks
GROUP BY keyed.split
"""


@register("cluster_safe_split_check", _CLUSTER_SPLIT_ORACLE)
def q_cluster_safe_split_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-safe splits (operators/splits.py::
    cluster_safe_split_assignment): every doc keys its split off its
    near-dup component representative, so leakage is structurally zero.
    Emits per-split doc counts plus the (necessarily 0) count of
    cross-split near-dup pairs — the oracle recomputes components via
    DuckDB's recursive transitive closure and must agree both that the
    per-split census matches and that zero pairs straddle splits."""
    from cdc_algorithms_spark.operators.splits import (
        cluster_safe_split_assignment,
        split_leakage,
    )

    docs = load_table(spark, "documents", sf_dir)
    pairs = ngram_jaccard_pairs(docs, n=JACCARD_N, threshold=JACCARD_THRESHOLD)
    assignment = cluster_safe_split_assignment(
        docs, pairs, _SPLIT_FRACTIONS, seed=_SPLIT_SEED
    )
    leaked = (
        split_leakage(assignment, pairs)
        .agg(F.count(F.lit(1)).cast("long").alias("leaked_pairs"))
    )
    return (
        assignment.groupBy("split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(F.broadcast(leaked))
    )


# --- Dedup-adjusted mixture planning ---------------------------------------
# Mixture weights derived from EFFECTIVE (post-dedup) source sizes: a
# source whose tokens are largely near-copies of already-counted
# documents must not earn mixture weight for them, or the sampled
# mixture over-trains on the duplicated content the dedup stage exists
# to suppress. Composition: near-dup components over the exact Jaccard
# pair graph (keep-one accounting: only each cluster's representative
# contributes tokens; J=1 exact copies are a special case of the same
# graph) -> per-source effective totals -> temperature weights over the
# effective sizes. This closes the dedup -> curation loop the same way
# streaming_near_dup_index closes ingest -> index -> dedup.

_MIXTURE_ALPHA = 0.7

_DEDUP_MIXTURE_ORACLE = f"""
WITH RECURSIVE {_WORDS_CTE}, {_shingles_cte(JACCARD_N)},{_COMPONENTS_CTE},
comp AS (SELECT node AS doc_id, MIN(seen) AS component_id FROM reach GROUP BY node),
marked AS (
  SELECT d.source,
         CAST(ceil(length(d.text) / 4.0) AS BIGINT) AS toks,
         (c.component_id IS NULL OR c.component_id = d.doc_id) AS is_rep
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
  WHERE length(d.text) > 0
),
per_source AS (
  SELECT source,
         CAST(SUM(toks) AS BIGINT) AS raw_tokens,
         CAST(SUM(CASE WHEN is_rep THEN toks ELSE 0 END) AS BIGINT)
           AS effective_tokens
  FROM marked GROUP BY source
),
z AS (SELECT SUM(POW(effective_tokens, {_MIXTURE_ALPHA})) AS z FROM per_source)
SELECT source, raw_tokens, effective_tokens,
       ROUND(1.0 - effective_tokens * 1.0 / raw_tokens, 6) AS dup_token_share,
       ROUND(POW(effective_tokens, {_MIXTURE_ALPHA}) / z.z, 6) AS weight
FROM per_source, z
"""


@register("dedup_adjusted_mixture", _DEDUP_MIXTURE_ORACLE)
def q_dedup_adjusted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture weights over post-near-dup effective token
    counts (operators/dedup_docs.py::ngram_jaccard_pairs ->
    connected_components + the temperature_weights normalization
    shape): weight proportional to effective_tokens^0.7, where only each
    near-dup cluster's representative (component min id; singletons are
    their own) contributes tokens. Plan: the component frame is bounded
    by docs-with-a-near-dup so it broadcasts into a map-side left join;
    per-source totals are a #sources-row frame; the normalizing
    constant is a 1-row broadcast cross join - nothing corpus-sized
    crosses an exchange after the pair graph is built."""
    from cdc_algorithms_spark.operators.dedup_docs import (
        connected_components,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, "documents", sf_dir).where(F.length("text") > 0)
    comp = connected_components(
        ngram_jaccard_pairs(docs, n=JACCARD_N, threshold=JACCARD_THRESHOLD)
    )
    toks = F.ceil(F.length("text") / 4.0).cast("long")
    marked = (
        docs.select("doc_id", "source", toks.alias("toks"))
        .join(F.broadcast(comp), "doc_id", "left")
        .select(
            "source",
            "toks",
            (
                F.col("component_id").isNull()
                | (F.col("component_id") == F.col("doc_id"))
            ).alias("is_rep"),
        )
    )
    per_source = marked.groupBy("source").agg(
        F.sum("toks").cast("long").alias("raw_tokens"),
        F.sum(F.when(F.col("is_rep"), F.col("toks")).otherwise(0))
        .cast("long")
        .alias("effective_tokens"),
    )
    z = per_source.agg(
        F.sum(F.pow("effective_tokens", _MIXTURE_ALPHA)).alias("__z")
    )
    return per_source.crossJoin(F.broadcast(z)).select(
        "source",
        "raw_tokens",
        "effective_tokens",
        F.round(
            1.0 - F.col("effective_tokens") / F.col("raw_tokens"), 6
        ).alias("dup_token_share"),
        F.round(
            F.pow("effective_tokens", _MIXTURE_ALPHA) / F.col("__z"), 6
        ).alias("weight"),
    )
