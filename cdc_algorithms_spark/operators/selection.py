"""Data-selection operators for training corpora: cross-document
duplication fractions, DSIR importance weights, and exact
substring-span dedup.

The per-document signals a curation pipeline computes corpus-wide:

* :func:`cross_doc_dup_fraction` — the share of a document's word
  n-gram INSTANCES that also occur in at least one other document (the
  C4/RefinedWeb "duplicate text fraction"). Complements
  ``textstats.repetition_ratios`` (intra-doc looping) and the pairwise
  dedup operators (`dedup_docs`): this is the per-doc marginal signal
  you threshold on, not a pair list.
* :func:`dsir_importance_weights` — hashed-n-gram importance weights in
  the style of DSIR (Xie et al., 2023, "Data Selection for Language
  Models via Importance Resampling"): the per-document log-likelihood
  ratio between a smoothed unigram model of a TARGET slice and one of
  the RAW corpus. Positive weight = looks more like the target; the
  mixture/sampling operators (`mixture.py`, `sampling.py`) consume the
  weights to realize a selection.
* :func:`remove_duplicate_spans` — the TRANSFORM: exact substring-span
  dedup after Lee et al. 2022, removing every cross-doc duplicated
  n-gram instance from all but its canonical document (measured at
  corpus scale in SCALING.md §23).

Determinism contract (same device as ``retrieval.py``): every
per-term float contribution is quantized to a BIGINT
(``floor(x * 1e9)``) before the per-document sum, making the sum
order-independent and the DuckDB oracle bit-exact; reported floats are
the quantized sums scaled back.

Scale notes (100 TB):
* Both operators fold the token stream to (doc, term/gram, count)
  before any join — raw text never shuffles.
* The gram-keyed joins are vocabulary-sized on both sides; no
  broadcast hint (a forced broadcast of a corpus vocabulary would OOM
  the driver) — AQE picks the strategy from sizes, the same contract
  as `tfidf_top_terms`.
* At corpus scale pass ``fingerprint=True`` to
  :func:`cross_doc_dup_fraction` — grams shuffle as 8-byte xxhash64
  fingerprints instead of n-word strings (the oracle uses exact
  strings; fingerprinting is collision-bounded, not bit-exact, so it
  is an explicit opt-in).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_algorithms_spark.functions.text import shingles_of_words, words

QUANT = 1_000_000_000

DUP_NGRAM_N = 8


def cross_doc_dup_fraction(
    docs: DataFrame,
    n: int = DUP_NGRAM_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: bool = False,
) -> DataFrame:
    """(doc_id, n_ngrams, n_dup_ngrams, dup_fraction) per document.

    ``dup_fraction`` is the share of the doc's positional n-gram
    instances whose n-gram occurs in ≥ 2 distinct documents. Documents
    shorter than n words contribute one whole-doc gram (same rule as
    every shingle operator here), so short exact dupes still score 1.0.
    """
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        words(text_col).alias("__ws"),
    )
    gram: Column = F.explode(shingles_of_words(F.col("__ws"), n)).alias("g")
    grams = base.select("doc_id", gram)
    if fingerprint:
        grams = grams.select("doc_id", F.xxhash64("g").alias("g"))
    cnt = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("cnt"))
    # cnt is unique on (doc_id, g) → document frequency is a plain count
    dfr = cnt.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    return (
        cnt.join(dfr, "g")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("__total"),
            F.sum(
                F.when(F.col("df") >= 2, F.col("cnt")).otherwise(F.lit(0))
            ).alias("__dup"),
        )
        .select(
            "doc_id",
            F.col("__total").cast("long").alias("n_ngrams"),
            F.col("__dup").cast("long").alias("n_dup_ngrams"),
            F.round(F.col("__dup") * F.lit(1.0) / F.col("__total"), 6).alias(
                "dup_fraction"
            ),
        )
    )


def dsir_importance_weights(
    docs: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, lang, n_tokens, weight): smoothed unigram log-likelihood
    ratio of target-slice vs raw-corpus language models.

    weight(d) = Σ_t tf_dt · [ ln((c_tgt(t)+1)/(T_tgt+V))
                            − ln((c_raw(t)+1)/(T_raw+V)) ]

    with add-one smoothing over the raw corpus vocabulary V. All counts
    are exact BIGINTs; each term's contribution is quantized before the
    per-doc sum (module docstring). ``target_pred`` is any boolean
    column over the docs frame (e.g. ``F.col("lang") == "en"``).
    """
    ws = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        "lang",
        target_pred.alias("__tgt"),
        words(text_col).alias("__ws"),
    )
    tf = (
        ws.select(
            "doc_id",
            "lang",
            "__tgt",
            F.size("__ws").alias("dl"),
            F.explode("__ws").alias("word"),
        )
        .select("doc_id", "lang", "__tgt", "dl", F.lower("word").alias("term"))
        .groupBy("doc_id", "lang", "__tgt", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    raw = tf.groupBy("term").agg(F.sum("tf").alias("c_raw"))
    tgt = tf.where("__tgt").groupBy("term").agg(F.sum("tf").alias("c_tgt"))
    meta = tf.agg(
        F.sum("tf").alias("total_raw"),
        F.coalesce(
            F.sum(F.when(F.col("__tgt"), F.col("tf"))), F.lit(0)
        ).alias("total_tgt"),
        F.count_distinct("term").alias("v"),
    )
    ln_tgt = F.log(
        (F.coalesce(F.col("c_tgt"), F.lit(0)) + F.lit(1))
        * F.lit(1.0)
        / (F.col("total_tgt") + F.col("v"))
    )
    ln_raw = F.log(
        (F.col("c_raw") + F.lit(1))
        * F.lit(1.0)
        / (F.col("total_raw") + F.col("v"))
    )
    cq = F.floor(
        F.col("tf") * (ln_tgt - ln_raw) * F.lit(float(QUANT))
    ).cast("long")
    return (
        tf.join(raw, "term")
        .join(tgt, "term", "left")
        .crossJoin(F.broadcast(meta))
        .withColumn("__cq", cq)
        .groupBy("doc_id", "lang", "dl")
        .agg(F.sum("__cq").alias("weight_q"))
        .select(
            "doc_id",
            "lang",
            F.col("dl").cast("long").alias("n_tokens"),
            F.round(F.col("weight_q") / F.lit(float(QUANT)), 6).alias("weight"),
        )
    )


def _gram_fingerprint(g: Column) -> Column:
    """128-bit gram key: two independent xxhash64 draws as a struct.

    A single 64-bit hash starts colliding around ~5·10⁹ distinct grams
    (birthday bound) — real territory for a trillion-gram corpus; the
    paired form pushes that past 10¹⁸ while still shuffling 16 bytes
    instead of an n-word string."""
    return F.struct(
        F.xxhash64(g).alias("h1"),
        F.xxhash64(g, F.lit(0x9E3779B9)).alias("h2"),
    )


def remove_duplicate_spans(
    docs: DataFrame,
    n: int = DUP_NGRAM_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint: bool = False,
) -> DataFrame:
    """Exact substring-span dedup (the transform behind Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    word n-gram instance whose n-gram occurs in ≥ 2 documents is
    REMOVED from every document except the canonical one (min doc_id
    containing the gram), and the surviving tokens are re-joined.

    Returns (doc_id, n_tokens, n_removed, cleaned_text). The canonical
    doc keeps all its instances (including intra-doc repeats); other
    docs lose every token covered by a removable instance. Tokens are
    re-joined with single spaces — original whitespace is not
    preserved (the tokenizer is the shared ``words``).

    Scale notes: the gram join is the same inverted-index class as
    :func:`cross_doc_dup_fraction`; the cover explode is ×n on
    REMOVABLE instances only (bounded by the duplicate volume, not the
    corpus); the rebuild is one per-doc aggregate over kept tokens
    (documents are bounded-length rows — a per-doc sort_array, never a
    corpus sort). At corpus scale pass ``fingerprint=True`` so the
    gram-keyed shuffles carry 128-bit fingerprints instead of n-word
    strings (measured: the exact-string shuffle exhausts local disk at
    1M docs on this container; the fingerprinted run fits — SCALING.md
    §23).
    """
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        words(text_col).alias("__ws"),
    ).select("doc_id", "__ws", F.size("__ws").alias("dl"))
    toks = base.select(
        "doc_id", F.posexplode("__ws").alias("pos", "token")
    )
    grams = base.select(
        "doc_id",
        "dl",
        F.posexplode(shingles_of_words(F.col("__ws"), n)).alias("gpos", "g"),
    )
    if fingerprint:
        # the 100 TB path: the gram-keyed shuffles carry a 16-byte
        # 128-bit fingerprint instead of an n-word string (~6× fewer
        # shuffle bytes measured at 1M docs); collision-bounded, not
        # bit-exact, so it is an explicit opt-in — the oracle-checked
        # form uses exact strings
        grams = grams.select(
            "doc_id", "dl", "gpos", _gram_fingerprint(F.col("g")).alias("g")
        )
    stats = (
        grams.select("doc_id", "g")
        .distinct()
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.min("doc_id").alias("keeper"),
        )
        .where(F.col("df") >= 2)
    )
    removable = grams.join(stats, "g").where(F.col("doc_id") != F.col("keeper"))
    covered = removable.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.col("gpos"),
                F.least(F.col("gpos") + F.lit(n - 1), F.col("dl") - 1),
            )
        ).alias("pos"),
    ).distinct()
    kept = toks.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("__n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "token"))),
                lambda x: x["token"],
            ),
            " ",
        ).alias("__cleaned"),
    )
    return (
        base.select("doc_id", "dl")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.col("dl").cast("long").alias("n_tokens"),
            (F.col("dl") - F.coalesce(F.col("__n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("__cleaned"), F.lit("")).alias("cleaned_text"),
        )
    )
