"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting (task brief).

Every operator is a pure column expression (whole-stage codegen, DuckDB-
mirrorable); the fingerprinting one reuses the CDC machinery's identity
idea at the n-gram level (winnowing-style min-hash selection).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_algorithms_spark.functions.text import (
    char_ngrams,
    shingles_of_words,
    words,
)

# Tiny deterministic stopword profiles per language — the n-gram/stopword
# heuristic tier of language ID (a real pipeline would plug fastText or
# CLD3 here; the operator contract stays the same).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "es": ("el", "la", "los", "de", "que", "y", "es", "con"),
    "fr": ("le", "la", "les", "et", "est", "pour", "avec", "une"),
    "zh": ("的", "是", "了", "在", "和", "有", "我", "不"),
}


def lang_scores(text_col: Column | str) -> dict[str, Column]:
    ws = words(text_col)
    return {
        lang: F.size(
            F.filter(ws, lambda w: w.isin(*markers))
        )
        for lang, markers in LANG_MARKERS.items()
    }


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, lang_hits) — argmax of marker-word hits, ties
    broken by language code order, 'und' (undetermined) when no marker
    matched at all."""
    scores = lang_scores(text_col)
    best = None
    for lang in sorted(scores):  # deterministic tie-break: lexicographic
        cand = F.struct(scores[lang].alias("hits"), F.lit(lang).alias("lang"))
        best = cand if best is None else F.when(
            cand["hits"] > best["hits"], cand
        ).otherwise(best)
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "pred_lang"
        ),
        best["hits"].cast("long").alias("lang_hits"),
    )


def quality_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic quality features + a composite score in [0, 1].

    Features follow the usual web-corpus filters: doc length, mean word
    length, alpha ratio, punctuation ratio, stopword ratio, repetition
    (distinct-word fraction).
    """
    t = F.col(text_col)
    ws = words(text_col)
    n_chars = F.length(t)
    n_words = F.size(ws)
    all_stop = [m for ms in LANG_MARKERS.values() for m in ms]
    stop_ratio = F.size(F.filter(ws, lambda w: w.isin(*all_stop))) / n_words
    alpha_ratio = (
        F.length(F.regexp_replace(t, r"[^A-Za-z]", "")) / n_chars
    )
    punct_ratio = (
        F.length(F.regexp_replace(t, r"[^.,;:!?'\"()]", "")) / n_chars
    )
    distinct_ratio = F.size(F.array_distinct(ws)) / n_words
    mean_word_len = (F.length(F.regexp_replace(t, r"\s+", ""))) / n_words
    length_score = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    composite = (
        0.3 * length_score
        + 0.2 * alpha_ratio
        + 0.2 * distinct_ratio
        + 0.15 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.15 * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(composite, 6).alias("quality_score"),
    )


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace tokens and a BPE-ish sub-token count (letter runs,
    digit runs, and single punctuation marks — the pre-tokenizer split
    most BPE vocabularies assume), plus a ~chars/4 budget estimate."""
    t = F.col(text_col)
    ws_tokens = F.size(words(text_col))
    bpe_ish = F.size(
        F.regexp_extract_all(t, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        ws_tokens.cast("long").alias("ws_tokens"),
        bpe_ish.cast("long").alias("bpe_tokens"),
        F.ceil(F.length(t) / 4.0).cast("long").alias("budget_tokens"),
    )


def doc_fingerprints(
    docs: DataFrame,
    ngram: int = 8,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing-style fingerprints: hash character n-grams, keep the
    minimum hash of each sliding window of ``window`` consecutive
    n-grams, distinct — a compact, shift-tolerant document signature
    (rolling-hash identity, same role as chunk hashes in the reference,
    at sub-chunk granularity).
    """
    # Bind the n-gram hash array to a column first: ``__h`` is referenced
    # three times below, which stops CollapseProject from inlining the
    # n-gram + hash computation into the per-window lambda (that inlining
    # would re-hash the whole document once per window position).
    hashes = F.col("__h")
    nh = F.size(hashes)
    mins = F.when(nh <= window, F.array(F.array_min(hashes))).otherwise(
        F.transform(
            F.sequence(F.lit(0), nh - F.lit(window)),
            lambda i: F.array_min(F.slice(hashes, i + 1, window)),
        )
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.transform(char_ngrams(text_col, ngram), lambda g: F.hash(g)).alias("__h"),
    ).select(
        "doc_id",
        F.explode(F.array_distinct(mins)).alias("fingerprint"),
    )


def doc_fingerprints_fast(
    docs: DataFrame,
    ngram: int = 8,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing fingerprints, Arrow-vectorized fast path.

    Same shape as :func:`doc_fingerprints` (doc_id, fingerprint rows,
    distinct per doc) but the n-gram hashing runs in numpy instead of
    Catalyst higher-order functions — Spark evaluates ``transform``
    lambdas interpreted, per element, which made the expression version
    ~2.6 s/1.5 M n-grams at sf0.1; the Horner-scheme polynomial hash
    below is ``ngram`` shifted multiply-adds over the whole byte buffer.
    Fingerprint VALUES differ from the expression version (byte-level
    FNV-style hash vs Murmur3 over UTF-8 substrings); both are opaque
    64-bit identities, so consumers must not mix the two variants.
    """
    from pyspark.sql.functions import pandas_udf

    mult = np.uint64(1099511628211)  # FNV-1a prime: odd → bijective mod 2^64

    @pandas_udf("array<long>")
    def _winnow(texts: "pd.Series") -> "pd.Series":
        out = []
        for t in texts:
            if t is None:  # null text → no fingerprints (explode drops row)
                out.append([])
                continue
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            n = b.size
            if n == 0:
                out.append([])
                continue
            m = max(1, n - ngram + 1)
            h = np.zeros(m, dtype=np.uint64)
            for j in range(min(ngram, n)):
                h = h * mult + b[j : j + m]
            if m <= window:
                mins = h.min(keepdims=True)
            else:
                mins = np.lib.stride_tricks.sliding_window_view(h, window).min(
                    axis=1
                )
            out.append(np.unique(mins).view(np.int64))
        return pd.Series(out)

    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(_winnow(F.col(text_col))).alias("fingerprint"),
    )


def repetition_ratios(
    docs: DataFrame,
    ns: tuple[int, ...] = (2, 5),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition filters, long format: one row per
    (doc, n-gram size) with ``top_frac`` (share of the single most
    frequent word n-gram) and ``dup_frac`` (share of n-gram occurrences
    whose n-gram appears more than once). High values flag boilerplate /
    looping generations in a training corpus.

    Plan shape: ONE scan + ONE explode — the per-n shingle arrays are
    tagged with n and flattened into a single array before exploding, so
    the corpus is read and tokenized once regardless of ``len(ns)``
    (a union of per-n explodes would re-scan and re-split per n) — then
    two hash aggregates keyed by doc, the same partial-agg pattern as
    any word-count: shuffles only (doc_id, n, gram)-sized rows, never
    documents.
    """
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), words(text_col).alias("__ws")
    )
    # NB: the tag lambda must be unary — PySpark gives a two-parameter
    # HOF lambda (element, index), so a `lambda s, _n=n:` default-arg
    # closure would silently bind _n to the array INDEX.
    def _tag(_n: int):
        return lambda s: F.struct(F.lit(_n).cast("int").alias("n"), s.alias("g"))

    tagged = [
        F.transform(shingles_of_words(F.col("__ws"), n), _tag(n)) for n in ns
    ]
    grams = base.select(
        "doc_id", F.explode(F.flatten(F.array(*tagged))).alias("__x")
    ).select("doc_id", "__x.n", "__x.g")
    counts = grams.groupBy("doc_id", "n", "g").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.groupBy("doc_id", "n")
        .agg(
            F.sum("cnt").alias("total"),
            F.max("cnt").alias("top_cnt"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
                "dup_cnt"
            ),
        )
        .select(
            "doc_id",
            "n",
            F.col("total").cast("long").alias("total_ngrams"),
            F.round(F.col("top_cnt") / F.col("total"), 6).alias("top_frac"),
            F.round(F.col("dup_cnt") / F.col("total"), 6).alias("dup_frac"),
        )
    )


def lm_bigram_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cache_bigrams: bool = True,
) -> DataFrame:
    """Corpus-trained word-bigram language-model score per document:
    ``(doc_id, n_bigrams, avg_logprob)`` where ``avg_logprob`` is the
    mean natural-log MLE probability ln(c(w1,w2)/c(w1·)) over the doc's
    bigram occurrences. The statistical tier of quality scoring (the
    heuristic tier is ``quality_scores``): documents whose word
    transitions are unlike the corpus — gibberish, wrong-language
    fragments, mangled extractions — score far below typical text, so a
    percentile threshold on ``avg_logprob`` is a perplexity filter with
    no external model. Docs under two words carry no bigram and drop out.

    Plan shape: one scan explodes bigram rows; the model is two hash
    aggregates over those rows (bigram and prefix counts — both partial
    map-side); scoring joins the bigram rows back on (w1, w2). The model
    table is vocabulary-sized — orders smaller than the corpus — so AQE
    broadcasts it under the threshold, and the per-doc average is a final
    doc_id-keyed aggregate. Nothing document-sized ever shuffles.

    The bigram frame feeds THREE consumers (bigram counts, prefix
    counts, the scoring probe), so by default it is persisted
    (``cache_bigrams=True``) — the regex tokenization + explode run
    once instead of three times. Set ``cache_bigrams=False`` when
    executor storage is the scarcer resource (the exploded frame is
    ~2× corpus size) and re-scanning is cheaper than spilling.
    """
    ws = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), words(text_col).alias("__ws")
    ).where(F.size("__ws") >= 2)
    bi = ws.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(__ws) - 1),"
                " i -> struct(__ws[i-1] AS w1, __ws[i] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    if cache_bigrams:
        bi = bi.persist()
    bigram_c = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    prefix_c = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    model = bigram_c.join(prefix_c, "w1").select(
        "w1", "w2", F.log(F.col("c2") / F.col("c1")).alias("logp")
    )
    return (
        bi.join(model, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg("logp"), 6).alias("avg_logprob"),
        )
    )


def char_entropy_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Shannon character entropy in bits:
    ``(doc_id, n_chars, n_distinct_chars, entropy_bits)``. Natural text
    sits near 4 bits/char; ciphertext/compressed junk pushes toward the
    alphabet ceiling and template spam collapses toward 0 — both tails
    are curation drop candidates that the word-level scorers miss.

    Pure built-ins: one char explode (linear blow-up, stays columnar in
    codegen) and two keyed aggregates; entropy folds over the per-char
    frequencies with log2. No UDF, fully oracle-checkable.
    """
    chars = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.length(text_col).alias("n_chars"),
        F.explode(F.split(text_col, "")).alias("ch"),
    ).where(F.col("ch") != "")
    freq = chars.groupBy("doc_id", "n_chars", "ch").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    p = F.col("cnt") / F.col("n_chars")
    return freq.groupBy("doc_id").agg(
        F.first("n_chars").cast("long").alias("n_chars"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
        F.round(-F.sum(p * F.log2(p)), 6).alias("entropy_bits"),
    )


# Conservative PII patterns, chosen to parse identically under Java
# regex (Spark) and RE2 (DuckDB oracle): no lookarounds, no backrefs.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PII_PHONE = r"\+\d{9,15}"


def pii_scrub(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Detect and redact common PII before a corpus ships to training:
    ``(doc_id, n_emails, n_ipv4, n_phones, redacted_text)``. Emails,
    IPv4 literals, and international-format phone numbers are counted
    and replaced by ``<EMAIL>``/``<IP>``/``<PHONE>`` tokens. Patterns
    are deliberately conservative (international phones only — local
    formats drown in false positives); a production pipeline would add
    locale packs, but the operator contract and plan shape stay this:
    map-only regexp work inside codegen, no shuffle, no UDF.
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), F.lit(0)))
        .cast("long")
        .alias("n_ipv4"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), F.lit(0)))
        .cast("long")
        .alias("n_phones"),
        redacted.alias("redacted_text"),
    )


# Explicit character classes, identical bytes on the Spark (Java regex)
# and DuckDB (RE2) sides — the engines' \s / control-class shorthands
# differ (Java \s includes \x0B, RE2's does not), so cleaning semantics
# are pinned by enumeration, not shorthand.
CLEAN_CONTROL = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]"
CLEAN_WS_RUN = "[ \\t\\n\\r]+"


def clean_text(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Normalization pass an extraction pipeline runs before any scoring
    or dedup (Dolma/CCNet-style): strip control characters, collapse
    whitespace runs (including newlines) to single spaces, trim. Emits
    ``(doc_id, raw_len, clean_len, n_removed, clean_text)``.

    Map-only codegen ``regexp_replace`` chain — no shuffle, no Python;
    at 100 TB this fuses into the source scan stage. Dedup keyed on the
    CLEANED text catches trivially-reformatted copies that byte-exact
    dedup misses; run this ahead of ``exact_dedup``/``minhash_lsh``.

    NULL text is treated as empty (lengths 0, empty clean_text) — the
    same degenerate-input posture as the dedup paths.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    cleaned = F.trim(
        F.regexp_replace(F.regexp_replace(t, CLEAN_CONTROL, ""), CLEAN_WS_RUN, " ")
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.length(t).cast("long").alias("raw_len"),
        F.length(cleaned).cast("long").alias("clean_len"),
        (F.length(t) - F.length(cleaned)).cast("long").alias("n_removed"),
        cleaned.alias("clean_text"),
    )
