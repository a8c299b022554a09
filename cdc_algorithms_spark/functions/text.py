"""Text primitives as Catalyst expressions (no UDFs).

``words``/``word_shingles``/``char_ngrams`` feed the document-dedup and
fingerprinting operators; keeping them as higher-order-function
expressions means Catalyst can pipeline them inside whole-stage codegen
and the DuckDB oracle can mirror them with list functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words(text: Column | str) -> Column:
    """Whitespace tokenization with empty-token filtering."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda w: w != "")


def word_shingles(text: Column | str, n: int) -> Column:
    """n-word shingles: contiguous word windows joined by a single space.

    Documents shorter than n words produce one shingle of all words, so
    no document silently drops out of dedup.

    PERFORMANCE: this composes ``words`` (a regex split) INSIDE the
    shingle transform's lambda, so Catalyst re-evaluates the split per
    shingle — O(words²) regex work per row. Operators on the hot path
    must bind the word array to a column first and use
    :func:`shingles_of_words` (see ``operators/dedup_docs.py``); this
    convenience form is for ad-hoc/small-input use.
    """
    return shingles_of_words(words(text), n)


def shingles_of_words(ws: Column, n: int) -> Column:
    """n-word shingles over an already-computed word array.

    Pass a *bound column* (e.g. ``F.col("__ws")`` from a previous
    select), not an inline expression: ``ws`` is referenced four times
    here, which doubles as the CollapseProject barrier that keeps the
    upstream split materialized once per row instead of inlined into
    the per-shingle lambda.
    """
    k = F.size(ws)
    return F.when(k <= n, F.array(F.array_join(ws, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - F.lit(n)),
            # element_at + concat_ws, NOT array_join(slice(...)): the
            # slice form allocates an array per shingle and measures
            # ~3x slower on 300-word docs; the unrolled element reads
            # produce identical strings with no per-shingle allocation
            lambda i: F.concat_ws(
                " ", *[F.element_at(ws, i + 1 + j) for j in range(n)]
            ),
        )
    )


def char_ngrams(text: Column | str, n: int) -> Column:
    """Character n-grams (the chunker-free fingerprint basis)."""
    c = F.col(text) if isinstance(text, str) else text
    ln = F.length(c)
    return F.when(ln <= n, F.array(c)).otherwise(
        F.transform(
            F.sequence(F.lit(0), ln - F.lit(n)),
            lambda i: c.substr(i + 1, F.lit(n)),
        )
    )
