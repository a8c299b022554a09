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
    """
    ws = words(text)
    k = F.size(ws)
    return F.when(k <= n, F.array(F.array_join(ws, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - F.lit(n)),
            lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
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
