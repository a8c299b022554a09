from cdc_algorithms_spark.functions.arrays import (
    cosine_similarity,
    dot_product,
    l2_norm,
)
from cdc_algorithms_spark.functions.text import (
    char_ngrams,
    word_shingles,
    words,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "words",
    "word_shingles",
    "char_ngrams",
]
