"""BPE tokenizer induction at corpus scale.

Byte-pair encoding (Sennrich et al. 2016) learns a tokenizer by
repeatedly merging the most frequent adjacent symbol pair — the
training-data pipeline's third content-defined iterative computation,
next to CDC cut derivation (chunkers/) and k-means (similarity.py),
and it distributes the same way:

* The corpus collapses to the DISTINCT-WORD frequency table first
  (classic BPE trains on word counts, not the token stream) — the
  frame that iterates is vocabulary-sized, not corpus-sized.
* Each round is two Catalyst-only jobs over that frame: a weighted
  adjacent-pair count (explode + sum, map-side combinable) and a
  1-row argmax collect; the merge applies as a higher-order-function
  fold — no UDF anywhere, no shuffle of document content, driver
  traffic is one (pair, count) row per round.
* Like Lloyd iterations, rounds are O(n_merges) Spark jobs; the symbol
  frame is re-persisted per round so lineage stays flat.

Determinism: the argmax tiebreak is (count DESC, left ASC, right ASC)
and the merge fold is the standard greedy leftmost-nonoverlapping
scan, so the learned table is a pure function of the corpus —
pinned against a pure-Python reference implementation in
tests/test_bpe.py (merge selection is iterative and content-defined,
hence not SQL-expressible; the FIRST round's pair counts are, and the
`bpe_pair_counts` driver row oracle-checks exactly that stage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cdc_algorithms_spark.functions.text import words


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc): distinct lowercased words with corpus counts."""
    return (
        docs.select(F.explode(words(text_col)).alias("w"))
        .select(F.lower("w").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _init_symbols(word: Column) -> Column:
    """word → array of single-character symbols (split by '' is clean:
    no empty leading/trailing element in either engine)."""
    return F.split(word, "")


def _adjacent_pairs(syms: Column) -> Column:
    """Adjacent (left, right) structs; empty for 1-symbol words
    (sequence() descends when start > stop, so the guard is load-
    bearing, not cosmetic)."""
    k = F.size(syms)
    return F.when(
        k >= 2,
        F.transform(
            F.sequence(F.lit(1), k - F.lit(1)),
            lambda i: F.struct(
                F.element_at(syms, i).alias("left"),
                F.element_at(syms, i + 1).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))


def pair_counts(sym_words: DataFrame) -> DataFrame:
    """(left, right, pair_count) over a (__syms, wc) frame — each word's
    adjacent pairs weighted by its corpus count."""
    return (
        sym_words.select(
            F.explode(_adjacent_pairs(F.col("__syms"))).alias("__p"), "wc"
        )
        .groupBy("__p.left", "__p.right")
        .agg(F.sum("wc").cast("long").alias("pair_count"))
    )


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Greedy leftmost-nonoverlapping merge of (left, right) → left+right
    as a fold: append each symbol unless it completes the pair with the
    accumulator's tail, in which case the tail is replaced by the merged
    symbol. 'aaa' under (a,a) gives [aa, a] — standard BPE."""
    merged = left + right
    empty = F.array().cast("array<string>")
    return F.aggregate(
        syms,
        empty,
        lambda acc, s: F.when(
            (F.size(acc) >= 1)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - F.lit(1)),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def learn_bpe(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges: [(merge_rank, left, right,
    pair_count), ...] in learned order. Driver traffic is ONE row per
    round (the argmax pair); the iterating frame is the distinct-word
    table with symbol arrays, re-persisted per round."""
    sym_words = (
        word_freq_table(docs, text_col)
        .select(_init_symbols(F.col("word")).alias("__syms"), "wc")
        .persist()
    )
    sym_words.count()
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            top = (
                pair_counts(sym_words)
                .orderBy(
                    F.desc("pair_count"), F.asc("left"), F.asc("right")
                )
                .limit(1)
                .collect()
            )
            if not top or top[0]["pair_count"] is None:
                break
            left, right, cnt = (
                top[0]["left"], top[0]["right"], int(top[0]["pair_count"])
            )
            merges.append((rank, left, right, cnt))
            nxt = sym_words.select(
                _apply_merge(F.col("__syms"), left, right).alias("__syms"),
                "wc",
            ).persist()
            nxt.count()
            sym_words.unpersist()
            sym_words = nxt
    finally:
        sym_words.unpersist()
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """(word, wc, tokens): the distinct-word table encoded with a
    learned merge list, applied in learned order — the standard BPE
    encoder restated as stacked folds. Reassembling ``tokens`` by
    concatenation restores ``word`` exactly (pinned in tests — the
    byte-conservation analogue of the chunkers' concat checks)."""
    wf = word_freq_table(docs, text_col)
    syms = _init_symbols(F.col("word"))
    for _rank, left, right, _cnt in merges:
        syms = _apply_merge(syms, left, right)
    return wf.select("word", "wc", syms.alias("tokens"))
