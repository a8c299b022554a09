"""BPE tokenizer induction (operators/bpe.py).

The merge table is content-defined and iterative (not SQL-expressible),
so its oracle is a pure-Python reference implementation run on the
collected word-frequency table — exact equality, every round — plus the
conservation law: encoding any word with the learned merges and
concatenating the tokens restores the word byte-for-byte (the text
analogue of the chunkers' concat checks).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.bpe import (
    bpe_encode,
    learn_bpe,
    word_freq_table,
)
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Sennrich-style reference: greedy leftmost merge application,
    argmax by (count DESC, left ASC, right ASC)."""
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            wc = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += wc
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((rank, left, right, cnt))
        merged = left + right
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_learned_merges_equal_reference(spark):
    docs = _docs(spark)
    wc = {
        r["word"]: r["wc"] for r in word_freq_table(docs).collect()
    }
    got = learn_bpe(docs, 10)
    assert got == _reference_bpe(wc, 10)
    assert len(got) == 10
    # counts are non-increasing is NOT guaranteed by BPE (a merge can
    # create a more frequent pair), but every count is positive
    assert all(cnt > 0 for _, _, _, cnt in got)


def test_encode_conserves_bytes_and_compresses(spark):
    docs = _docs(spark)
    merges = learn_bpe(docs, 10)
    enc = bpe_encode(docs, merges)
    bad = enc.where(
        F.array_join("tokens", "") != F.col("word")
    ).count()
    assert bad == 0, "token concatenation must restore every word"
    # the merges actually fire: total symbol count strictly drops
    before = enc.agg(F.sum(F.length("word") * F.col("wc"))).first()[0]
    after_syms = enc.agg(F.sum(F.size("tokens") * F.col("wc"))).first()[0]
    assert after_syms < before


def test_merge_table_deterministic_under_repartition(spark):
    docs = _docs(spark)
    assert learn_bpe(docs, 6) == learn_bpe(docs.repartition(13, "lang"), 6)


def test_greedy_leftmost_fold_semantics(spark):
    """'aaa' under merge (a,a) → [aa, a]; chained merges compose in
    learned order."""
    docs = spark.createDataFrame(
        [(1, "aaa aaa ab")], "doc_id long, text string"
    )
    enc = {
        r["word"]: list(r["tokens"])
        for r in bpe_encode(docs, [(1, "a", "a", 0)]).collect()
    }
    assert enc["aaa"] == ["aa", "a"]
    assert enc["ab"] == ["a", "b"]
    enc2 = {
        r["word"]: list(r["tokens"])
        for r in bpe_encode(
            docs, [(1, "a", "a", 0), (2, "aa", "a", 0)]
        ).collect()
    }
    assert enc2["aaa"] == ["aaa"]
