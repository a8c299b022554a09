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


def test_merges_to_exhaustion_equal_reference(spark):
    """Driver-side learning at a production-scale request: the learner
    runs to the vocabulary's fixpoint (every word one symbol — no pairs
    left) and the ENTIRE table equals the from-scratch reference, not
    just a 10-merge prefix. Also pins the fixpoint semantics: the run
    stops exactly when no pair remains."""
    docs = _docs(spark)
    wc = {r["word"]: r["wc"] for r in word_freq_table(docs).collect()}
    got = learn_bpe(docs, 100_000)
    assert got == _reference_bpe(wc, 100_000)
    assert 0 < len(got) < 100_000  # fixture vocab exhausts
    # fixpoint reached: re-requesting more merges returns the same table
    assert learn_bpe(docs, len(got) + 500) == got


def test_learn_bpe_prefix_stability():
    """Greedy BPE is prefix-stable: the first k merges of a larger run
    equal the k-merge run — the property that makes a cached merge
    table extensible. Pure driver-side check (learn_bpe_from_counts),
    plus the incremental bookkeeping staying exact through count
    INCREASES (a merge can create a more frequent pair: 'abab...' makes
    (ab,ab) spike after (a,b) merges)."""
    from cdc_algorithms_spark.operators.bpe import learn_bpe_from_counts

    vocab = [
        ("abababab", 7),
        ("ababx", 5),
        ("xyxyxy", 6),
        ("zq", 3),
        ("aabb", 2),
    ]
    full = learn_bpe_from_counts(vocab, 50)
    for k in (1, 2, 3, 5, len(full)):
        assert learn_bpe_from_counts(vocab, k) == full[:k]
    # cross-check the whole table against the from-scratch reference
    assert full == _reference_bpe(dict(vocab), 50)


def test_learn_bpe_vocab_caps(spark):
    """min_count / max_vocab bound the driver transfer: capping to the
    top-n words learns exactly what the reference learns on that
    truncated vocabulary."""
    docs = _docs(spark)
    rows = sorted(
        word_freq_table(docs).collect(),
        key=lambda r: (-r["wc"], r["word"]),
    )
    top = {r["word"]: r["wc"] for r in rows[:10]}
    assert learn_bpe(docs, 20, max_vocab=10) == _reference_bpe(top, 20)
    kept = {r["word"]: r["wc"] for r in rows if r["wc"] >= 3}
    assert learn_bpe(docs, 20, min_count=3) == _reference_bpe(kept, 20)


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
