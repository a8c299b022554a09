"""BPE tokenizer induction at corpus scale.

Byte-pair encoding (Sennrich et al. 2016) learns a tokenizer by
repeatedly merging the most frequent adjacent symbol pair — the
training-data pipeline's third content-defined iterative computation,
next to CDC cut derivation (chunkers/) and k-means (similarity.py),
and it distributes the same way:

* The corpus collapses to the DISTINCT-WORD frequency table first
  (classic BPE trains on word counts, not the token stream) — Spark
  does exactly the corpus-sized work (one tokenize + one aggregate)
  and nothing iterative.
* Merge selection then runs DRIVER-SIDE over the collected
  vocabulary-sized frame with incremental pair-count maintenance and
  a lazy max-heap (:func:`learn_bpe_from_counts`) — ~32k production
  merges are pure in-memory arithmetic. The earlier design ran two
  Spark jobs + a 1-row collect per merge round; at ~3 s of job-launch
  overhead per round on a 50k-row frame, a 32k-merge tokenizer was
  ~27 h of scheduler time for work a laptop does in seconds. Lloyd
  iterations (similarity.py) stay in Spark because each round scans
  the CORPUS; BPE rounds scan the VOCABULARY, which fits on the
  driver by construction — the fold already collapsed the corpus.
* ``min_count`` / ``max_vocab`` bound the driver transfer for corpora
  whose raw vocabulary (URLs, typos) outgrows memory — standard BPE
  pre-pruning, off by default.
* Encoding (:func:`bpe_encode`) stays fully distributed: stacked
  higher-order-function folds, no UDF, no shuffle of document
  content.

Determinism: the argmax tiebreak is (count DESC, left ASC, right ASC)
and the merge fold is the standard greedy leftmost-nonoverlapping
scan, so the learned table is a pure function of the corpus —
pinned against an independent from-scratch reference implementation
in tests/test_bpe.py (merge selection is iterative and
content-defined, hence not SQL-expressible; the FIRST round's pair
counts are, and the `bpe_pair_counts` driver row oracle-checks
exactly that stage).
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


def learn_bpe_from_counts(
    word_counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Learn merges from a (word, count) vocabulary in memory:
    incremental pair-count maintenance + a lazy max-heap, the standard
    fast BPE trainer. Each round touches only the words containing the
    merged pair (their old pairs are subtracted, the merge applied
    greedy-leftmost, the new pairs added — exact bookkeeping, so the
    counts equal a from-scratch recount every round); the heap pops
    stale entries lazily and the key ``(-count, left, right)`` IS the
    (count DESC, left ASC, right ASC) selection order. ~32k merges
    over a 100k-word vocabulary are seconds of driver CPU.

    Determinism contract: the ASC tie-break compares Python strings,
    i.e. Unicode CODE POINTS. That differs from Spark/Java's ``F.asc``
    (UTF-16 code units) exactly when a vocabulary mixes
    supplementary-plane symbols (≥ U+10000) with U+E000–U+FFFF: code
    points order the BMP private-use/CJK-compat range BELOW the
    supplementary planes, UTF-16 code units order it ABOVE (surrogates
    start at 0xD800). The merge table is therefore deterministic and
    reproducible under THIS trainer, but a count-tied merge over such a
    vocabulary may differ from a SQL-side recomputation; normalize to a
    byte-wise UTF-8 comparison on both engines if cross-engine parity
    of the merge table itself ever matters (UTF-8 bytes and code points
    order identically, so this trainer is already UTF-8-byte-order
    consistent — the caveat is only about Spark's UTF-16 F.asc)."""
    import heapq

    words = [list(w) for w, _ in word_counts]
    wcs = [int(c) for _, c in word_counts]
    counts: dict[tuple[str, str], int] = {}
    holders: dict[tuple[str, str], set[int]] = {}
    for i, (syms, wc) in enumerate(zip(words, wcs)):
        for p in zip(syms, syms[1:]):
            counts[p] = counts.get(p, 0) + wc
            holders.setdefault(p, set()).add(i)
    heap = [(-c, l, r) for (l, r), c in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = None
        while heap:
            negc, l, r = heap[0]
            if counts.get((l, r), 0) == -negc:
                best = (l, r, -negc)
                heapq.heappop(heap)
                break
            heapq.heappop(heap)  # stale: count changed since push
        if best is None:
            break
        left, right, cnt = best
        merges.append((rank, left, right, cnt))
        merged = left + right
        pair = (left, right)
        touched: set[tuple[str, str]] = set()
        for i in sorted(holders.get(pair, ())):
            syms, wc = words[i], wcs[i]
            if not any(
                a == left and b == right for a, b in zip(syms, syms[1:])
            ):
                continue  # stale membership from an earlier rewrite
            for p in zip(syms, syms[1:]):
                counts[p] -= wc
                touched.add(p)
            out: list[str] = []
            j = 0
            while j < len(syms):
                if (
                    j + 1 < len(syms)
                    and syms[j] == left
                    and syms[j + 1] == right
                ):
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for p in zip(out, out[1:]):
                counts[p] = counts.get(p, 0) + wc
                holders.setdefault(p, set()).add(i)
                touched.add(p)
        holders.pop(pair, None)
        for p in touched:
            c = counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p[0], p[1]))
    return merges


def learn_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 1,
    max_vocab: int | None = None,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges: [(merge_rank, left, right,
    pair_count), ...] in learned order.

    Spark does the corpus-sized fold (one tokenize + one aggregate to
    the distinct-word frequency table); the iteration happens on the
    driver over the collected vocabulary
    (:func:`learn_bpe_from_counts`) — the frame is vocabulary-sized by
    construction, and per-round Spark job launches would dominate a
    production merge count by orders of magnitude (module docstring).

    The collect is the one driver transfer; for corpora whose raw
    vocabulary outgrows driver memory, ``min_count`` drops hapax-class
    noise (URLs, typos) and ``max_vocab`` keeps the top-N words by
    (count DESC, word ASC) — Spark plans that cap as
    TakeOrderedAndProject, never a full sort. Defaults change
    nothing."""
    wf = word_freq_table(docs, text_col)
    if min_count > 1:
        wf = wf.where(F.col("wc") >= min_count)
    if max_vocab is not None:
        wf = wf.orderBy(F.desc("wc"), F.asc("word")).limit(max_vocab)
    rows = wf.collect()
    return learn_bpe_from_counts(
        [(r["word"], int(r["wc"])) for r in rows], n_merges
    )


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
