"""Deterministic train/val/test split assignment + near-dup leakage.

A training pipeline has to carve the corpus into train/validation/test
splits such that (a) the assignment is reproducible — re-running the
pipeline on the same corpus yields the same split for every document —
and (b) held-out splits are not contaminated by near-duplicates of
training documents (a J>=0.8 near-copy of a test doc in train inflates
eval scores exactly like verbatim leakage).

Three operators:

* :func:`split_assignment` — MAP-ONLY hash-threshold assignment: each
  doc gets a uniform key from the same integer LCG as
  ``operators/shuffle.py`` (exact in both Spark and DuckDB, unlike
  ``xxhash64``), and the cumulative split fractions become INTEGER key
  thresholds, so no float comparison sits on a split boundary. Zero
  shuffles, zero joins — the plan is a projection, which is the 100 TB
  answer: split assignment must never cost a pass over the corpus
  beyond the read. Proportions are exact in expectation (hash
  thresholding), not quota-exact — quota-exact assignment needs a
  global rank (see ``deterministic_shuffle``) and is rarely worth one
  total-order shuffle for a 90/5/5 carve.

* :func:`split_leakage` — the audit: near-dup pairs (from any of the
  pair generators: exact Jaccard, MinHash+LSH, SimHash) whose two docs
  landed in DIFFERENT splits. The pair list is bounded (near-dup pairs,
  not all pairs), so the plan semi-joins the corpus-sized assignment
  down to the touched ids first and broadcasts from there — the corpus
  is scanned once, the joins are pair-list-sized.

* :func:`cluster_safe_split_assignment` — the fix: assign whole
  near-dup CLUSTERS, not documents. Every doc keys its split off its
  connected-component representative (minimum doc id in the component;
  singleton docs are their own representative), so a near-dup pair can
  never straddle splits — leakage is zero by construction, not by
  audit. The component frame is bounded by docs-that-have-a-near-dup
  (tiny vs the corpus), so it broadcasts into one map-side left join.

Reference scope note: the reference engine (/root/reference, Rust CDC
chunkers) has no split machinery; this is part of the training-data
pipeline surface the task brief mandates alongside SURVEY.md §2.5.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.shuffle import _LCG_M, shuffle_key

DEFAULT_FRACTIONS: tuple[tuple[str, float], ...] = (
    ("train", 0.8),
    ("val", 0.1),
    ("test", 0.1),
)


def split_thresholds(
    fractions: Sequence[tuple[str, float]] = DEFAULT_FRACTIONS,
) -> list[tuple[str, int]]:
    """Cumulative INTEGER key thresholds over the LCG's 2^31 ring.

    ``[(name, upper_bound)]`` — a doc with key ``k`` belongs to the
    first split with ``k < upper_bound``; the last split's bound is
    forced to 2^31 so the fractions need not sum to exactly 1.0 after
    float rounding. Integer bounds make the Spark and DuckDB CASE
    expressions bit-identical (no float-boundary docs).
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for name, frac in fractions:
        if frac < 0:
            raise ValueError(f"negative fraction for split {name!r}")
        acc += frac
        bounds.append((name, int(acc * _LCG_M)))
    if abs(acc - 1.0) > 1e-9:
        raise ValueError(f"fractions sum to {acc}, expected 1.0")
    bounds[-1] = (bounds[-1][0], _LCG_M)
    return bounds


def _split_case(key_col, bounds: list[tuple[str, int]]):
    # WHEN k < t1 THEN s1 WHEN k < t2 THEN s2 ... ELSE s_last
    expr = None
    for name, upper in bounds[:-1]:
        cond = key_col < F.lit(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(bounds[-1][0])
    return last if expr is None else expr.otherwise(last)


def split_assignment(
    docs: DataFrame,
    fractions: Sequence[tuple[str, float]] = DEFAULT_FRACTIONS,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """``docs`` + a ``split`` column. Map-only (pure projection): the
    LCG key of ``id_col`` against integer cumulative thresholds."""
    bounds = split_thresholds(fractions)
    return docs.withColumn(
        "split", _split_case(shuffle_key(id_col, seed), bounds)
    )


def split_leakage(
    assignment: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup pairs straddling two different splits: ``pairs`` columns
    + ``split_a``/``split_b``. ``assignment`` must carry ``split``.

    Plan shape: the corpus-sized ``assignment`` is semi-joined down to
    the ids the (bounded) pair list touches, then the tiny result joins
    the pairs twice via broadcast — one scan of the corpus, no
    corpus-sized shuffle.
    """
    from cdc_algorithms_spark.operators.dedup_docs import _persist

    # one explode, not union(select(a), select(b)): the union form
    # executes the (often expensive, unpersisted) pair pipeline once per
    # branch — same fix as connected_components' edge symmetrization
    touched = (
        pairs.select(
            F.explode(F.array(F.col(id_a), F.col(id_b))).alias(id_col)
        ).distinct()
    )
    # persisted: `small` feeds BOTH broadcast sides below — without it
    # each side re-executes the lineage, scanning the corpus-sized
    # assignment twice. It is pair-list-sized, so the cache is tiny
    # (release via dedup_docs.release_cached_frames between pipelines).
    small = _persist(
        assignment.select(F.col(id_col), "split").join(
            F.broadcast(touched), id_col, "left_semi"
        )
    )
    a = F.broadcast(small.withColumnRenamed(id_col, id_a).withColumnRenamed("split", "split_a"))
    b = F.broadcast(small.withColumnRenamed(id_col, id_b).withColumnRenamed("split", "split_b"))
    return (
        pairs.join(a, id_a).join(b, id_b)
        .where(F.col("split_a") != F.col("split_b"))
    )


def cluster_safe_split_assignment(
    docs: DataFrame,
    pairs: DataFrame,
    fractions: Sequence[tuple[str, float]] = DEFAULT_FRACTIONS,
    seed: int = 0,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """``docs`` + ``split``, keyed on the near-dup CLUSTER representative
    (connected-component min id; singletons key on themselves), so no
    near-dup pair can straddle splits — leakage is structurally zero.

    The component frame is bounded by docs-with-a-near-dup, so it
    broadcasts; the corpus join stays map-side.

    Stability note: :func:`split_assignment` is stable under corpus
    growth (a doc's split depends only on its own id), which is the
    property production pipelines rely on to extend a corpus without
    re-carving it. THIS variant is deterministic given the final pair
    graph but NOT growth-stable: a new document can bridge two existing
    clusters, merging them and re-keying one side's members — the
    unavoidable price of the zero-leakage guarantee (if the merged
    cluster kept both splits, the bridging pair would leak). Pipelines
    that need both properties freeze holdout membership at carve time
    and route later near-dups of ANY held-out doc to that doc's split.
    """
    from cdc_algorithms_spark.operators.dedup_docs import connected_components

    comp = connected_components(pairs, id_a=id_a, id_b=id_b)
    bounds = split_thresholds(fractions)
    rep = F.coalesce(F.col("component_id"), F.col(id_col).cast("long"))
    return (
        docs.join(
            F.broadcast(comp.withColumnRenamed("doc_id", id_col)),
            id_col,
            "left",
        )
        .withColumn("__rep", rep)
        .withColumn("split", _split_case(shuffle_key("__rep", seed), bounds))
        .drop("component_id", "__rep")
    )
