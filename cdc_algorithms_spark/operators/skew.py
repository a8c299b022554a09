"""Skew mitigation utilities.

AQE's runtime skew-join splitting (enabled in session.py) handles most
cases; these explicit tools cover the two situations AQE cannot:

* a *broadcast-ineligible* join against a hot-keyed dimension where the
  skew is known ahead of time (``salted_join`` — salt the fact side,
  replicate the dimension side);
* a groupBy whose per-key state is itself heavy (e.g. ``collect_set`` of
  a hot key), where map-side partial aggregation doesn't shrink the
  shuffle (``salted_two_phase_agg``).

Chunk-hash dedup specifically does NOT need salting: xxhash64 keys are
uniform by construction — the dedup shuffle is balanced at any scale.
Salting matters for *semantic* keys (user ids, shingles, band hashes)
whose frequency follows the data.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys in ``fact``.

    The fact side gets a uniform random salt in ``[0, num_salts)``; the
    dim side is replicated ``num_salts`` times (explode of a sequence) so
    every (key, salt) pair exists. The shuffle then distributes each hot
    key over ``num_salts`` reducers instead of one. Cost: dim side
    shuffles ``num_salts×`` its size — use for small-but-not-broadcastable
    dimensions.

    The salt is non-deterministic per fact row, which is safe: it only
    routes rows, the join result is salt-independent.

    Only fact-preserving modes are legal: a right/full outer join would
    emit every UNMATCHED dim row once per salt replica (``num_salts``
    phantom rows), so those modes are rejected.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join supports fact-preserving modes only, got how={how!r}: "
            "the salt-replicated dim side would duplicate unmatched dim rows "
            "num_salts times under right/full outer joins"
        )
    salted_fact = fact.withColumn(
        "__salt", (F.rand() * num_salts).cast("int")
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    out = salted_fact.join(salted_dim, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def salted_two_phase_agg(
    df: DataFrame,
    key: str,
    partial_aggs: list[Column],
    final_aggs: Callable[[DataFrame], list[Column]],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy (key, salt) first, then merge the
    per-salt partials per key. Splits a hot key's reduce-side state
    across ``num_salts`` tasks.

    ``partial_aggs`` aggregate raw rows within (key, salt);
    ``final_aggs(partials_df)`` merges the partial columns per key.
    """
    salted = df.withColumn("__salt", (F.rand() * num_salts).cast("int"))
    partial = salted.groupBy(key, "__salt").agg(*partial_aggs)
    return partial.groupBy(key).agg(*final_aggs(partial))
