"""Helpers to read a DataFrame's physical plan as data.

All helpers parse the formatted explain output (same text
``df.explain("formatted")`` prints). They are test/diagnostic utilities
— nothing here runs in the data path.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The explain text for ``df`` (without printing it)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def broadcast_hint_count(df: DataFrame) -> int:
    """How many joins in the OPTIMIZED LOGICAL plan carry an explicit
    broadcast hint (``F.broadcast``/``/*+ BROADCAST */``). Distinct
    from :func:`broadcast_join_count`, which also counts size-based
    choices the CBO makes on small test data — a forced hint is a
    100 TB liability (driver OOM) even where the CBO pick is fine."""
    plan = physical_plan(df, "extended")
    # hints survive into the optimized plan as join annotations, e.g.
    #   Join Inner, (term = term), rightHint=(strategy=broadcast)
    m = re.search(r"== Optimized Logical Plan ==\n(.*?)\n== Physical", plan, re.S)
    text = m.group(1) if m else plan
    return len(re.findall(r"strategy=broadcast", text))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan — each is a full
    repartition of its input over the network at scale. Broadcast
    exchanges are excluded (they ship only the small side)."""
    plan = physical_plan(df, "simple")
    return len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", plan))


def broadcast_join_count(df: DataFrame) -> int:
    """Number of broadcast hash/nested-loop joins (small side shipped to
    every executor; no shuffle of the big side)."""
    plan = physical_plan(df, "simple")
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))


def sort_merge_join_count(df: DataFrame) -> int:
    """Number of sort-merge joins — each sorts BOTH shuffled sides; the
    witness that a join expected to broadcast fell back to the heavy
    strategy."""
    plan = physical_plan(df, "simple")
    return len(re.findall(r"SortMergeJoin", plan))


def pushed_filters(df: DataFrame) -> list[str]:
    """The ``PushedFilters`` lists from every parquet scan in the plan.

    Greedy to the line's LAST ``]``: a filter like ``In(id, [1,2])``
    contains its own bracket, and a lazy ``[^\\]]*`` would truncate the
    list at it (the line holds nothing after the filter list)."""
    plan = physical_plan(df, "formatted")
    return re.findall(r"PushedFilters: \[(.*)\]", plan)


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside ``<>`` (struct/array/map types)."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column names each parquet scan actually reads (``ReadSchema``) —
    the column-pruning witness: a 2-column projection must not scan 16.
    Nested types (``array<...>``, ``map<...>``) carry their own ``<>``
    and commas, so the struct body is taken greedily to the line's last
    ``>`` and split only at top-level commas."""
    plan = physical_plan(df, "formatted")
    out = []
    for m in re.findall(r"ReadSchema: struct<(.*)>", plan):
        out.append(
            [c.split(":")[0].strip() for c in _split_top_level(m) if c.strip()]
        )
    return out


def python_eval_count(df: DataFrame) -> int:
    """Number of Python-evaluation operators (BatchEvalPython = row
    UDFs, ArrowEvalPython = pandas UDFs, MapInPandas/FlatMapGroupsInPandas
    included). Relational queries must report 0 — Python belongs only to
    the chunker surface."""
    plan = physical_plan(df, "simple")
    return len(
        re.findall(
            r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
            plan,
        )
    )


def window_partition_columns(df: DataFrame) -> list[list[str]]:
    """Partition-key column names of every Window operator in the plan —
    the skew witness: a window keyed by raw content (e.g. document
    ``text``) lands every copy of a hot duplicate on one task, and a
    window keyed by a handful-of-values column alone (e.g. ``lang``
    over raw rows) caps parallelism at the key cardinality."""
    plan = physical_plan(df, "simple")
    out: list[list[str]] = []
    for line in plan.splitlines():
        if "Window [" not in line:
            continue
        groups = re.findall(r"\[([^\[\]]*)\]", line)
        # Partitioned:  Window [exprs], [partition], [order] → 3 groups.
        # Global:       Window [exprs], [order]              → 2 groups
        # (Spark omits the empty partition list entirely — taking
        # groups[-2] there would return the window EXPRESSIONS as
        # phantom "partition columns"). A global window is reported as
        # an explicit [] so skew assertions see the worst case.
        if len(groups) >= 3:
            part = groups[-2]
            cols = [
                re.sub(r"#\d+L?$", "", c.strip())
                for c in part.split(",")
                if c.strip()
            ]
            out.append(cols)
        elif len(groups) == 2:
            out.append([])
    return out


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen spans (wider is generally better —
    fused JVM loops with no row materialization between operators)."""
    # AQE wraps the plan in AdaptiveSparkPlan, which reports 0 codegen
    # subtrees before execution — plan without AQE for the inspection
    # (physical planning happens lazily per explain call, so toggling
    # the conf here does not affect how the DataFrame later executes).
    # A no-op filter derives a fresh QueryExecution (the old one caches
    # its physical plan, so toggling the conf alone wouldn't replan).
    from pyspark.sql import functions as F

    fresh = df.where(F.lit(True))
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = physical_plan(fresh, "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0
