"""Physical-plan inspection (the 100 TB design gate).

The reference has no planner (SURVEY.md §4.1); ours is Catalyst, so the
engine's scale guarantees — filters reaching the parquet scan, small
dimensions broadcast, no Python in relational hot paths, bounded shuffle
count — are properties OF THE PLAN. This module makes them assertable,
and tests/test_plans.py pins them so a regression that silently
de-optimizes a query (e.g. a cast that blocks pushdown) fails CI rather
than surfacing as a 10× slowdown at scale.
"""

from cdc_algorithms_spark.plans.inspect import (
    broadcast_hint_count,
    broadcast_join_count,
    sort_merge_join_count,
    codegen_stage_count,
    exchange_count,
    physical_plan,
    pushed_filters,
    python_eval_count,
    read_schema_columns,
    window_partition_columns,
)

__all__ = [
    "physical_plan",
    "exchange_count",
    "broadcast_hint_count",
    "broadcast_join_count",
    "sort_merge_join_count",
    "pushed_filters",
    "read_schema_columns",
    "python_eval_count",
    "codegen_stage_count",
    "window_partition_columns",
]
