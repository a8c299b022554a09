"""Oracle-verified relational suite + snapshot-diff queries."""

from __future__ import annotations

import pytest

from cdc_algorithms_spark import queries as registry
from tests.oracle import compare_with_oracle

RELATIONAL = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "brand_volume",
    "top_order_per_customer",
    "events_json_stats",
    "user_sessions",
    "purchase_and_error_users",
    "docs_rollup",
    "docs_grouping_sets",
    "price_quantiles",
    "q4_order_priority",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "orders_above_global_avg",
    "suppliers_above_nation_avg",
    "events_pivot_by_type",
    "sliding_event_value",
    "rolling_7d_user_value",
    "customer_balance_quartiles",
    "events_props_map_stats",
    "snapshot_diff_fixed",
    "change_ratio_fixed",
    "sync_plan_fixed",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_oracle_equivalence(spark, name):
    compare_with_oracle(spark, name, "/root/testdata/sf0.001")


def test_all_registered(spark):
    for name in RELATIONAL:
        assert name in registry.SPARK_QUERIES
        assert name in registry.ORACLE_SQL or name == "snapshot_diff_ae"


def test_events_hourly_locf_matches_oracle(spark):
    from tests.conftest import SF_DIR
    from tests.oracle import compare_with_oracle

    compare_with_oracle(spark, "events_hourly_locf", SF_DIR)


def test_profile_orders_oracle(spark):
    from tests.oracle import compare_with_oracle

    compare_with_oracle(spark, "profile_orders", "/root/testdata/sf0.001")


def test_profile_approx_mode_no_expand(spark):
    """Scale mode: approx sketches keep the plan Expand-free."""
    from cdc_algorithms_spark.operators.profile import profile_table
    from cdc_algorithms_spark.sources.registry import load_table
    from cdc_algorithms_spark import plans as P

    df = profile_table(load_table(spark, "orders", "/root/testdata/sf0.001"))
    assert "Expand" not in P.physical_plan(df, "simple")
    assert df.count() == 6  # all orders columns


def test_events_variant_stats_oracle(spark):
    from tests.oracle import compare_with_oracle

    compare_with_oracle(spark, "events_variant_stats", "/root/testdata/sf0.001")
