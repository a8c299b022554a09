"""Extended TPC-H-pattern queries (queries_tpch_extra.py) vs DuckDB oracles."""

from __future__ import annotations

import pytest

from cdc_algorithms_spark import queries as registry
from tests.oracle import compare_with_oracle

TPCH_EXTRA = [
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q10_returned_items",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q19_disjunctive_revenue",
    "q2_cheapest_supplier",
    "q22_idle_rich_customers",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q12_late_priority",
    "q13_order_distribution",
    "q20_promo_suppliers",
    "q21_waiting_supplier",
]


@pytest.mark.parametrize("name", TPCH_EXTRA)
def test_oracle_equivalence(spark, name):
    compare_with_oracle(spark, name, "/root/testdata/sf0.001")


def test_all_registered(spark):
    for name in TPCH_EXTRA:
        assert name in registry.SPARK_QUERIES
        assert name in registry.ORACLE_SQL
