"""Subquery-shaped relational coverage (SURVEY.md §2.5).

The reference has no relational surface at all; these queries pin down the
subquery family the engine supports via Spark built-ins — EXISTS
(decorrelated to a conditioned LEFT SEMI join), IN over a grouped HAVING
(semi join against an aggregate), correlated per-group thresholds
(decorrelated to a window aggregate: one shuffle, no self-join), and an
uncorrelated scalar subquery (1-row broadcast cross join). Each DuckDB
oracle is written in subquery form so the value compare proves the
decorrelated Spark plan computes the textbook semantics.

Scale notes: every decorrelation here is also the right 100 TB plan —
EXISTS→semi join avoids materializing match multiplicity, the window
rewrite of the correlated aggregate reuses the fact table's own shuffle
partitioning, and the scalar subquery broadcasts one row instead of
re-scanning the fact table per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_algorithms_spark.queries import register
from cdc_algorithms_spark.sources.registry import epoch_day, load_table


# --- EXISTS → conditioned left-semi join (TPC-H Q4 shape) ------------------

_Q4_ORACLE = """
SELECT o.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY 1
"""


@register("q4_order_priority", _Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one line shipped after the
    order date, counted per priority. EXISTS decorrelates to a LEFT SEMI
    join whose condition carries the correlated predicate — the semi join
    stops probing an order at its first match, so match multiplicity
    never materializes (the 100 TB-safe plan for EXISTS)."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).cast("long").alias("order_count"))
    )


# --- Correlated per-group aggregate → window decorrelation (Q17 shape) -----

_Q17_ORACLE = """
SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_small_lines
FROM lineitem l
WHERE l.l_quantity < (
  SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey
)
"""


@register("q17_small_quantity_revenue", _Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lines whose quantity is below 20% of
    the part's average. The correlated scalar subquery decorrelates to a
    window average over l_partkey — one shuffle of the fact table, no
    self-join, no second scan (the naive rewrite joins lineitem to a
    grouped copy of itself: two scans + a join shuffle)."""
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("part_avg_qty", F.avg("l_quantity").over(w))
        .where(F.col("l_quantity") < 0.2 * F.col("part_avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).cast("long").alias("n_small_lines"),
        )
    )


# --- IN over grouped HAVING → semi join on an aggregate (Q18 shape) --------

_Q18_QTY = 150

_Q18_ORACLE = f"""
SELECT c.c_name, o.o_orderkey AS orderkey,
       CAST(epoch_ms(o.o_orderdate) / 86400000 AS BIGINT) AS orderdate_day,
       ROUND(o.o_totalprice, 2) AS totalprice,
       ROUND(SUM(l.l_quantity), 2) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > {_Q18_QTY}
)
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
ORDER BY totalprice DESC, orderkey
LIMIT 100
"""


@register("q18_large_volume_customers", _Q18_ORACLE)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the largest-volume orders. The
    IN (... GROUP BY ... HAVING ...) subquery becomes a semi join against
    the grouped lineitem aggregate; lineitem is then re-joined for the
    final per-order quantity. Both the HAVING aggregate and the final
    join shuffle on l_orderkey, so AQE reuses one exchange of the fact
    table; customer joins in by broadcast."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("big_qty"))
        .where(F.col("big_qty") > _Q18_QTY)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            F.col("o_orderkey").alias("orderkey"),
            epoch_day("o_orderdate").alias("orderdate_day"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), "orderkey")
        .limit(100)
    )


# --- Uncorrelated scalar subquery → 1-row broadcast cross join -------------

_SCALAR_ORACLE = """
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_above_avg,
       ROUND(MAX(o_totalprice), 2) AS max_price
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
GROUP BY 1
"""


@register("orders_above_global_avg", _SCALAR_ORACLE)
def orders_above_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders priced above the global
    average, per priority. The 1-row aggregate broadcasts into a cross
    join — the fact table is scanned twice but never shuffled for the
    comparison (at 100 TB the second scan is the cost; a cached/AQE-reused
    exchange or a precomputed stats table removes it)."""
    o = load_table(spark, "orders", sf_dir)
    avg_row = o.agg(F.avg("o_totalprice").alias("global_avg"))
    return (
        o.crossJoin(F.broadcast(avg_row))
        .where(F.col("o_totalprice") > F.col("global_avg"))
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_above_avg"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


# --- Correlated group comparison: above own nation's average ---------------

_NATION_AVG_ORACLE = """
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_rich_suppliers
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE s.s_acctbal > (
  SELECT AVG(s2.s_acctbal) FROM supplier s2
  WHERE s2.s_nationkey = s.s_nationkey
)
GROUP BY 1
"""


@register("suppliers_above_nation_avg", _NATION_AVG_ORACLE)
def suppliers_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers with above-average balance within their own nation —
    the correlated comparison decorrelates to a per-nation aggregate
    joined back by broadcast, NOT a window over ``s_nationkey``: nation
    has 25 values, so a window would cap parallelism at 25 and put an
    entire nation's suppliers in one task at scale, while the aggregate
    partial-combines map-side to 25 rows and the supplier scan stays
    fully parallel (the second column-pruned scan is cheaper than the
    25-task window)."""
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    nation_avg = s.groupBy("s_nationkey").agg(
        F.avg("s_acctbal").alias("nation_avg")
    )
    return (
        s.join(F.broadcast(nation_avg), "s_nationkey")
        .where(F.col("s_acctbal") > F.col("nation_avg"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rich_suppliers"))
    )
