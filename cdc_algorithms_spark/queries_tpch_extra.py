"""Extended TPC-H-pattern suite over the reduced fixture schema.

The reference (letit6E/cdc-algorithms) has no relational operators
(SURVEY.md §2.5); this module widens the engine's value-checked relational
surface with the classic TPC-H plan shapes the earlier q1/q3/q5/q17/q18
queries don't cover:

* q6  — pure scan-side conjunctive pushdown (no join, no shuffle beyond
        one partial agg);
* q7  — nation-pair volume shipping: two independent dimension lineages
        joined to one fact scan, disjunctive pair predicate;
* q10 — top-k revenue per customer over a filtered fact scan;
* q14 — conditional aggregation (CASE inside SUM) with a broadcast dim;
* q15 — scalar-subquery max over a derived aggregate (ties preserved);
* q16 — count-distinct suppliers with an anti-joined exclusion list;
* q19 — OR-of-ANDs disjunctive predicate spanning both join sides;
* q2-style cheapest supplier per part (correlated min without partsupp);
* q22 — scalar-average subquery + anti join (idle rich customers);
* q8  — national market share: fact-fact shuffle join under broadcast
        dimension lineages on both customer and supplier sides;
* q9  — product-type profit by supplier nation and year (cost restated
        from p_retailprice — the reduced schema has no partsupp);
* q11 — grouped value per part kept above a scalar-subquery fraction of
        the global total (HAVING vs broadcast 1-row aggregate);
* q12 — CASE-bucketed conditional counts (lateness restated as
        shipdate > orderdate + 90d — no commit/receipt columns);
* q13 — double aggregation with LEFT join (zero-order customers kept);
* q20 — correlated-threshold semi-join chain (promo-part quantity per
        supplier vs half the supplier average);
* q21 — multi-correlated EXISTS/NOT-EXISTS collapsed to per-order
        distinct counts (one orderkey shuffle, no correlated self-joins).

Cross-engine float discipline (see queries_relational.py): revenue sums
that *select* rows (q15's max, q2's min) are computed over
``DECIMAL(18,6)`` casts on both sides so Spark and DuckDB agree exactly;
display-only sums use ``ROUND(..., 2)``.

Scale notes: every dimension join is an explicit ``F.broadcast``
(customer/supplier/part/nation are O(SF) but orders/lineitem are the
100 TB fact side); q6/q19 predicates are written to reach the parquet
scan (PushedFilters asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_algorithms_spark.queries import register
from cdc_algorithms_spark.sources.registry import load_table


# --- Q6: forecast revenue change (scan-only pushdown) -----------------------

_Q6_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", _Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- Q7: volume shipping between a nation pair ------------------------------

_Q7_ORACLE = """
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
    OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
  AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY ns.n_name, nc.n_name, l_year
"""


@register("q7_volume_shipping", _Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)

    # Two independent dim lineages resolved to nation names *before* the
    # fact join: supplier-side (s_suppkey -> supp_nation) and
    # customer-side (o_custkey -> cust_nation) are each a broadcast, so
    # the only shuffle left is the lineitem<->orders fact join + final agg.
    supp_nation = F.broadcast(
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("s_suppkey").alias("l_suppkey"),
            F.col("n_name").alias("supp_nation"),
        )
        .where(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    )
    cust_nation = F.broadcast(
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
        .where(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    )
    return (
        li.where(
            F.col("l_shipdate").between(
                F.lit("1996-01-01").cast("timestamp"),
                F.lit("1997-12-31").cast("timestamp"),
            )
        )
        .join(supp_nation, "l_suppkey")
        .join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(cust_nation, o.o_custkey == cust_nation.c_custkey)
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("volume")
        )
    )


# --- Q10: returned-item reporting (top 20 customers by refund revenue) ------

_Q10_ORACLE = """
SELECT c.c_custkey AS custkey, c.c_name AS name, n.n_name AS nation,
       CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
       CAST(ROUND(CAST(c.c_acctbal AS DECIMAL(18,6)), 2) AS DOUBLE) AS acctbal
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY custkey, name, nation, c.c_acctbal
ORDER BY revenue DESC, custkey
LIMIT 20
"""


@register("q10_returned_items", _Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(
            o.where(
                (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ).select("o_orderkey", "o_custkey"),
            li.l_orderkey == o.o_orderkey,
        )
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
            F.col("c_acctbal"),
        )
        .agg(
            # DECIMAL accumulation: this sum SELECTS the top-20 rows, so
            # summation-order-dependent double rounding could flip
            # membership at a .005 boundary (module float discipline)
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,6)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "custkey",
            "name",
            "nation",
            "revenue",
            F.round(F.col("c_acctbal").cast("decimal(18,6)"), 2)
            .cast("double")
            .alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), "custkey")
        .limit(20)
    )


# --- Q14: promotion-effect revenue (conditional aggregation) ----------------

_Q14_ORACLE = """
SELECT ROUND(
         100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                          THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                    AS DECIMAL(18,6))
                          ELSE CAST(0 AS DECIMAL(18,6)) END)
         / SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))),
         4) AS promo_revenue_pct,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
  AND l.l_shipdate < TIMESTAMP '1997-04-01'
"""


@register("q14_promo_revenue", _Q14_ORACLE)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    # DECIMAL(18,6) accumulation on both sides: the ratio of two exact
    # decimal sums is engine-stable, where a double SUM would be
    # summation-order-dependent (see queries_relational.py note).
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .join(F.broadcast(p.select("p_partkey", "p_type")), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", disc).otherwise(
                        F.lit(0).cast("decimal(18,6)")
                    )
                )
                / F.sum(disc),
                4,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- Q15: top supplier(s) by quarterly revenue (scalar-subquery max) --------

_Q15_ORACLE = """
WITH revenue AS (
    SELECT l_suppkey AS suppkey,
           SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
               AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey AS suppkey, s.s_name AS name,
       CAST(ROUND(r.total_revenue, 2) AS DOUBLE) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", _Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("total_revenue")
        )
    )
    # Ties preserved: an empty-frame window max avoids a second scan of
    # lineitem (the scalar subquery would re-aggregate); one extra
    # single-partition exchange over the tiny per-supplier aggregate.
    w = Window.partitionBy()
    top = revenue.withColumn("max_rev", F.max("total_revenue").over(w)).where(
        F.col("total_revenue") == F.col("max_rev")
    )
    return (
        top.join(F.broadcast(s), top.suppkey == s.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.round(F.col("total_revenue"), 2).cast("double").alias("total_revenue"),
        )
    )


# --- Q16: supplier variety per brand/size with exclusions -------------------

_Q16_ORACLE = """
SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY brand, type, size
"""


@register("q16_supplier_variety", _Q16_ORACLE)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    bad_suppliers = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = p.where(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        li.select("l_partkey", "l_suppkey")
        # broadcast anti join: the exclusion list is O(suppliers), tiny
        # next to the fact side at any SF.
        .join(
            F.broadcast(bad_suppliers),
            li.l_suppkey == bad_suppliers.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


# --- Q19: disjunctive predicate revenue (OR-of-ANDs across join sides) ------

_Q19_ORACLE = """
SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register("q19_disjunctive_revenue", _Q19_ORACLE)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    # The single-side residues of the disjunction (brand set; quantity
    # envelope) are stated explicitly so they push to each parquet scan;
    # Catalyst keeps the cross-side OR as the post-join filter.
    parts = p.where(
        F.col("p_brand").isin("Brand#3", "Brand#12", "Brand#21")
        & (F.col("p_size") >= 1)
    ).select("p_partkey", "p_brand", "p_size")
    branch = (
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.where(F.col("l_quantity").between(1, 30))
        .join(F.broadcast(parts), li.l_partkey == parts.p_partkey)
        .where(branch)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )


# --- Q2 analog: cheapest supplier per part (correlated min, no partsupp) ----

_Q2_ORACLE = """
WITH unit_cost AS (
    SELECT l_partkey AS partkey, l_suppkey AS suppkey,
           SUM(CAST(l_extendedprice AS DECIMAL(18,6)))
             / SUM(CAST(l_quantity AS DECIMAL(18,6))) AS avg_unit_price
    FROM lineitem
    GROUP BY l_partkey, l_suppkey
),
best AS (
    SELECT partkey, MIN(avg_unit_price) AS min_price
    FROM unit_cost GROUP BY partkey
)
SELECT u.partkey AS partkey, u.suppkey AS suppkey, s.s_name AS supplier,
       CAST(ROUND(u.avg_unit_price, 4) AS DOUBLE) AS unit_price
FROM unit_cost u
JOIN best b ON u.partkey = b.partkey AND u.avg_unit_price = b.min_price
JOIN supplier s ON u.suppkey = s.s_suppkey
JOIN part p ON u.partkey = p.p_partkey
WHERE p.p_size = 7 AND p.p_type = 'PROMO'
"""


@register("q2_cheapest_supplier", _Q2_ORACLE)
def q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    p = load_table(spark, "part", sf_dir)
    # Filter parts FIRST (size/type reach the part scan), broadcast the
    # survivors into the fact aggregation — at 100 TB the per-(part,supp)
    # aggregate only materializes for the ~1/300 qualifying parts.
    parts = F.broadcast(
        p.where((F.col("p_size") == 7) & (F.col("p_type") == "PROMO")).select(
            "p_partkey"
        )
    )
    unit_cost = (
        li.join(parts, li.l_partkey == F.col("p_partkey"))
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
                / F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            ).alias("avg_unit_price")
        )
    )
    # correlated min as a partition-window min: one shuffle on partkey
    # (already the aggregate's key) instead of a self-join against `best`.
    w = Window.partitionBy("partkey")
    best = unit_cost.withColumn(
        "min_price", F.min("avg_unit_price").over(w)
    ).where(F.col("avg_unit_price") == F.col("min_price"))
    return best.join(F.broadcast(s), best.suppkey == s.s_suppkey).select(
        "partkey",
        "suppkey",
        F.col("s_name").alias("supplier"),
        F.round(F.col("avg_unit_price"), 4).cast("double").alias("unit_price"),
    )


# --- Q22: idle rich customers (scalar avg subquery + anti join) -------------

_Q22_ORACLE = """
WITH rich AS (
    SELECT * FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                       WHERE c_acctbal > 0)
)
SELECT r.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(ROUND(SUM(CAST(r.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS total_acctbal
FROM rich r
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = r.c_custkey
      AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY segment
"""


@register("q22_idle_rich_customers", _Q22_ORACLE)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    # scalar AVG computed in DOUBLE on both sides (DuckDB's AVG always
    # returns double); it only thresholds rows, never lands in output.
    avg_bal = (
        c.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("v"))
    )
    rich = c.join(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("v"))
    recent = o.where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_acctbal"),
        )
    )


# --- Q8: national market share ----------------------------------------------
# Fact-fact shuffle join (lineitem ⋈ orders on orderkey) under broadcast
# dimension lineages on both the customer side (region filter) and the
# supplier side (share nation) — the classic q8 plan shape. The reduced
# schema keeps every column q8 needs.

_Q8_ORACLE = """
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(CASE WHEN ns.n_name = 'NATION_3'
                      THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))
                      ELSE 0 END)
             / SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))),
             6) AS mkt_share
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation nc ON c.c_nationkey = nc.n_nationkey
JOIN region r ON nc.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY o_year
"""


@register("q8_market_share", _Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    p = load_table(spark, "part", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    asia_cust = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(
            F.broadcast(r.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        li.join(
            F.broadcast(p.where(F.col("p_type") == "ECONOMY").select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(
            o.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ).select("o_orderkey", "o_custkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(asia_cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
    )
    dvol = vol.cast("decimal(18,6)")
    return (
        df.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", dvol).otherwise(0))
                / F.sum(dvol),
                6,
            )
            .cast("double")
            .alias("mkt_share")
        )
    )


# --- Q9: product-type profit (analog) ---------------------------------------
# TPC-H q9 prices cost from partsupp, which the reduced schema omits; the
# analog keeps the identical plan (part-name filter fanned into the fact
# scan, supplier-nation lineage, year grouping) with cost restated from
# the part's retail price.

_Q9_ORACLE = """
SELECT ns.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           - 0.5 * p.p_retailprice * l.l_quantity
                           AS DECIMAL(18,6))),
                  2) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%gear%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation ns ON s.s_nationkey = ns.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY nation, o_year
"""


@register("q9_product_profit", _Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    p = load_table(spark, "part", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    supp_nation = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li.join(
            F.broadcast(
                p.where(F.col("p_name").like("%gear%")).select(
                    "p_partkey", "p_retailprice"
                )
            ),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .join(
            o.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


# --- Q11: important stock (analog) ------------------------------------------
# q11's partsupp inventory value is restated over shipped lines of two
# nations' suppliers; the load-bearing shape survives: grouped value per
# part, kept only above a scalar-subquery fraction of the global total
# (a HAVING against a broadcast 1-row aggregate).

_Q11_ORACLE = """
WITH natline AS (
    SELECT l.l_partkey, CAST(l.l_extendedprice AS DECIMAL(18,6)) AS val
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE s.s_nationkey IN (0, 1)
)
SELECT l_partkey AS partkey, CAST(ROUND(SUM(val), 2) AS DOUBLE) AS part_value
FROM natline
GROUP BY partkey
HAVING SUM(val) > (SELECT SUM(val) * 0.001 FROM natline)
"""


@register("q11_important_stock", _Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    natline = li.join(
        F.broadcast(
            s.where(F.col("s_nationkey").isin(0, 1)).select("s_suppkey")
        ),
        li.l_suppkey == F.col("s_suppkey"),
    ).select(
        "l_partkey", F.col("l_extendedprice").cast("decimal(18,6)").alias("val")
    )
    per_part = natline.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum("val").alias("value")
    )
    # scalar threshold from the SAME grouped result (sum of sums), so the
    # source scan runs once and the 1-row threshold broadcasts.
    threshold = per_part.agg((F.sum("value") * 0.001).alias("cutoff"))
    return (
        per_part.join(F.broadcast(threshold))
        .where(F.col("value") > F.col("cutoff"))
        .select(
            "partkey", F.round(F.col("value"), 2).cast("double").alias("part_value")
        )
    )


# --- Q12: late-shipment priority counts (analog) ----------------------------
# q12's ship-mode/commit/receipt columns are absent; lateness is restated
# as l_shipdate > o_orderdate + 90 days, keeping q12's signature shape:
# CASE-bucketed conditional counts over a fact-fact join.

_Q12_ORACLE = """
SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
            THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY ship_bucket
"""


@register("q12_late_priority", _Q12_ORACLE)
def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    df = li.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).join(
        o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        li.l_orderkey == F.col("o_orderkey"),
    )
    bucket = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        F.lit("LATE"),
    ).otherwise(F.lit("ONTIME"))
    return df.groupBy(bucket.alias("ship_bucket")).agg(
        F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
    )


# --- Q13: customer order-count distribution ---------------------------------
# Double aggregation with a LEFT join so zero-order customers survive
# into the c_count=0 bucket — the q13 shape on available columns
# (priority filter stands in for the comment NOT LIKE).

_Q13_ORACLE = """
WITH c_orders AS (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
"""


@register("q13_order_distribution", _Q13_ORACLE)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c_orders = (
        c.join(
            o.where(F.col("o_orderpriority") != "1-URGENT").select(
                "o_custkey", "o_orderkey"
            ),
            c.c_custkey == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy(F.col("c_count").cast("long").alias("c_count")).agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    )


# --- Q20: potential promotion suppliers (analog) ----------------------------
# q20's partsupp availability threshold is restated as "shipped more
# promo-part quantity in 1996 than half the average supplier" — the
# correlated-threshold semi-join chain survives (part filter → fact
# aggregate per supplier → scalar threshold → supplier names).

_Q20_ORACLE = """
WITH promo_qty AS (
    SELECT l.l_suppkey, SUM(l.l_quantity) AS qty
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_suppkey
)
SELECT s.s_name AS supplier, ROUND(pq.qty, 2) AS promo_qty
FROM promo_qty pq
JOIN supplier s ON pq.l_suppkey = s.s_suppkey
WHERE pq.qty > (SELECT 0.5 * AVG(qty) FROM promo_qty)
"""


@register("q20_promo_suppliers", _Q20_ORACLE)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    p = load_table(spark, "part", sf_dir)
    promo_qty = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(p.where(F.col("p_type") == "PROMO").select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    threshold = promo_qty.agg((0.5 * F.avg("qty")).alias("cutoff"))
    return (
        promo_qty.join(F.broadcast(threshold))
        .where(F.col("qty") > F.col("cutoff"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            F.col("s_name").alias("supplier"),
            F.round(F.col("qty"), 2).alias("promo_qty"),
        )
    )


# --- Q21: waiting supplier (analog) -----------------------------------------
# q21's commit/receipt lateness is restated as l_shipdate > o_orderdate +
# 60 days. The multi-correlated EXISTS / NOT-EXISTS pair ("another
# supplier shares the order; no OTHER supplier is late") collapses into
# per-order distinct counts — one shuffle on orderkey instead of two
# correlated self-joins — then a per-supplier count of sole-late orders.

_Q21_ORACLE = """
WITH lines AS (
    SELECT l.l_orderkey, l.l_suppkey,
           (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
),
per_order AS (
    SELECT l_orderkey,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
    FROM lines
    GROUP BY l_orderkey
)
SELECT s.s_name AS supplier, CAST(COUNT(DISTINCT li.l_orderkey) AS BIGINT) AS numwait
FROM lines li
JOIN per_order po ON li.l_orderkey = po.l_orderkey
JOIN supplier s ON li.l_suppkey = s.s_suppkey
WHERE li.late AND po.n_supp >= 2 AND po.n_late_supp = 1
GROUP BY supplier
"""


@register("q21_waiting_supplier", _Q21_ORACLE)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    lines = li.join(
        o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey")
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).alias("late"),
    )
    # Two multi-distinct aggregates on one groupBy would compile to an
    # Expand (doubling every fact row before the shuffle). Collapsing to
    # per-(order, supplier) first makes both "distinct" counts plain
    # counts. The explicit repartition on l_orderkey makes BOTH
    # aggregations reuse ONE exchange: HashPartitioning(l_orderkey)
    # satisfies the (l_orderkey, l_suppkey) grouping's clustered
    # distribution AND the per-order rollup's, so the previous shape's
    # second exchange + window sort (per-supp rows re-shuffled by
    # orderkey, sorted, counted over a frame) collapses into a plain
    # aggregate (guide §2.4 "two operations keyed the same way can
    # share one exchange"). The sole late supplier of a qualifying
    # order (n_late_supp == 1) is picked up by a conditional max in the
    # same pass — no window function, no second shuffle of the fact
    # rows; only the tiny per-order frame re-shuffles to suppliers.
    per_supp = (
        lines.repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("late").alias("any_late"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("any_late").cast("int")).alias("n_late_supp"),
        F.max(F.when(F.col("any_late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    sole_late = per_order.where(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    return (
        sole_late.groupBy("late_supp")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .join(F.broadcast(s), F.col("late_supp") == s.s_suppkey)
        .select(F.col("s_name").alias("supplier"), "numwait")
    )
