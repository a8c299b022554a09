"""Join-family coverage: as-of, range/interval, semi/anti, EXCEPT, salted.

SURVEY.md §2.5 records that the reference implements no joins; this module
is the engine's join surface beyond the equi-joins already exercised by
the relational suite — each variant with a DuckDB oracle so the driver's
value compare covers it fully.

Scale notes:
* as-of join is the union+window plan (operators/temporal.py) — one
  shuffle, O(1) state per key, no range explosion;
* the banded range join broadcasts the (tiny) band table — a
  BroadcastNestedLoopJoin whose inner side is 4 rows, so each executor
  scans its events partition once (regular bands could instead be
  bucketized into an equi-join; irregular bands keep the general form);
* the interval self-join carries the customer equi-key, so Spark executes
  a shuffled hash join on custkey and applies the date-range predicate
  as a post-join filter — per-key group sizes stay O(orders/customer),
  constant as customers scale;
* the salted join demonstrates operators/skew.py on a hot-keyed fact
  (150 users × ~N events each vs a 150-row, deliberately
  non-broadcast dimension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_algorithms_spark.operators.skew import salted_join
from cdc_algorithms_spark.operators.temporal import asof_join
from cdc_algorithms_spark.queries import register
from cdc_algorithms_spark.sources.registry import load_table


# --- As-of join: last view at-or-before each purchase, per user ------------

_ASOF_ORACLE = """
WITH tagged AS (
  SELECT user_id, ts, event_id, (event_type = 'view') AS is_view
  FROM events WHERE event_type IN ('view', 'purchase')
),
filled AS (
  SELECT user_id, ts, event_id, is_view,
         LAST_VALUE(CASE WHEN is_view THEN event_id END IGNORE NULLS)
           OVER w AS view_id,
         LAST_VALUE(CASE WHEN is_view THEN epoch_us(ts) END IGNORE NULLS)
           OVER w AS view_us
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_view DESC, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, user_id,
       CAST(view_id AS BIGINT) AS view_id,
       CAST(epoch_us(ts) - view_us AS BIGINT) AS gap_us
FROM filled WHERE NOT is_view
"""


@register("asof_last_view_before_purchase", _ASOF_ORACLE)
def q_asof_last_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators/temporal.py): for every purchase
    event, the most recent view by the same user at or before it, with
    the gap in microseconds (NULL when the user never viewed before)."""
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    joined = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="view_ts",
        value_cols=["view_id", "view_ts"],
        allow_exact=True,
        tie_cols=["view_id"],
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "view_id",
        (F.unix_micros("ts") - F.unix_micros("view_ts")).alias("gap_us"),
    )


# --- Banded range join: events bucketed by value bands ---------------------

_BANDS = [("sub1", 0.0, 1.0), ("1to10", 1.0, 10.0), ("10to100", 10.0, 100.0), ("100up", 100.0, 1000.0)]

_BANDS_SQL = ", ".join(f"('{b}', {lo}, {hi})" for b, lo, hi in _BANDS)

_RANGE_JOIN_ORACLE = f"""
SELECT b.band,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(e.value), 2) AS sum_value
FROM events e
JOIN (VALUES {_BANDS_SQL}) AS b(band, lo, hi)
  ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band
"""


@register("value_band_range_join", _RANGE_JOIN_ORACLE)
def q_value_band_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a broadcast band table: each event finds
    its [lo, hi) value band via BroadcastNestedLoopJoin — the inner side
    is 4 literal rows, so the fact side streams through once per
    partition with no shuffle before the aggregate."""
    ev = load_table(spark, "events", sf_dir)
    bands = spark.createDataFrame(_BANDS, ["band", "lo", "hi"])
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# --- Interval self-join: order pairs within 30 days, per customer ----------

_INTERVAL_ORACLE = """
SELECT a.o_custkey AS custkey,
       CAST(COUNT(*) AS BIGINT) AS n_pairs_30d
FROM orders a JOIN orders b
  ON a.o_custkey = b.o_custkey
 AND a.o_orderkey < b.o_orderkey
 AND ABS(date_diff('day', a.o_orderdate, b.o_orderdate)) <= 30
GROUP BY a.o_custkey
"""


@register("order_pairs_within_30d", _INTERVAL_ORACLE)
def q_order_pairs_within_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join carrying an equi-key: pairs of orders by the
    same customer placed within 30 days of each other. The custkey
    equi-condition makes this a shuffled hash join with the date-range
    predicate as a residual filter — no quadratic blowup beyond each
    customer's own order list."""
    o = load_table(spark, "orders", sf_dir)
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("a_key"),
        F.col("o_orderdate").alias("a_date"),
    )
    b = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("b_key"),
        F.col("o_orderdate").alias("b_date"),
    )
    return (
        a.join(
            b,
            ["custkey"],
        )
        .where(
            (F.col("a_key") < F.col("b_key"))
            & (F.abs(F.datediff("b_date", "a_date")) <= 30)
        )
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs_30d"))
    )


# --- Anti join: customers with no 1995 order -------------------------------

_ANTI_ORACLE = """
SELECT c.c_mktsegment AS mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '1995-01-01'
    AND o.o_orderdate <  TIMESTAMP '1996-01-01'
)
GROUP BY c.c_mktsegment
"""


@register("customers_no_1995_order", _ANTI_ORACLE)
def q_customers_no_1995_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers who placed no order in 1995, counted per
    market segment. The orders side is pre-filtered to the year before
    joining, so the anti probe only carries 1995 keys."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )


# --- Semi join: parts shipped in 1998, per brand ---------------------------

_SEMI_ORACLE = """
SELECT p.p_brand AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM part p
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey
    AND l.l_shipdate >= TIMESTAMP '1998-01-01'
)
GROUP BY p.p_brand
"""


@register("parts_shipped_1998_semi", _SEMI_ORACLE)
def q_parts_shipped_1998_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: parts with at least one 1998 shipment, per brand.
    Semi joins never duplicate the probe side, so the brand counts need
    no DISTINCT pass."""
    p = load_table(spark, "part", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).where(
        F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    return (
        p.join(li, F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    )


# --- EXCEPT: users who viewed but never purchased --------------------------

_EXCEPT_ORACLE = """
SELECT user_id FROM (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
  EXCEPT
  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
)
"""


@register("viewers_never_purchased", _EXCEPT_ORACLE)
def q_viewers_never_purchased(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set op (completing INTERSECT from the relational suite):
    distinct viewers minus distinct purchasers."""
    ev = load_table(spark, "events", sf_dir)
    viewers = ev.where(F.col("event_type") == "view").select("user_id")
    buyers = ev.where(F.col("event_type") == "purchase").select("user_id")
    return viewers.subtract(buyers)


# --- Scalar-function surface: monthly order stats --------------------------

_MONTHLY_ORACLE = """
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
       split_part(o_orderpriority, '-', 1) AS priority_class,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price,
       ROUND(SUM(SQRT(o_totalprice)), 2) AS sum_sqrt_price,
       ROUND(AVG(LN(o_totalprice + 1)), 4) AS avg_log_price
FROM orders
GROUP BY order_month, priority_class
"""


@register("monthly_order_stats", _MONTHLY_ORACLE)
def q_monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function surface (SURVEY.md §2.5 string/date/math): month
    bucketing via date_format, priority class via split, sqrt/ln math —
    all JVM-side built-ins inside one whole-stage-codegen span."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.split(F.col("o_orderpriority"), "-").getItem(0).alias(
                "priority_class"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.round(F.sum(F.sqrt("o_totalprice")), 2).alias("sum_sqrt_price"),
            F.round(F.avg(F.log(F.col("o_totalprice") + 1)), 4).alias(
                "avg_log_price"
            ),
        )
    )


# --- Salted join demo: hot-keyed events vs small non-broadcast dim ---------

_SALTED_ORACLE = """
SELECT c.c_mktsegment AS mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(e.value), 2) AS sum_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


@register("salted_user_segment_join", _SALTED_ORACLE)
def q_salted_user_segment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated equi-join (operators/skew.py::salted_join): events
    keyed by a 150-value hot user_id join the customer dimension with the
    fact side salted 8 ways, spreading each hot key over 8 reducers. The
    result is salt-independent and matches the plain-join oracle."""
    ev = load_table(spark, "events", sf_dir)
    dim = (
        load_table(spark, "customer", sf_dir)
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    )
    joined = salted_join(ev, dim, "user_id", num_salts=8)
    return joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
