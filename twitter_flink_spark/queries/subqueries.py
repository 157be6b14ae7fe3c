"""Subquery-shaped relational queries (EXISTS / IN / correlated aggregate),
the decorrelation patterns a full SQL engine must support. The reference has
no query language at all (SURVEY.md §3), so these anchor on the standard
TPC-H shapes (Q4/Q13/Q17/Q18 analogs restricted to the testdata schema).

Each is written the way Catalyst decorrelates it — semi-joins and window
aggregates, never a per-row subquery — so the plan is the 100 TB plan:
one shuffle per correlation key, broadcast where a side is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from twitter_flink_spark.registry import register
from twitter_flink_spark.sources.tables import load_table


@register(
    "exists_late_shipment_orders",
    oracle="""
SELECT o.o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
)
GROUP BY o.o_orderpriority
""",
)
def exists_late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join on the
    correlation key with the extra predicate as the join condition. One
    shuffle on orderkey; the semi-join short-circuits per probe row, and
    the post-join aggregate is on a 5-value key."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate, 90)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "correlated_min_price_per_part",
    oracle="""
SELECT l_partkey, l_orderkey, l_linenumber,
       round(l_extendedprice, 2) AS min_price
FROM (
  SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice,
         min(l_extendedprice) OVER (PARTITION BY l_partkey) AS mn
  FROM lineitem
)
WHERE l_extendedprice = mn
""",
)
def correlated_min_price_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 correlation shape (min per group, keep matching rows):
    `price = (SELECT min(price) ... WHERE same partkey)` decorrelated to a
    window min — one shuffle on partkey, no self-join, no re-scan of
    lineitem (the groupBy+join formulation scans the fact table twice)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("mn", F.min("l_extendedprice").over(w))
        .where(F.col("l_extendedprice") == F.col("mn"))
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("min_price"),
        )
    )


@register(
    "customer_order_count_distribution",
    oracle="""
SELECT n_orders, count(*) AS n_customers
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
GROUP BY n_orders
""",
)
def customer_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of customers by order count, zero-order
    customers included via the left outer join. Two aggregates: the first
    shuffles on custkey, the second on the tiny count domain."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@register(
    "in_subquery_bulk_orders",
    oracle="""
SELECT c.c_name, o.o_orderkey, round(o.o_totalprice, 2) AS totalprice,
       round(t.sum_qty, 2) AS sum_qty
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 120
) t ON t.l_orderkey = o.o_orderkey
""",
)
def in_subquery_bulk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: `orderkey IN (... HAVING sum(qty) > 120)` as an
    aggregate-then-join. The HAVING aggregate shrinks lineitem to a key
    list BEFORE any join — the selective side drives the plan, and at
    100 TB the survivor set is small enough for AQE to convert the orders
    join to broadcast at runtime."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    bulk = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 120)
    )
    return (
        o.join(bulk, o.o_orderkey == bulk.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


@register(
    "small_quantity_revenue_per_part",
    oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM (
  SELECT l_extendedprice, l_quantity,
         avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM lineitem
)
WHERE l_quantity < 0.5 * avg_qty
""",
)
def small_quantity_revenue_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: rows below half their part's average quantity.
    The correlated scalar `avg(...) WHERE same partkey` decorrelates to a
    window avg (single shuffle on partkey); the classic formulation — join
    lineitem against a grouped-avg of itself — costs a second scan."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .where(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )
