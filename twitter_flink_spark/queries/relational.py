"""Relational operator coverage (SURVEY.md §2.2): the join zoo, aggregation
variants, analytic window functions, sorts/limits, set ops, and scalar
functions the reference lacks entirely but a complete engine needs.

Everything is built-in Catalyst expressions — zero UDFs. Join-strategy
notes per query state what holds at 100 TB. Double aggregates are rounded
identically on both sides (cross-engine float summation order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from twitter_flink_spark.registry import register
from twitter_flink_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Aggregation: TPC-H Q1-shaped pricing summary (hash aggregate, partial+final)


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                    AS sum_qty,
       round(sum(l_extendedprice), 2)                               AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6)                                    AS avg_qty,
       round(avg(l_extendedprice), 6)                               AS avg_price,
       round(avg(l_discount), 6)                                    AS avg_disc,
       count(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-12-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide multi-aggregate hash aggregation with the
    predicate pushed to the parquet scan. At 100 TB: map-side partial agg
    means the shuffle carries 6 values per (partition, flag, status) — the
    group-key cardinality (6) bounds reducer state, not the row count."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Join pipeline: TPC-H Q3-shaped (broadcast dim + shuffled fact-fact join)


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. customer is dimension-sized → broadcast (no shuffle
    of orders for that join); orders⨝lineitem shuffles on orderkey — at
    100 TB AQE picks shuffled-hash or sort-merge and splits skewed keys.
    Top-10 runs as TakeOrderedAndProject with a deterministic tie-break."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
    return (
        joined.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


# ---------------------------------------------------------------------------
# Multi-way star join: TPC-H Q5-shaped


@register(
    "q5_revenue_by_nation",
    oracle="""
SELECT n.n_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN supplier s ON s.s_nationkey = n.n_nationkey
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: every dimension (region, nation, supplier) broadcasts, so
    the only shuffle is lineitem⨝orders on orderkey + the final tiny
    aggregation. Catalyst reorders the join graph; the broadcast hints pin
    the dims even if stats are missing."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


# ---------------------------------------------------------------------------
# Single-row filtered aggregate: TPC-H Q6-shaped


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four predicates push to the parquet scan (range + between);
    at 100 TB min/max row-group stats skip most of the table before any
    CPU is spent."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Outer / anti joins


@register(
    "left_outer_order_counts",
    oracle="""
SELECT c.c_custkey, c.c_name,
       count(o.o_orderkey) AS n_orders,
       round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spend
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
""",
)
def left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count=0, spend=0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias(
                "total_spend"
            ),
        )
    )


@register(
    "anti_join_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS). Broadcast of the distinct key set when
    small; shuffled hash-anti at scale."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "full_outer_nation_presence",
    oracle="""
SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
       count(DISTINCT c.c_custkey) AS n_customers,
       count(DISTINCT s.s_suppkey) AS n_suppliers
FROM customer c
FULL OUTER JOIN supplier s ON c.c_nationkey = s.s_nationkey
GROUP BY 1
""",
)
def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: nations present on either side survive with nulls
    on the missing side."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
        .select(
            F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey"),
            "c_custkey",
            "s_suppkey",
        )
        .groupBy("nationkey")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )


# ---------------------------------------------------------------------------
# Distinct aggregation


@register(
    "distinct_customers_per_status",
    oracle="""
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
""",
)
def distinct_customers_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) — Catalyst expands to a two-phase aggregate
    (distinct keys first, then count), both phases partial+final."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube


@register(
    "rollup_lineitem_flags",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: (flag,status), (flag), () grouping sets in one pass —
    Catalyst Expand + single aggregate, not three scans."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@register(
    "cube_orders_status_priority",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "orders")
    return li.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Analytic window functions


@register(
    "rank_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey
                                 ORDER BY o_totalprice DESC, o_orderkey ASC)
              AS INTEGER) AS rnk
  FROM orders
)
WHERE rnk <= 3
""",
)
def rank_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — rank<=k is executed as WindowGroupLimit
    (per-partition heap before the shuffle), so at 100 TB each map task
    ships ≤3 rows per customer it sees."""
    o = load_table(spark, sf_dir, "orders")
    win = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.row_number().over(win))
        .where(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rnk",
        )
    )


@register(
    "running_spend_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate ASC, o_orderkey ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             2) AS running_spend
FROM orders
""",
)
def running_spend_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit ROWS frame and total deterministic
    ordering (date, then key)."""
    o = load_table(spark, sf_dir, "orders")
    win = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(win), 2).alias("running_spend"),
    )


@register(
    "event_value_lag_lead",
    oracle="""
SELECT user_id, event_id,
       round(value, 2) AS value_r,
       round(lag(value)  OVER w, 2) AS prev_value,
       round(lead(value) OVER w, 2) AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
)
def event_value_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each user's event timeline (sessionization building
    block)."""
    e = load_table(spark, sf_dir, "events")
    win = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return e.select(
        "user_id",
        "event_id",
        F.round("value", 2).alias("value_r"),
        F.round(F.lag("value").over(win), 2).alias("prev_value"),
        F.round(F.lead("value").over(win), 2).alias("next_value"),
    )


# ---------------------------------------------------------------------------
# Set operations


@register(
    "set_ops_customer_segments",
    oracle="""
WITH open_buyers AS (
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
),
finished_buyers AS (
  SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
)
SELECT 'both' AS side, count(*) AS n FROM (
  SELECT custkey FROM open_buyers INTERSECT SELECT custkey FROM finished_buyers
)
UNION ALL
SELECT 'open_only' AS side, count(*) AS n FROM (
  SELECT custkey FROM open_buyers EXCEPT SELECT custkey FROM finished_buyers
)
UNION ALL
SELECT 'all_distinct' AS side, count(*) AS n FROM (
  SELECT custkey FROM open_buyers UNION SELECT custkey FROM finished_buyers
)
""",
)
def set_ops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT in one result (reference has none —
    SURVEY.md §2.2)."""
    o = load_table(spark, sf_dir, "orders")
    open_b = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    fin_b = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    both = open_b.intersect(fin_b).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("side"), "n"
    )
    open_only = open_b.exceptAll(fin_b).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("open_only").alias("side"), "n"
    )
    all_d = open_b.union(fin_b).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("all_distinct").alias("side"), "n"
    )
    return both.unionAll(open_only).unionAll(all_d)


# ---------------------------------------------------------------------------
# Scalar functions / expressions


@register(
    "scalar_string_funcs",
    oracle="""
SELECT p_partkey,
       lower(p_name)                          AS name_lower,
       upper(p_brand)                         AS brand_upper,
       concat(p_brand, ':', p_type)           AS brand_type,
       substring(p_name, 1, 5)                AS name_prefix,
       length(p_name)                         AS name_len,
       trim(concat(' ', p_name, ' '))         AS name_trimmed,
       replace(p_type, ' ', '_')              AS type_snake
FROM part
""",
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole scalar surface (lower/trim/concat,
    `TopNHashtags.java:202,235,162`) plus the standard string family —
    all JVM built-ins inside whole-stage codegen."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@register(
    "scalar_date_case_funcs",
    oracle="""
SELECT CAST(extract(year FROM o_orderdate) AS INTEGER)  AS order_year,
       CAST(extract(month FROM o_orderdate) AS INTEGER) AS order_month,
       CASE WHEN o_totalprice >= 300000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END                              AS price_band,
       count(*)                                         AS n_orders
FROM orders
GROUP BY 1, 2, 3
""",
)
def scalar_date_case_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction + CASE bucketing + aggregate."""
    o = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
    )
    return (
        o.select(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            band.alias("price_band"),
        )
        .groupBy("order_year", "order_month", "price_band")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# Scalar subquery (customers above average balance)


@register(
    "customers_above_avg_balance",
    oracle="""
SELECT c_custkey, round(c_acctbal, 2) AS acctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
""",
)
def customers_above_avg_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: the 1-row aggregate is cross-broadcast to the
    filter — no driver round-trip (no collect)."""
    c = load_table(spark, sf_dir, "customer")
    avg_bal = c.agg(F.avg("c_acctbal").alias("__avg"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal"))
    )


# ---------------------------------------------------------------------------
# HAVING


@register(
    "returned_revenue_top_customers",
    oracle="""
SELECT c.c_custkey, c.c_name,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def returned_revenue_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, top-20 customers. The
    returnflag filter pushes to the lineitem scan; the limit runs as
    TakeOrderedAndProject over the post-agg rows (never a global sort of
    the fact table)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "promo_revenue_share",
    oracle="""
SELECT round(
         100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                          THEN l.l_extendedprice * (1 - l.l_discount)
                          ELSE 0 END)
         / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
""",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation (promo share of revenue)
    over a fact⨝dim join — part broadcasts, one pass, no second scan for
    the denominator."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "disjunctive_predicate_revenue",
    oracle="""
SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 10)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity < 10)
""",
)
def disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunction predicates spanning both join
    sides. Catalyst distributes the single-side conjuncts below the join
    (brand/size reach the part scan; the common partkey equi-condition
    stays a hash join, never nested-loop)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & (F.col("l_quantity") >= 10)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(10, 30)
        & (F.col("l_quantity") < 10)
    )
    return joined.where(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "pivot_priority_by_status",
    oracle="""
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_O,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_F,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_P
FROM orders
GROUP BY o_orderpriority
""",
)
def pivot_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per priority, one column per status. The value
    list is pinned (no discovery pass over the data — at 100 TB an
    unpinned pivot costs an extra distinct scan); compiles to one
    conditional aggregate, same as the oracle's CASE sums."""
    o = load_table(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "o_orderpriority",
        F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
        F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
    )


@register(
    "unpivot_part_measures",
    oracle="""
SELECT p_partkey, measure, round(val, 2) AS val
FROM (
  SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS val FROM part
  UNION ALL
  SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS val FROM part
)
""",
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide numeric columns → (key, measure, value) long
    form — one Expand pass (each input row fans out to n_measures rows
    in-place), not a self-union that scans the table per measure."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").alias("retailprice"),
        )
        .unpivot(
            ids=["p_partkey"],
            values=["size", "retailprice"],
            variableColumnName="measure",
            valueColumnName="__val",
        )
        .select("p_partkey", "measure", F.round("__val", 2).alias("val"))
    )


@register(
    "having_frequent_buyers",
    oracle="""
SELECT o_custkey, count(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 15
""",
)
def having_frequent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 15)
    )


@register(
    "scalar_try_functions",
    oracle="""
SELECT event_id,
       CASE WHEN user_id % 3 = 0 THEN NULL
            ELSE round(value / CAST(user_id % 3 AS DOUBLE), 6) END AS safe_ratio,
       TRY_CAST(event_type AS BIGINT) AS bad_cast,
       TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS good_cast,
       CASE WHEN len(str_split(event_type, '_')) >= 2
            THEN str_split(event_type, '_')[2] END AS second_part
FROM events
""",
)
def scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI error-safe scalar surface: `try_divide` (NULL on /0 instead of
    failing the job or emitting Inf), `try_cast` (NULL on malformed input —
    here a non-numeric string vs a numeric JSON field), `try_element_at`
    (NULL past the end). At 100 TB these are the difference between one
    poison row killing a 10-hour job under ANSI mode and a NULL the
    downstream aggregate ignores."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.round(
            F.try_divide("value", (F.col("user_id") % 3).cast("double")), 6
        ).alias("safe_ratio"),
        F.expr("try_cast(event_type AS BIGINT)").alias("bad_cast"),
        F.expr(
            "try_cast(get_json_object(props, '$.k') AS BIGINT)"
        ).alias("good_cast"),
        F.try_element_at(F.split("event_type", "_"), F.lit(2)).alias(
            "second_part"
        ),
    )
