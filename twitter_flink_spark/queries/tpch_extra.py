"""Extended TPC-H-shaped coverage (SURVEY.md §2 relational north-star):
the multi-join / correlated-subquery / grouping-set shapes of TPC-H
Q7/Q8/Q9/Q12/Q15/Q16/Q21/Q22, adapted to the driver's schema (no partsupp
table, no l_shipmode/l_commitdate/c_phone columns — each docstring states
the adaptation), plus GROUPING SETS, ntile, and an array-agg round-trip.

Scale shapes: every dimension join (nation, region, supplier, part,
customer) is broadcast; fact-fact correlations (Q21's same-order lineitem
tests) are semi/anti joins on the already-shuffled orderkey — one fact
shuffle feeds all three join legs under AQE stage reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from twitter_flink_spark.registry import register
from twitter_flink_spark.sources.tables import load_table


@register(
    "q7_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS yr,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping between two nations, by year). The two
    nation filters are pushed into broadcast hash joins on a single
    lineitem scan — the fact table shuffles zero times before the final
    3-key aggregate."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rev = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .where(
            pair
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return rev.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").cast("long").alias("yr"),
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


@register(
    "q8_market_share",
    oracle="""
WITH all_nations AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n1.n_name AS nation
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n2.n_regionkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
)
SELECT yr,
       round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM all_nations GROUP BY yr
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share inside a region, by year): one
    conditional aggregate over the region-filtered volume — the CASE stays
    inside the same partial agg, no second pass."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
    )
    return (
        base.select(
            F.year("o_orderdate").cast("long").alias("yr"),
            vol.alias("volume"),
            F.col("nation"),
        )
        .groupBy("yr")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_profit",
    oracle="""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS yr,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS sum_profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit by supplier nation and year for a part-name
    family). Adaptation: the schema has no partsupp, so profit drops the
    ps_supplycost * l_quantity term — the join/aggregate topology (the
    point of Q9) is unchanged."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").contains("widget"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("yr"),
        )
        .agg(
            # exact DECIMAL sum: per-(nation, yr) groups are small enough
            # that float summation order flips the cent digit cross-engine
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
            )
            .cast("double")
            .alias("sum_profit")
        )
    )


@register(
    "q12_shipping_latency_priority",
    oracle="""
SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
            THEN 'late' ELSE 'ontime' END AS latency,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
""",
)
def q12_shipping_latency_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (priority counts by shipping class). Adaptation: no
    l_shipmode column, so the class is a ship-latency bucket — the
    conditional dual-count aggregate over a fact-fact join is the Q12
    operator under test."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            F.when(
                F.col("l_shipdate") > F.date_add("o_orderdate", 60), "late"
            )
            .otherwise("ontime")
            .alias("latency"),
            F.when(high, 1).otherwise(0).alias("is_high"),
        )
        .groupBy("latency")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (supplier(s) with the maximum period revenue). The scalar
    max is a 1-row broadcast joined back against the revenue CTE — the CTE
    is computed once and reused for both legs (rounded to 2dp on both
    engines before the equality, so float summation order can't flip the
    winner)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        l.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("__mx"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_counts_by_part",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#5' AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
GROUP BY 1, 2, 3
""",
)
def q16_supplier_counts_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (distinct suppliers per part group). Adaptation: no
    partsupp, so the part-supplier relation is derived from lineitem. The
    distinct-count expands to a two-level aggregate (Spark's
    count(distinct) rewrite) — partial dedup before the final count."""
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q21_waiting_supplier",
    oracle="""
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s.s_name
""",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (the only supplier who shipped late on a
    multi-supplier order). Adaptation: no l_receiptdate/l_commitdate, so
    "late" is shipdate > orderdate + 60d. The EXISTS / NOT EXISTS pair
    decorrelates to a semi-join + anti-join on orderkey against pair-level
    aggregates (any other supplier / any other LATE supplier per order) —
    one lineitem shuffle feeds both legs."""
    s = load_table(spark, sf_dir, "supplier")
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    joined = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.date_add("o_orderdate", 60)).alias("is_late"),
    )
    # EXISTS(other supplier)        ⇔ distinct suppliers on the order > 1
    # NOT EXISTS(other LATE supplier) for a late row
    #                               ⇔ distinct LATE suppliers == 1 (just me)
    # → the two correlated subqueries collapse into ONE per-order aggregate
    #   on the orderkey shuffle the late rows already need.
    per_order = joined.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    late = joined.where(F.col("is_late")).select("l_orderkey", "l_suppkey")
    return (
        late.join(
            per_order.where(
                (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
            ),
            "l_orderkey",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
WITH avg_bal AS (
  SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
)
SELECT n.n_name, count(*) AS numcust,
       round(sum(c.c_acctbal), 2) AS totacctbal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= DATE '2000-08-01')
GROUP BY n.n_name
""",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (above-average-balance customers gone idle).
    Adaptations: no c_phone, so the grouping key is the customer's nation;
    and because every testdata customer has orders, "idle" means no order in
    the corpus's final year (>= 2000-08-01) rather than never — same NOT
    EXISTS anti-join shape, but the gate returns real rows at every SF.
    Scalar avg broadcast, NOT EXISTS as an anti-join on custkey; the date
    filter pushes into the orders scan before the anti-join builds."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .join(
            o.where(F.col("o_orderdate") >= "2000-08-01"),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "grouping_sets_flag_status",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
""",
)
def grouping_sets_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((a),(b)) — NOT expressible as rollup/cube (no (a,b)
    or () set), exercising the general grouping-set expand operator: one
    scan expanded 2x, one aggregate, same as the oracle's plan."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("tfs_lineitem_gs")
    return li.sparkSession.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
        FROM tfs_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "ntile_customer_balance_quartiles",
    oracle="""
WITH q AS (
  SELECT c_acctbal,
         CAST(ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS BIGINT)
           AS quartile
  FROM customer
)
SELECT quartile, count(*) AS n_customers,
       round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal
FROM q GROUP BY quartile
""",
)
def ntile_customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing (equi-depth quartiles of account balance) with a
    fully deterministic tie-break, then per-bucket min/max — the windowed
    bucketing primitive behind stratified sampling of training data."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").asc(), F.col("c_custkey").asc())
    return (
        c.select(
            "c_acctbal", F.ntile(4).over(w).cast("long").alias("quartile")
        )
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
    )


@register(
    "array_agg_tokens_roundtrip",
    oracle="""
SELECT doc_id,
       array_to_string(list_sort(list(token)), ' ') AS sorted_tokens,
       count(*) AS n_tokens
FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY doc_id
""",
)
def array_agg_tokens_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list → sort_array → array_join: the array-aggregation
    primitive (grouping rows back into a typed array column), emitted as a
    canonical string so both engines hash identically."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    return toks.groupBy("doc_id").agg(
        F.array_join(F.sort_array(F.collect_list("token")), " ").alias(
            "sorted_tokens"
        ),
        F.count(F.lit(1)).alias("n_tokens"),
    )


@register(
    "q11_important_parts",
    oracle="""
WITH pv AS (
  SELECT l_partkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS part_value
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM pv
WHERE part_value > 1.1 * (SELECT avg(part_value) FROM pv)
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification), adapted: no
    partsupp table, so "stock value" per part = lineitem revenue. The
    HAVING threshold is a scalar subquery over the SAME aggregate —
    TPC-H's `0.0001/SF` fraction made scale-free as 1.1x the mean part
    value (a fixed global fraction selects nothing at 10x the parts).
    Plan: one shuffle agg, the 1-row mean broadcast back — the agg is NOT
    recomputed (Catalyst reuses the exchange under AQE)."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = li.groupBy("l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "part_value"
        )
    )
    thresh = pv.agg((F.avg("part_value") * 1.1).alias("t"))
    return pv.join(F.broadcast(thresh)).where(
        F.col("part_value") > F.col("t")
    ).select("l_partkey", "part_value")


@register(
    "q18_large_volume_orders",
    oracle="""
SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 300
)
GROUP BY 1, 2, 3, 4, 5
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
""",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume orders): IN over a grouped-HAVING subquery
    on the same fact table. Spark: the qualifying-orderkey set is a
    semi-join build side; both lineitem aggregations shuffle on
    l_orderkey, so AQE plans one exchange feeding both; customer is a
    broadcast dim. Deterministic LIMIT: ties broken by orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .where(F.col("sq") > 300)
        .select("l_orderkey")
    )
    joined = (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
    )
    return (
        joined.groupBy(
            "c_name", "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


@register(
    "q20_dominant_part_suppliers",
    oracle="""
WITH sp AS (
  SELECT l_suppkey, l_partkey, sum(l_quantity) AS q
  FROM lineitem GROUP BY 1, 2
),
pt AS (
  SELECT l_partkey, sum(q) AS tq, count(*) AS ns FROM sp GROUP BY 1
)
SELECT s.s_name, sp.l_suppkey, count(*) AS n_parts_dominated
FROM sp
JOIN pt USING (l_partkey)
JOIN supplier s ON s.s_suppkey = sp.l_suppkey
WHERE sp.q > 2.0 * pt.tq / pt.ns
GROUP BY 1, 2
""",
)
def q20_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-availability suppliers), adapted: no
    partsupp/availqty, so a supplier "dominates" a part when its shipped
    quantity exceeds 2x the mean per-supplier quantity for that part — the
    same correlated-threshold semi-join chain (per-group agg joined back
    against a coarser agg of itself). Both aggs share the (partkey)
    shuffle; supplier is broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(F.sum("l_quantity").alias("q"))
    pt = sp.groupBy("l_partkey").agg(
        F.sum("q").alias("tq"), F.count(F.lit(1)).alias("ns")
    )
    dom = sp.join(pt, "l_partkey").where(
        F.col("q") > 2.0 * F.col("tq") / F.col("ns")
    )
    return (
        dom.join(F.broadcast(s), dom.l_suppkey == s.s_suppkey)
        .groupBy("s_name", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_parts_dominated"))
    )
