"""Data-quality audit: declared constraints checked corpus-wide in one
query — the validation gate a production pipeline runs before promoting a
snapshot (and before spending GPU-hours training on it). Null checks, range
checks, uniqueness, and referential integrity each produce one (check_name,
violations) row; a clean corpus yields all zeros, and the oracle recomputes
every count independently in DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_flink_spark.registry import register
from twitter_flink_spark.sources.tables import load_table


@register(
    "dq_constraint_violations",
    oracle="""
SELECT 'orders_negative_totalprice' AS check_name,
       CAST(count(CASE WHEN o_totalprice < 0 THEN 1 END) AS BIGINT) AS violations
FROM orders
UNION ALL
SELECT 'orders_null_custkey',
       CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'lineitem_nonpositive_quantity',
       CAST(count(CASE WHEN l_quantity <= 0 THEN 1 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'events_null_user',
       CAST(count(CASE WHEN user_id IS NULL THEN 1 END) AS BIGINT)
FROM events
UNION ALL
SELECT 'events_duplicate_ids',
       CAST(count(*) - count(DISTINCT event_id) AS BIGINT)
FROM events
UNION ALL
SELECT 'orders_orphan_custkey',
       CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS
  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
UNION ALL
SELECT 'lineitem_orphan_orderkey',
       CAST(count(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS
  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
""",
)
def dq_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One pass per table for the scalar constraints (conditional counts
    fused into a single aggregate — NOT one scan per check), plus one
    left-anti join per foreign key. At 100 TB: the per-table scans are the
    unavoidable cost and carry every scalar check at once; the FK checks
    broadcast the key side when it fits and degrade to shuffled anti-joins
    when it doesn't — exactly the join Catalyst would pick for NOT EXISTS."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")

    def row(name: str, agg_df: DataFrame) -> DataFrame:
        return agg_df.select(
            F.lit(name).alias("check_name"),
            F.col("violations").cast("long").alias("violations"),
        )

    scalar_orders = orders.agg(
        F.count(F.when(F.col("o_totalprice") < 0, 1)).alias("neg_price"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_cust"),
    ).select(
        # stack unpivots BOTH checks out of the one aggregate row — the
        # orders scan runs once, not once per check
        F.expr(
            "stack(2, 'orders_negative_totalprice', CAST(neg_price AS BIGINT),"
            " 'orders_null_custkey', CAST(null_cust AS BIGINT))"
            " AS (check_name, violations)"
        )
    )
    parts = [
        scalar_orders,
        row("lineitem_nonpositive_quantity",
            lineitem.agg(F.count(F.when(F.col("l_quantity") <= 0, 1))
                         .alias("violations"))),
        row("events_null_user",
            events.agg(F.count(F.when(F.col("user_id").isNull(), 1))
                       .alias("violations"))),
        row("events_duplicate_ids",
            events.agg((F.count(F.lit(1)) - F.countDistinct("event_id"))
                       .alias("violations"))),
        row("orders_orphan_custkey",
            orders.join(customer,
                        orders.o_custkey == customer.c_custkey,
                        "left_anti")
                  .agg(F.count(F.lit(1)).alias("violations"))),
        row("lineitem_orphan_orderkey",
            lineitem.join(orders,
                          lineitem.l_orderkey == orders.o_orderkey,
                          "left_anti")
                    .agg(F.count(F.lit(1)).alias("violations"))),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
