"""SQL-language surface: recursive CTEs and correlated LATERAL subqueries
(both landed in Spark 4.x SQL). The reference has no query language at all
(SURVEY.md §3 — its "plan" is an imperative DataStream DAG); these pin the
engine's declarative surface where DataFrame code has no direct equivalent.
Queries run through ``spark.sql`` over temp views of the testdata tables, so
the text is the same ANSI shape DuckDB executes as the oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from twitter_flink_spark.registry import register
from twitter_flink_spark.sources.tables import load_table


def _view(spark: SparkSession, sf_dir: str, name: str) -> None:
    load_table(spark, sf_dir, name).createOrReplaceTempView(name)


_MONTH_SERIES_SQL = """
WITH RECURSIVE months(m, mend) AS (
  -- the end bound is computed ONCE in the anchor and carried as a column:
  -- a scalar subquery in the recursive term would re-scan orders on every
  -- iteration (measured 20s vs <2s at sf0.01)
  SELECT date_trunc('month', min(o_orderdate)),
         date_trunc('month', max(o_orderdate))
  FROM orders
  UNION ALL
  SELECT m + INTERVAL 1 MONTH, mend FROM months WHERE m < mend
),
mc AS (
  SELECT date_trunc('month', o_orderdate) AS m,
         count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1
)
SELECT months.m AS month_start,
       CAST(coalesce(mc.n_orders, 0) AS BIGINT) AS n_orders,
       mc.revenue
FROM months LEFT JOIN mc ON mc.m = months.m
"""


@register("recursive_cte_month_series", oracle=_MONTH_SERIES_SQL)
def recursive_cte_month_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled monthly series via WITH RECURSIVE: the anchor is the
    corpus's first month, each step adds one month up to the last — so
    months with zero orders still appear (count 0, NULL revenue), which a
    plain GROUP BY cannot produce. Recursion depth = number of months
    (bounded, tiny) — the result side stays a normal broadcast-able dim
    joined to the aggregated facts; the fact table is scanned once for the
    aggregate and twice for the min/max bounds (columnar min/max scans)."""
    _view(spark, sf_dir, "orders")
    return spark.sql(_MONTH_SERIES_SQL)


_LATERAL_TOPK_SQL = """
SELECT c.c_custkey, l.o_orderkey, round(l.o_totalprice, 2) AS totalprice
FROM customer c,
LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 3
) l
"""


@register("lateral_topk_orders_per_customer", oracle=_LATERAL_TOPK_SQL)
def lateral_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    declarative form of "top 3 orders per customer". Catalyst decorrelates
    this to a join + per-group limit rather than re-running the inner query
    per customer row (same physical family as the window-rank formulation
    in `rank_orders_per_customer`, arrived at from the SQL side).
    Deterministic tie-break on o_orderkey keeps both engines identical."""
    _view(spark, sf_dir, "customer")
    _view(spark, sf_dir, "orders")
    return spark.sql(_LATERAL_TOPK_SQL)
