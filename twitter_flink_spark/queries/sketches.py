"""Approximate (sketch-based) aggregates — the 100 TB replacements for
exact distinct-count and exact percentile, whose exact forms appear in
`distinct_customers_per_status` / `value_percentiles_per_type`.

Both sketches are mergeable partials: each task builds a bounded-size
sketch over its partition and the shuffle carries sketches, not rows —
distinct-count state goes from O(distinct keys) to ~1.5 KB (HLL++ at 1%
rsd) and percentile state from a full sort to a fixed-size digest.

No `oracle_sql()` entries: sketch estimates are engine-specific (Spark's
HLL++/Greenwald-Khanna vs DuckDB's HLL/t-digest differ in the low bits),
so the driver applies its rows-only check; the REAL check is
tests/test_sketches.py, which bounds the estimates against the exact
values computed by the engine itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_flink_spark.registry import register
from twitter_flink_spark.sources.tables import load_table


@register("approx_distinct_users_per_type")
def approx_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type (rsd=1%)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("approx_value_percentiles_per_type")
def approx_value_percentiles_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna, accuracy 10000 ≈ 0.01% rank
    error) for the same quantiles `value_percentiles_per_type` computes
    exactly."""
    e = load_table(spark, sf_dir, "events")
    pcts = F.expr(
        "approx_percentile(value, array(0.25, 0.5, 0.75, 0.95), 10000)"
    )
    return e.groupBy("event_type").agg(
        pcts[0].alias("p25"),
        pcts[1].alias("p50"),
        pcts[2].alias("p75"),
        pcts[3].alias("p95"),
    )
