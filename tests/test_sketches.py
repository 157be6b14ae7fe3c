"""Error-bound tests for the sketch aggregates: the estimate must land
within the sketch's configured accuracy of the exact value computed from
the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_flink_spark.queries.sketches import (
    approx_distinct_users_per_type,
    approx_value_percentiles_per_type,
)
from twitter_flink_spark.queries.temporal import value_percentiles_per_type
from twitter_flink_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_hll_within_rsd(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_users_per_type(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for key, est in approx.items():
        # rsd=1%; allow 5 sigma
        assert abs(est - exact[key]) <= max(1, 0.05 * exact[key]), (
            key, est, exact[key],
        )


def test_approx_percentiles_close_to_exact(spark):
    approx = {
        r["event_type"]: (r["p25"], r["p50"], r["p75"], r["p95"])
        for r in approx_value_percentiles_per_type(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: (r["p25"], r["p50"], r["p75"], r["p95"])
        for r in value_percentiles_per_type(spark, SF_DIR).collect()
    }
    for key in exact:
        for a, x in zip(approx[key], exact[key]):
            # GK sketch bounds RANK error, not value error; at this data's
            # density a generous 10% relative value tolerance holds easily
            assert abs(a - x) <= 0.10 * max(1.0, abs(x)), (key, a, x)
