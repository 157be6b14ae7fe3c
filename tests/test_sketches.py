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


def test_hll_shard_union_equals_direct_and_bounds_error(spark):
    """Merging per-shard HLL sketches must give EXACTLY the same estimate
    as one sketch over all rows (mergeability identity — what makes the
    rollup pattern safe), and the estimate must sit within HLL error of
    the exact distinct count."""
    from pyspark.sql import functions as F

    from twitter_flink_spark.registry import QUERIES
    from twitter_flink_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.01"
    got = {
        r.event_type: (r.n_shards, r.est_users)
        for r in QUERIES["hll_shard_union_rollup"](spark, sf).collect()
    }
    ev = load_table(spark, sf, "events")
    direct = {
        r.event_type: r.est
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
        .collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(direct) == set(exact)
    for et, (n_shards, est) in got.items():
        assert n_shards == 8
        assert est == direct[et], (et, est, direct[et])  # mergeability
        assert abs(est - exact[et]) <= max(3, 0.05 * exact[et]), (
            et,
            est,
            exact[et],
        )
