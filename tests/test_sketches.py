"""Error-bound tests for the sketch aggregates: the estimate must land
within the sketch's configured accuracy of the exact value computed from
the same data. The registered queries emit exact-value + within-bound
boolean columns (driver-hashable — round-5 change); these tests keep the
TIGHT bounds on the raw estimates the queries no longer output."""

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
    ev = load_table(spark, SF_DIR, "events")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("est"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # rsd=1%; allow 5 sigma
        assert abs(r.est - r.exact) <= max(1, 0.05 * r.exact), (
            r.event_type, r.est, r.exact,
        )
    # and the registered query's boolean contract agrees
    out = approx_distinct_users_per_type(spark, SF_DIR).collect()
    assert all(r.within_rsd for r in out)
    exact = {r.event_type: r.exact for r in rows}
    assert {r.event_type: r.exact_users for r in out} == exact


def test_approx_percentiles_close_to_exact(spark):
    ev = load_table(spark, SF_DIR, "events")
    approx = {
        r.event_type: r.ap
        for r in ev.groupBy("event_type")
        .agg(
            F.expr(
                "approx_percentile(value, array(0.25, 0.5, 0.75, 0.95), 10000)"
            ).alias("ap")
        )
        .collect()
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
    # the registered query emits the exact quantiles + rank-window boolean
    out = approx_value_percentiles_per_type(spark, SF_DIR).collect()
    assert all(r.within_rank_eps for r in out)
    assert {r.event_type: (r.p25, r.p50, r.p75, r.p95) for r in out} == exact


def test_hll_shard_union_equals_direct_and_bounds_error(spark):
    """Merging per-shard HLL sketches must give EXACTLY the same estimate
    as one sketch over all rows at this scale (mergeability identity —
    what makes the rollup pattern safe; at larger scale the union path
    may differ by a few counts once registers saturate), and the estimate
    must sit within HLL error of the exact distinct count."""
    from twitter_flink_spark.registry import QUERIES

    sf = "/root/testdata/sf0.01"
    ev = load_table(spark, sf, "events").withColumn(
        "shard", F.pmod(F.col("event_id"), F.lit(8))
    )
    union_est = {
        r.event_type: r.est
        for r in ev.groupBy("event_type", "shard")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()
    }
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
    assert set(union_est) == set(direct) == set(exact)
    for et, est in union_est.items():
        assert est == direct[et], (et, est, direct[et])  # mergeability
        assert abs(est - exact[et]) <= max(3, 0.05 * exact[et]), (
            et, est, exact[et],
        )
    # registered query contract: exact distinct + all-shards + bound ok
    got = {
        r.event_type: (r.n_shards, r.exact_users, r.within_bound)
        for r in QUERIES["hll_shard_union_rollup"](spark, sf).collect()
    }
    assert set(got) == set(exact)
    for et, (n_shards, exact_users, within) in got.items():
        assert n_shards == 8
        assert exact_users == exact[et]
        assert within
