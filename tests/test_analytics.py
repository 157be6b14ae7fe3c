"""Analytics-module specifics not covered by the oracle sweep: the
observe() metrics contract and the funnel's monotone stage invariant."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from twitter_flink_spark.queries.analytics import (
    funnel_conversion_steps,
    observed_clean_events,
)

SF_DIR = "/root/testdata/sf0.001"


def test_observe_metrics_collected_during_main_pass(spark):
    """Metrics arrive from the SAME execution as the query result — no
    second scan — and agree with independently computed values."""
    obs = Observation("dq")
    kept = observed_clean_events(spark, SF_DIR, observation=obs)
    n_rows = kept.count()  # one action drives both result and metrics
    m = obs.get
    assert m["n_kept"] == n_rows
    expected_neg = kept.where(F.col("value") < 0).count()
    assert m["n_negative"] == expected_neg
    assert m["mean_value"] is not None


def test_funnel_stages_monotone(spark):
    rows = {
        r["stage"]: r["n_users"]
        for r in funnel_conversion_steps(spark, SF_DIR).collect()
    }
    assert set(rows) == {"view", "click", "purchase"}
    assert rows["view"] >= rows["click"] >= rows["purchase"] >= 0
    assert rows["view"] > 0


def test_pareto_frontier_empty_and_single(spark):
    from twitter_flink_spark.queries.analytics import pareto_frontier

    empty = spark.createDataFrame([], "id long, cost long, gain long")
    assert pareto_frontier(empty, "cost", "gain").count() == 0
    one = spark.createDataFrame([(1, 5, 5)], "id long, cost long, gain long")
    assert pareto_frontier(one, "cost", "gain").count() == 1


def test_streaks_empty_and_duplicate_days(spark):
    from datetime import date

    from twitter_flink_spark.queries.analytics import longest_daily_streaks

    empty = spark.createDataFrame([], "u long, d date")
    assert longest_daily_streaks(empty, "u", "d").count() == 0
    # duplicate (user, day) rows must not inflate a streak
    dup = spark.createDataFrame(
        [(1, date(2024, 1, 1))] * 3 + [(1, date(2024, 1, 2))],
        "u long, d date",
    )
    rows = longest_daily_streaks(dup, "u", "d").collect()
    assert [(r.u, r.longest_streak) for r in rows] == [(1, 2)]


def test_pareto_frontier_null_cost_rows_pass_through(spark):
    """NOT-EXISTS dominance semantics for null costs: `y.cost < NULL` is
    never true, so a null-cost row is neither dominated nor dominates —
    it must survive unchanged instead of being dropped by the level
    join's equi-key."""
    from twitter_flink_spark.queries.analytics import pareto_frontier

    df = spark.createDataFrame(
        [(1, 1, 10), (2, 2, 5), (3, None, 99), (4, 2, 11)],
        "id long, cost long, gain long",
    )
    got = {r.id for r in pareto_frontier(df, "cost", "gain").collect()}
    # id=2 dominated by id=1 (cheaper, gain 10 >= 5); id=3 null cost kept;
    # id=4 gain 11 > cheaper max 10 so kept
    assert got == {1, 3, 4}
