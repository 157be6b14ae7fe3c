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
