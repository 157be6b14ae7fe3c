"""Expectations routing: single-pass enforcement + inline ledger."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitter_flink_spark.operators.expectations import (
    ROUTE_COL,
    Rule,
    good_path,
    route,
)


def test_route_partitions_input_and_counts_raw(spark, tmp_path):
    """Routes must PARTITION the input under drop > quarantine
    precedence (a row failing both is dropped, never double-routed)
    while per-rule counts stay raw; a NULL predicate verdict counts as
    a violation (unknown never waves a row through); the written
    directories hold exactly the routed rows."""
    df = spark.createDataFrame(
        [
            (1, 10.0, "ok"),     # good
            (2, -5.0, "ok"),     # quarantined (neg value)
            (None, -7.0, "ok"),  # drop wins over quarantine
            (4, 1.0, None),      # NULL predicate verdict -> quarantined
            (None, 3.0, "ok"),   # dropped
        ],
        "user_id int, value double, tag string",
    )
    rules = [
        Rule("value_nonneg", "value >= 0", "quarantine"),
        Rule("tag_ok", "tag = 'ok'", "quarantine"),
        Rule("user_present", "user_id IS NOT NULL", "drop"),
        Rule("value_small", "value < 100", "warn"),
    ]
    dest = str(tmp_path / "routed")
    ledger, _ = route(df, rules, dest)

    assert ledger["rule_value_nonneg"] == 2  # raw: includes the dropped row
    assert ledger["rule_tag_ok"] == 1
    assert ledger["rule_user_present"] == 2
    assert ledger["rule_value_small"] == 0
    assert ledger["route_dropped"] == 2
    assert ledger["route_quarantined"] == 2
    assert ledger["route_good"] == 1
    # routes partition the input
    assert (
        ledger["route_good"]
        + ledger["route_quarantined"]
        + ledger["route_dropped"]
        == df.count()
    )

    back = spark.read.parquet(dest)
    on_disk = {
        r[ROUTE_COL]: r["n"]
        for r in back.groupBy(ROUTE_COL).agg(F.count("*").alias("n")).collect()
    }
    assert on_disk == {"good": 1, "quarantined": 2, "dropped": 2}
    assert [r["user_id"] for r in spark.read.parquet(good_path(dest)).collect()] == [1]


def test_route_single_job_ledger_and_bad_action(spark, tmp_path):
    """The ledger must come from the WRITE job itself (CollectMetrics in
    the observed plan — no second scan), and an unknown action raises
    before any data is touched."""
    df = spark.range(10).select(F.col("id").cast("int").alias("user_id"))
    rules = [Rule("present", "user_id IS NOT NULL", "drop")]
    routed = df.withColumn(ROUTE_COL, F.lit("good"))
    # plan shape: observe() injects CollectMetrics above the scan
    from pyspark.sql import Observation

    obs = Observation("probe")
    plan = (
        routed.observe(obs, F.sum(F.lit(1)).alias("n"))
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert "CollectMetrics" in plan

    with pytest.raises(ValueError, match="unknown action"):
        route(df, [Rule("x", "user_id IS NOT NULL", "discard")], str(tmp_path / "d"))

    ledger, _ = route(df, rules, str(tmp_path / "ok"))
    assert ledger["route_good"] == 10 and ledger["rule_present"] == 0
