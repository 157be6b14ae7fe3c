"""File-layout utilities: small-files compaction must preserve data and
hit the target file count."""

from __future__ import annotations

import os

from twitter_flink_spark.sources.files import compact_parquet, scratch_dir
from twitter_flink_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_compaction_reduces_file_count(spark):
    e = load_table(spark, SF_DIR, "events")
    src = scratch_dir("compact-src")
    dst = scratch_dir("compact-dst")
    # simulate a streaming sink's small-files problem: 64 splinter files
    e.repartition(64).write.mode("overwrite").parquet(src)
    n_small = sum(
        1 for _, _, fs in os.walk(src) for f in fs if f.endswith(".parquet")
    )
    assert n_small >= 64
    n_out = compact_parquet(spark, src, dst, target_file_bytes=1 * 1024 * 1024)
    assert n_out < n_small
    assert spark.read.parquet(dst).count() == e.count()


def test_spread_repartitions_underfilled_file_scan(spark, tmp_path):
    """A scan backed by fewer files than default parallelism gets a keyed
    repartition; the decision comes from file METADATA (inputFiles), not a
    DataFrame->RDD conversion."""
    from twitter_flink_spark.sources.tables import spread

    p = str(tmp_path / "one")
    spark.range(100).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) == 1
    out = spread(df, "id")
    n = spark.sparkContext.defaultParallelism
    assert "RoundRobinPartitioning" in out._jdf.queryExecution().toString() or (
        f"hashpartitioning(id" in out._jdf.queryExecution().executedPlan().toString()
    )
    assert out.count() == 100


def test_spread_leaves_non_file_input_alone(spark):
    """In-memory relations report no files; their partitioning came from
    the session, so spread() must not inject a shuffle."""
    from twitter_flink_spark.sources.tables import spread

    df = spark.range(10).select("id")
    assert df.inputFiles() == []
    out = spread(df, "id")
    assert out is df  # literal no-op
