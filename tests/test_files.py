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
