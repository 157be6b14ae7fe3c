"""Python DataSource connector (sources/pyds.py): batch/stream equivalence
and source-side filter pushdown."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan

from twitter_flink_spark.sources.pyds import (
    SOURCE_NAME,
    SyntheticStatusBatchReader,
    register_datasource,
    status_row,
)

N = 500


def test_batch_read_matches_generator(spark):
    register_datasource(spark)
    rows = (
        spark.read.format(SOURCE_NAME)
        .option("rows", N)
        .option("numPartitions", 4)
        .load()
        .collect()
    )
    assert len(rows) == N
    got = {r.status_id: (r.status_id, r.text, list(r.tags), r.lang) for r in rows}
    for i in (0, 1, N // 2, N - 1):
        assert got[i] == status_row(i)


def test_stream_read_equals_batch(spark):
    """Micro-batch replay of the same id range must produce exactly the
    batch dataset, across several triggers (rowsPerBatch < rows)."""
    register_datasource(spark)
    stream = (
        spark.readStream.format(SOURCE_NAME)
        .option("rows", N)
        .option("rowsPerBatch", 128)
        .option("numPartitions", 3)
        .load()
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("pyds_stream_sink")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        # availableNow snapshots latestOffset() ONCE, which a rate-limited
        # reader reports one batch at a time — so drive the query until the
        # whole range has been replayed, then stop.
        import time

        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if spark.sql("SELECT count(*) c FROM pyds_stream_sink").first().c >= N:
                break
            time.sleep(0.5)
        q.stop()
    out = spark.sql(
        "SELECT status_id, text, tags, lang FROM pyds_stream_sink"
    ).collect()
    assert len(out) == N
    assert {r.status_id for r in out} == set(range(N))
    sample = {r.status_id: (r.status_id, r.text, list(r.tags), r.lang) for r in out}
    for i in (0, 127, 128, N - 1):  # batch-boundary ids included
        assert sample[i] == status_row(i)


def test_lang_filter_pushed_into_reader():
    reader = SyntheticStatusBatchReader({"rows": "64", "numPartitions": "2"})
    leftover = list(
        reader.pushFilters(
            [EqualTo(("lang",), "en"), GreaterThan(("status_id",), 10)]
        )
    )
    # lang equality absorbed; range predicate handed back to Spark
    assert reader.lang_filter == "en"
    assert leftover == [GreaterThan(("status_id",), 10)]
    produced = [
        row for part in reader.partitions() for row in reader.read(part)
    ]
    assert produced and all(r[3] == "en" for r in produced)


def test_pushdown_filter_not_reapplied_post_scan(spark):
    """With the filter absorbed by the connector there must be no residual
    `lang = en` Filter above the scan in the optimized plan."""
    register_datasource(spark)
    df = (
        spark.read.format(SOURCE_NAME)
        .option("rows", "64")
        .load()
        .where(F.col("lang") == "en")
    )
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # a residual (un-pushed) equality would print as `lang#N = en`
    assert "= en)" not in optimized, optimized
    assert df.count() == sum(1 for i in range(64) if status_row(i)[3] == "en")
