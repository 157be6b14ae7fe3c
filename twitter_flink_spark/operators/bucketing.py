"""Bucketed tables: pre-shuffle a table ONCE at write time so every later
join/aggregate on the bucket key runs shuffle-free.

At 100 TB this is the difference between re-exchanging the fact table for
every query and paying one distribution at ingest: two tables bucketed into
the same bucket count on their join key sort-merge-join with ZERO Exchange
(tests/test_plans.py asserts this), and a groupBy on the bucket key needs
no exchange either. The reference has no storage layer at all (SURVEY.md
§2.2 "Scans") — this is the scan/sink story a batch engine needs.

Buckets also bound task memory: bucket count is chosen so one bucket of the
biggest table fits an executor (`rows * row_width / buckets << executor
memory`), and AQE cannot coalesce away bucketed-scan parallelism.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _drop_table_and_location(spark: SparkSession, table: str) -> None:
    """DROP the table and clear a stale physical location — a managed
    table's directory can outlive the (in-memory) catalog that created it,
    and saveAsTable refuses locations it didn't register."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 8,
    sorted_by_key: bool = True,
) -> None:
    """Persist ``df`` as a parquet table hash-bucketed (and optionally
    sorted) by ``key``. Sorting inside buckets lets sort-merge joins skip
    the per-task sort too."""
    _drop_table_and_location(df.sparkSession, table)
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    )
    if sorted_by_key:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; Catalyst knows its distribution from the
    catalog, so joins/aggs on the bucket key add no Exchange."""
    return spark.table(table)
