"""Streaming sources: deterministic file-replay over the driver's parquet
tables (the testable stand-in for the reference's live Twitter source,
`TopNHashtags.java:94-95`; SURVEY.md §7 M4).

Spark's file stream source requires a *directory*, and the testdata dir
holds all tables side by side — so we stage a per-run temp directory with a
symlink to the one table file (testdata stays read-only, nothing is copied).
In production this source is Kafka (`spark.readStream.format("kafka")`) or a
landing directory; everything downstream is identical.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_flink_spark.sources.tables import TABLES


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """readStream over one testdata table with the same nanosecond-timestamp
    normalization the batch loader applies (sources/tables.py)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    staged = tempfile.mkdtemp(prefix=f"tfs-stream-{name}-")
    link = os.path.join(staged, f"{name}.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, f"{name}.parquet"), link)
    schema = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet")).schema
    df = spark.readStream.schema(schema).parquet(staged)
    for col in TABLES.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            # integer DIV — see sources/tables.py on double-mantissa loss
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} DIV 1000")))
    return df
