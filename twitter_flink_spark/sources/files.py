"""Batch file-format sources & sinks beyond parquet: CSV and JSON-lines,
plus partitioned parquet layout.

Reference analog: the reference has NO file formats at all (SURVEY.md §2.2
"Scans / sources / sinks" — its only source is the live Twitter stream).
These fill the standard lakehouse surface: schema-explicit readers (never
inferSchema in production — one pass of inference over 100 TB costs a full
scan), header+timestamp-format pinned writers, and directory partitioning
so equality predicates prune entire directories before any IO.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

#: pinned so CSV timestamps survive a write→read round-trip losslessly
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("timestampFormat", _TS_FMT).json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("timestampFormat", _TS_FMT)
        .json(path)
    )


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: tuple[str, ...]
) -> None:
    """Directory-partitioned parquet: one dir per partition-column value.
    Equality/IN predicates on partition columns prune whole directories at
    planning time (`PartitionFilters` in explain) — zero IO for pruned
    values, the cheapest filter there is at 100 TB. Keep partition-column
    cardinality modest (<~10k dirs) or the file listing dominates."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ~target-sized files; returns the
    output file count.

    Small-files compaction is a first-class maintenance op at scale:
    streaming sinks and fine-grained partitioning produce thousands of
    KB-sized files whose per-file open/footer cost dominates scans. One
    `repartition(n)` round-robin shuffle yields uniformly sized outputs
    (coalesce would skip the shuffle but inherits upstream skew)."""
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, fs in os.walk(src_path)
        for f in fs
        if f.endswith(".parquet")
    )
    n = max(1, -(-total // target_file_bytes))  # ceil-div
    spark.read.parquet(src_path).repartition(n).write.mode(
        "overwrite"
    ).parquet(dst_path)
    return sum(
        1
        for _, _, fs in os.walk(dst_path)
        for f in fs
        if f.endswith(".parquet")
    )


def scratch_dir(tag: str) -> str:
    """Per-run scratch directory for sink round-trips (driver runs queries
    repeatedly in one process; each run writes fresh)."""
    return os.path.join(tempfile.mkdtemp(prefix=f"tfs-{tag}-"), tag)
