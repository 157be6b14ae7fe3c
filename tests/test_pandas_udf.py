"""pandas_udf surface: the Arrow-vectorized cosine must equal the JVM
builtin to float tolerance (the builtin is what oracle-checked queries use;
the UDF is the sanctioned custom-Python pattern)."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_flink_spark.functions.vectors import (
    cosine_builtin,
    cosine_pandas,
    norm_pandas,
)
from twitter_flink_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_pandas_cosine_equals_builtin(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    a = emb.where(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("ida"), F.col("embedding").alias("ea")
    )
    b = emb.where((F.col("vec_id") >= 50) & (F.col("vec_id") < 60)).select(
        F.col("vec_id").alias("idb"), F.col("embedding").alias("eb")
    )
    pairs = a.crossJoin(F.broadcast(b))
    both = pairs.select(
        "ida",
        "idb",
        cosine_pandas(F.col("ea"), F.col("eb")).alias("c_udf"),
        cosine_builtin(F.col("ea"), F.col("eb")).alias("c_jvm"),
    )
    diffs = both.select(F.max(F.abs(F.col("c_udf") - F.col("c_jvm"))).alias("d"))
    assert diffs.collect()[0]["d"] < 1e-9


def test_pandas_norm_positive(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.select(norm_pandas(F.col("embedding")).alias("n"))
    row = n.agg(F.min("n").alias("mn"), F.max("n").alias("mx")).collect()[0]
    assert row["mn"] > 0
