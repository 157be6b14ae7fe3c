"""Similarity-operator guards: the brute-force path must refuse a
non-broadcast-sized query set instead of silently degrading to an
O(n*q) all-pairs pass (VERDICT r2 item 3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitter_flink_spark.operators.similarity import topk_neighbors


def _vectors(spark, n: int):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double"), F.lit(1.0), F.lit(0.5)
        ).alias("embedding"),
    )


def test_bruteforce_refuses_oversized_query_set(spark):
    corpus = _vectors(spark, 50)
    queries = _vectors(spark, 20)
    with pytest.raises(ValueError, match="broadcasts the query side"):
        topk_neighbors(corpus, queries, k=2, max_broadcast_queries=10)


def test_bruteforce_runs_under_the_bound(spark):
    corpus = _vectors(spark, 50)
    queries = _vectors(spark, 5)
    out = topk_neighbors(corpus, queries, k=2, max_broadcast_queries=10)
    rows = out.collect()
    assert {r.query_id for r in rows} == set(range(5))
    assert all(1 <= r["rank"] <= 2 for r in rows)


def test_ivf_path_skips_the_guard(spark):
    """cell-restricted (IVF) scoring is the sanctioned large-query path —
    no broadcast bound applies."""
    corpus = _vectors(spark, 50).withColumn("cell", F.col("vec_id") % 3)
    queries = _vectors(spark, 30).withColumn("cell", F.col("vec_id") % 3)
    out = topk_neighbors(
        corpus, queries, k=1, cell_col="cell", max_broadcast_queries=10
    )
    assert out.count() > 0
