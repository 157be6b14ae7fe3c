"""Similarity-search queries over `embeddings` (north-star), oracle-checked
via DuckDB's list_cosine_similarity on DOUBLE[] (double accumulation on both
sides; results rounded to 6 decimals)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_flink_spark.operators.similarity import cosine, topk_neighbors
from twitter_flink_spark.registry import register
from twitter_flink_spark.sources.tables import load_table


@register(
    "cosine_topk_bruteforce",
    oracle="""
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[],
                                      c.embedding::DOUBLE[]), 6) AS cosine,
         CAST(row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                            c.embedding::DOUBLE[]) DESC,
                     c.vec_id ASC) AS INTEGER) AS rank
  FROM embeddings q
  JOIN embeddings c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 5
)
WHERE rank <= 5
""",
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for query vectors vec_id < 5: broadcast
    queries x streamed corpus, per-query heap (WindowGroupLimit). The
    baseline every ANN variant is measured against."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return topk_neighbors(emb, queries, k=5)


@register(
    "cosine_topk_ivf_label",
    oracle="""
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_cosine_similarity(q.embedding::DOUBLE[],
                                      c.embedding::DOUBLE[]), 6) AS cosine,
         CAST(row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                            c.embedding::DOUBLE[]) DESC,
                     c.vec_id ASC) AS INTEGER) AS rank
  FROM embeddings q
  JOIN embeddings c ON c.vec_id <> q.vec_id AND c.label = q.label
  WHERE q.vec_id < 5
)
WHERE rank <= 5
""",
)
def cosine_topk_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: score only vectors in the query's coarse cell (the
    `label` column stands in for a k-means assignment). Equi-join on the
    cell id ⇒ the scan prunes to matching cells — the scale path when
    brute force stops fitting the latency budget."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return topk_neighbors(emb, queries, k=5, cell_col="label")


@register(
    "embedding_cosine_neardup",
    oracle="""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a
JOIN embeddings b ON a.vec_id < b.vec_id AND a.label = b.label
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
""",
)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within the same label cell (blocked
    all-pairs — the cell join bounds the pair space exactly like dedup
    blocking keys; threshold 0.4 for this corpus whose max off-diagonal
    cosine is ~0.51)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("label"), F.col("embedding").alias("__ea")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("label"), F.col("embedding").alias("__eb")
    )
    return (
        a.join(b, on="label")
        .where(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            cosine(F.col("__ea"), F.col("__eb")).alias("__cos"),
        )
        .where(F.col("__cos") >= 0.4)
        .select("vec_a", "vec_b", F.round("__cos", 6).alias("cosine"))
    )
