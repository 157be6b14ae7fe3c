"""Similarity search over embedding columns (north-star: SURVEY.md §2.3).

All vector math is built-in higher-order functions (`zip_with` +
`aggregate`) on `array<float>` cast to double — JVM-side, no Python UDF in
the hot path. (A pandas_udf variant exists in functions/vectors.py for the
API-surface demonstration, but the oracle-checked queries use builtins.)

Scale design:
- Brute-force top-k: queries (small set) are BROADCAST against the corpus;
  the probe side streams — no shuffle of the corpus. Per-query top-k via
  WindowGroupLimit (heap before shuffle). 100 TB corpus => each task scores
  its partition locally and ships k rows per query.
- IVF-style ANN: restrict scoring to the query's coarse cell (here the
  `label` column as the quantizer; in production, a k-means assignment
  column). The join becomes an equi-join on the cell id — partition
  pruning for vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Double-precision dot product of two array columns (left-to-right
    accumulation — same order DuckDB's list_cosine_similarity uses)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


#: brute-force path cap: the query side is broadcast, so it must stay
#: executor-memory-sized. 64k queries x (few-KB vector + norm) ~ low
#: hundreds of MB — at the edge of a sane broadcast. Beyond it the
#: brute-force plan silently degrades to an O(n*q) all-pairs pass; refuse
#: and point at the bucketed paths instead.
MAX_BROADCAST_QUERIES = 65536


def topk_neighbors(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
    max_broadcast_queries: int = MAX_BROADCAST_QUERIES,
) -> DataFrame:
    """Top-k cosine neighbors per query vector.

    ``cell_col`` None → brute force (broadcast queries x full corpus),
    guarded: raises ``ValueError`` when the query side exceeds
    ``max_broadcast_queries`` rows — use the IVF path (``cell_col``) or
    ``lsh_sign_bands`` for a non-broadcast-sized query set.
    ``cell_col`` set → IVF-style: only score corpus rows in the query's
    cell (equi-join on the cell column).
    Output: (query_id, neighbor_id, cosine, rank) with deterministic
    tie-break (cosine desc, neighbor_id asc).
    """
    if cell_col is None:
        # limit(bound+1).count() touches at most bound+1 rows — a cheap
        # pre-flight action, not a full count of the query table
        probe = queries.limit(max_broadcast_queries + 1).count()
        if probe > max_broadcast_queries:
            raise ValueError(
                f"brute-force topk_neighbors broadcasts the query side, but "
                f"it has > {max_broadcast_queries} rows; use cell_col= (IVF) "
                f"or lsh_sign_bands for a corpus-sized query set"
            )
    # norms are computed ONCE per vector before the join — inside the pair
    # fan-out they would be re-evaluated per pair (3x the higher-order-fn
    # work; numerically identical since the expressions are unchanged)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("__qnorm"),
        *([F.col(cell_col).alias("__qcell")] if cell_col else []),
    )
    # repartition the probe (corpus) side: the broadcast join preserves its
    # partitioning, so a single-file corpus would otherwise score every
    # (query x corpus) pair in one task regardless of cluster size; keyed
    # off the scan's FILE metadata (plan-level, no DataFrame->RDD
    # conversion) so a real-scale corpus (already well-split) skips the
    # shuffle entirely
    from twitter_flink_spark.sources.tables import spread

    c = spread(corpus, id_col)
    c = c.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("__cnorm"),
        *([F.col(cell_col).alias("__ccell")] if cell_col else []),
    )
    if cell_col:
        joined = c.join(F.broadcast(q), F.col("__qcell") == F.col("__ccell"))
    else:
        joined = c.crossJoin(F.broadcast(q))
    scored = (
        joined.where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot(F.col("__qvec"), F.col("__cvec"))
                / (F.col("__qnorm") * F.col("__cnorm"))
            ).alias("__cos"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("__cos"), 6).alias("cosine"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (sign-bit SimHash over embeddings)


def random_hyperplanes(
    n_planes: int, dim: int, seed: int = 42
) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes, coefficients rounded to 6
    decimals so the SAME literals embed in the Spark expression and the
    DuckDB oracle (bit-for-bit identical sign computations)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return [
        [round(float(x), 6) for x in rng.standard_normal(dim)]
        for _ in range(n_planes)
    ]


def lsh_sign_bands(
    vectors: DataFrame,
    planes: list[list[float]],
    bands: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, band_sig) where band_sig concatenates the sign bits of
    `len(planes)//bands` hyperplane dot products.

    Two vectors collide in a band with prob (1 - angle/pi)^r — banding
    trades recall for candidate count. All JVM-side: the dot products are
    zip_with/aggregate against literal arrays, one pass, no shuffle until
    the (band, sig) self-join.
    """
    r = len(planes) // bands
    bits = [
        F.when(dot(F.col(vec_col), F.array(*[F.lit(c) for c in p])) > 0, "1")
        .otherwise("0")
        for p in planes
    ]
    sigs = F.array(
        *[F.concat(*bits[b * r : (b + 1) * r]) for b in range(bands)]
    )
    return vectors.select(
        F.col(id_col), F.posexplode(sigs).alias("band", "band_sig")
    )
