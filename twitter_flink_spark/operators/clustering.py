"""K-means (Lloyd) clustering over embedding columns — the IVF codebook /
coarse-quantizer build step of a vector index (`cosine_topk_ivf_label`
scores within a cell; this operator is how the cells get built).

Fixed-iteration, deterministic, oracle-expressible:

- seeds are the k lowest vector ids (a pure function of the data — no RNG);
- assignment: squared L2 via the dot-product identity
  ``|x|^2 - 2<x,c> + |c|^2`` — every dot is the same left-to-right
  accumulation DuckDB's list_dot_product uses, so distances are
  bit-identical across engines, and the argmin tie-breaks on cluster id;
- update: per-dimension component sums accumulate ROUNDED DECIMALS
  (exact, partition-order independent), divided once by the cluster size;
- a cluster that loses all members simply drops out (deterministic on
  both sides) rather than being re-seeded.

Scale shape per iteration: centroids are a k-row broadcast; assignment is
a map-side cross of each vector against k centroids (no shuffle of the
corpus); the update is one shuffle keyed by (cluster, dim). The iteration
scaffolding (localCheckpoint + block freeing) is shared with
`operators/graph.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from twitter_flink_spark.operators.graph import (
    _persistent_rdd_ids,
    _unpersist_ids,
)
from twitter_flink_spark.operators.similarity import dot

#: decimal scale for centroid component accumulation
_COMP_SCALE = 7


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "e",
    group_col: str | None = None,
    keep_dist: bool = False,
    top_n: int = 1,
) -> DataFrame:
    """(id[, group], cid[, dist]): nearest centroid per vector, ties to
    the lower cid. With ``group_col``, centroids are a PER-GROUP codebook
    (product-quantization subspaces, per-shard codebooks): candidates
    join on the group key instead of crossing, still broadcast — the
    centroid table is k x groups rows. ``top_n > 1`` keeps the n nearest
    centroids per vector (the IVF nprobe query-side expansion) instead
    of the argmin."""
    joined = (
        vectors.join(F.broadcast(centroids), on=group_col)
        if group_col
        else vectors.crossJoin(F.broadcast(centroids))
    )
    d = joined.withColumn(
        "dist",
        dot(F.col(vec_col), F.col(vec_col))
        - 2 * dot(F.col(vec_col), F.col("cent"))
        + dot(F.col("cent"), F.col("cent")),
    )
    keys = [id_col] + ([group_col] if group_col else [])
    w = Window.partitionBy(*keys).orderBy(F.col("dist").asc(), F.col("cid").asc())
    out_cols = keys + ["cid"] + (["dist"] if keep_dist else [])
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_n)
        .select(*out_cols)
    )


def update_centroids(
    vectors: DataFrame,
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "e",
    group_col: str | None = None,
) -> DataFrame:
    """([group,] cid, cent, n_vecs): decimal-exact per-dimension means.
    With ``group_col``, means are computed independently per group in the
    SAME aggregation pipeline — subspace count never multiplies jobs."""
    g = [group_col] if group_col else []
    comp = (
        assigned.join(vectors, on=[id_col] + g)
        .select(
            *g,
            "cid",
            F.posexplode(F.col(vec_col)).alias("pos0", "val"),
        )
        .select(
            *g,
            "cid",
            (F.col("pos0") + 1).alias("dim"),
            F.round("val", _COMP_SCALE)
            .cast(f"decimal(28,{_COMP_SCALE})")
            .alias("val"),
        )
    )
    dims = comp.groupBy(*g, "cid", "dim").agg(
        F.sum("val").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        dims.select(
            *g,
            "cid",
            "n",
            F.struct("dim", (F.col("s").cast("double") / F.col("n")).alias("c")).alias(
                "dc"
            ),
        )
        .groupBy(*g, "cid")
        .agg(
            F.expr("transform(sort_array(collect_list(dc)), s -> s.c)").alias(
                "cent"
            ),
            F.max("n").alias("n_vecs"),
        )
    )


def kmeans_fit(
    vectors: DataFrame,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str | None = None,
) -> DataFrame:
    """Run ``iters`` Lloyd rounds from the k lowest-id seeds; returns
    ([group,] cid, cent array<double>, n_vecs) for the surviving
    clusters. With ``group_col``, fits an INDEPENDENT codebook per group
    (e.g. one per product-quantization subspace) in the same fixed number
    of Spark jobs — per-group work rides the same shuffles, so codebook
    count scales for free."""
    sc = vectors.sparkSession.sparkContext
    g = [group_col] if group_col else []
    v = vectors.select(
        *g, id_col, F.col(vec_col).cast("array<double>").alias("e")
    )
    before = _persistent_rdd_ids(sc)
    v = v.localCheckpoint()
    v_ids = _persistent_rdd_ids(sc) - before
    cents = v.where(F.col(id_col) < k).select(
        *g,
        F.col(id_col).alias("cid"),
        F.col("e").alias("cent"),
        F.lit(1).cast("long").alias("n_vecs"),
    )
    cent_ids: set[int] = set()
    for _ in range(iters):
        assigned = assign_clusters(
            v, cents.select(*g, "cid", "cent"), group_col=group_col
        )
        before = _persistent_rdd_ids(sc)
        new_cents = update_centroids(
            v, assigned, group_col=group_col
        ).localCheckpoint()
        new_ids = _persistent_rdd_ids(sc) - before
        _unpersist_ids(sc, cent_ids)
        cents, cent_ids = new_cents, new_ids
    _unpersist_ids(sc, v_ids)
    return cents


# -- drift-triggered refit (the incremental IVF index's weekly fit) ---------


def ivf_meta_df(
    spark, fit_mean_dist: float, k: int, iters: int
) -> DataFrame:
    """One-row `_meta` manifest for a persisted IVF index: the fit-time
    mean assignment distance (the drift baseline) plus the fit
    parameters, riding the index like the Bloom manifest's m/k so a
    refit can never re-fit with skewed settings."""
    return spark.createDataFrame(
        [(float(fit_mean_dist), int(k), int(iters))],
        "fit_mean_dist double, k int, iters int",
    )


def assigned_mean_dist(
    vectors: DataFrame,
    centroids: DataFrame,
    assigned: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "e",
) -> float:
    """Mean squared-L2 distance of each vector to the centroid of its
    STORED assignment — the serving-quality number a drift monitor
    watches (measuring against the stored cid, not a fresh argmin, means
    a stale assignment table reads as drift and triggers repair).
    Distances are rounded to a fixed grain and summed in DECIMAL, so the
    mean is bit-stable across engines and partition orders."""
    d = (
        vectors.select(id_col, vec_col)
        .join(assigned.select(id_col, "cid"), id_col)
        .join(F.broadcast(centroids.select("cid", "cent")), "cid")
        .select(
            (
                dot(F.col(vec_col), F.col(vec_col))
                - 2 * dot(F.col(vec_col), F.col("cent"))
                + dot(F.col("cent"), F.col("cent"))
            ).alias("dist")
        )
    )
    row = d.agg(
        F.sum(F.round("dist", 6).cast("decimal(38,6)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    if not row["n"]:
        return 0.0
    return float(row["s"]) / int(row["n"])


def ivf_refit_on_drift(
    spark,
    index_dir: str,
    vectors: DataFrame,
    threshold: float = 4.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Close the loop the drift monitor opens: measure the index's
    serving quality (mean distance of every indexed vector to its
    STORED centroid, `assigned_mean_dist`) against the fit-time baseline
    in `_meta`; if the ratio exceeds ``threshold``, refit the centroids
    on ``vectors`` (the same deterministic Lloyd as the original build),
    reassign everything, and atomically cut the index over — new
    `_assign` (partitioned by cid), new `_centroids`, new `_meta`
    baseline, each committed by the tmp-write + rename-swap protocol.
    Below the threshold the call is a PURE no-op (no write, no swap).

    The production cadence this encodes: assignments stream in against
    frozen centroids (`O(new)` appends); this job runs on the weekly
    timer and only pays the full refit when the data actually moved.

    Crash posture: swaps run assign -> centroids -> meta. Any mixed
    generation a crash leaves behind measures as INFLATED drift on the
    next call (distances are taken against the stored cid through the
    current centroids), so the refit simply refires — deterministic
    Lloyd makes the redo idempotent — and the final meta swap restores
    ratio ~1. Returns {fired, ratio, measured, baseline}."""
    import os

    meta = spark.read.parquet(os.path.join(index_dir, "_meta")).first()
    k, iters = int(meta["k"]), int(meta["iters"])
    baseline = float(meta["fit_mean_dist"])
    cents = spark.read.parquet(os.path.join(index_dir, "_centroids"))
    assigned = spark.read.parquet(os.path.join(index_dir, "_assign"))
    v = vectors.select(
        id_col, F.col(vec_col).cast("array<double>").alias("e")
    )
    measured = assigned_mean_dist(v, cents, assigned, id_col=id_col)
    ratio = (measured / baseline) if baseline > 0 else (
        float("inf") if measured > 0 else 1.0
    )
    out = {"ratio": ratio, "measured": measured, "baseline": baseline}
    if ratio <= threshold:
        return {"fired": False, **out}
    new_baseline = _ivf_full_refit(
        spark, index_dir, vectors, k, iters, id_col, vec_col
    )
    return {"fired": True, **out, "baseline_after": new_baseline}


def _ivf_full_refit(
    spark,
    index_dir: str,
    vectors: DataFrame,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """The shared FIRING body of every refit trigger (drift- and
    imbalance-based): deterministic Lloyd on ``vectors``, reassign
    everything to the frozen on-disk doubles, and atomically cut the
    index over assign -> centroids -> meta (each a tmp-write +
    rename-swap; a crash-torn mix measures as inflated drift/skew on
    the next run and the deterministic refit refires idempotently).
    Returns the new `_meta` baseline mean distance."""
    import os
    import shutil

    from twitter_flink_spark.operators.skipping import _swap_dirs

    v = vectors.select(
        id_col, F.col(vec_col).cast("array<double>").alias("e")
    )
    cents_dir = os.path.join(index_dir, "_centroids")
    assign_dir = os.path.join(index_dir, "_assign")
    meta_dir = os.path.join(index_dir, "_meta")
    tmp_c, tmp_a, tmp_m = (
        cents_dir + ".refit",
        assign_dir + ".refit",
        meta_dir + ".refit",
    )
    new_cents = kmeans_fit(
        vectors, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    ).select("cid", "cent")
    for t in (tmp_c, tmp_a, tmp_m):
        shutil.rmtree(t, ignore_errors=True)
    new_cents.coalesce(1).write.mode("overwrite").parquet(tmp_c)
    disk_cents = spark.read.parquet(tmp_c)  # freeze doubles on disk
    new_assign = assign_clusters(v, disk_cents, id_col=id_col)
    new_assign.write.mode("overwrite").partitionBy("cid").parquet(tmp_a)
    new_baseline = assigned_mean_dist(
        v, disk_cents, spark.read.parquet(tmp_a), id_col=id_col
    )
    ivf_meta_df(spark, new_baseline, k, iters).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp_m)
    _swap_dirs(tmp_a, assign_dir)
    _swap_dirs(tmp_c, cents_dir)
    _swap_dirs(tmp_m, meta_dir)
    return new_baseline


def ivf_imbalance_factor(spark, index_dir: str) -> float:
    """max cell / mean cell over the persisted assignment table — the
    skew statistic `ivf_cell_balance_report` surfaces (1.0 = perfectly
    balanced; the biggest cell bounds worst-case probe latency). One
    groupBy at the index's metadata grain (k cells), no vector math.

    The mean divides by the index's FITTED k (from `_meta`), not the
    observed non-empty cell count: an index degenerated into one cell
    (deletes/compaction emptied the rest) is the WORST imbalance, but a
    non-empty-cells mean would score it exactly 1.0 and the refit
    trigger would never fire on the index it exists to rescue. Falls
    back to observed cells for indexes without a `_meta`."""
    import os

    counts = (
        spark.read.parquet(os.path.join(index_dir, "_assign"))
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )
    t = counts.agg(
        F.sum("n_vecs").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.max("n_vecs").alias("mx"),
    ).first()
    if not t["n"]:
        return 1.0
    k = int(t["k"])
    meta_path = os.path.join(index_dir, "_meta")
    if os.path.isdir(meta_path):
        k = max(k, int(spark.read.parquet(meta_path).first()["k"]))
    return int(t["mx"]) * k / int(t["n"])


def ivf_refit_on_imbalance(
    spark,
    index_dir: str,
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """The SKEW-triggered sibling of `ivf_refit_on_drift` — closing the
    loop `ivf_cell_balance_report` opened: when the imbalance factor
    (max cell / mean cell) of the persisted assignment table exceeds
    ``threshold``, the index's whole reason to exist (scanning ~N/k per
    probe instead of N) is compromised, so refit on ``vectors`` with
    the same deterministic Lloyd and atomically cut over (shared
    `_ivf_full_refit` body — identical crash posture and idempotence).
    At or below the threshold the call is a PURE no-op: the trigger
    reads only the k-cell occupancy aggregate, never a vector. Returns
    {fired, imbalance[, baseline_after]}."""
    imb = ivf_imbalance_factor(spark, index_dir)
    if imb <= threshold:
        return {"fired": False, "imbalance": imb}
    import os

    meta = spark.read.parquet(os.path.join(index_dir, "_meta")).first()
    new_baseline = _ivf_full_refit(
        spark,
        index_dir,
        vectors,
        int(meta["k"]),
        int(meta["iters"]),
        id_col,
        vec_col,
    )
    return {
        "fired": True,
        "imbalance": imb,
        "baseline_after": new_baseline,
    }
