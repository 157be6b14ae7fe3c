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

Scale shape per iteration: centroids ride as ONE packed k-entry array on
a broadcast; assignment is a per-row ``array_min`` over struct(dist, cid)
inside the scan's own projection (no shuffle, no per-vector sort — the
corpus never moves); the update aggregates the assigned rows directly
(the argmin keeps the vector on the row, so no join back to the corpus)
into per-dimension DECIMAL sums — exactly one exchange per round, k x dim
partials per task. The iteration scaffolding (localCheckpoint + block
freeing) is shared with `operators/graph.py`.
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


def checkpointed_write(
    df: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Parquet-write a DRIVER-BUILT frame (`createDataFrame`-backed — a
    fitted codebook, a `_meta` manifest) through a localCheckpoint.

    With Arrow enabled, a file-write job over a Python-local relation
    re-serves the Arrow batches from the driver and stalls ~4-5 s per
    write REGARDLESS of row count (measured r16: a 4-row centroid write
    took 4.5-6.5 s; the identical frame localCheckpointed first, 0.4-
    0.8 s — and half of the r15 streaming-IVF regression was exactly
    this stall inside the centroid freeze). Materializing to JVM blocks
    first turns the write into a block read; the blocks are freed as
    soon as the write commits. Only worth it for driver-built frames —
    scan-backed frames never pay the stall."""
    sc = df.sparkSession.sparkContext
    before = _persistent_rdd_ids(sc)
    cp = df.localCheckpoint()
    ids = _persistent_rdd_ids(sc) - before
    try:
        cp.coalesce(1).write.mode(mode).parquet(path)
    finally:
        _unpersist_ids(sc, ids)


def _pack_rows(spark, rows, g: list, fields: dict) -> DataFrame:
    """Local packed-candidate frame from already-collected centroid rows
    (fields: name -> StructField for the g columns, cid and cent) — the
    zero-job path `kmeans_fit` uses between Lloyd rounds, where the rows
    are in hand and a DataFrame round-trip would cost a job per round."""
    from pyspark.sql.types import ArrayType, StructField, StructType

    groups: dict[tuple, list] = {}
    for r in rows:
        groups.setdefault(tuple(r[c] for c in g), []).append(
            (r["cid"], r["cent"])
        )
    schema = StructType(
        [fields[c] for c in g]
        + [
            StructField(
                "_tfs_cands",
                ArrayType(
                    StructType([fields["cid"], fields["cent"]])
                ),
            )
        ]
    )
    return spark.createDataFrame(
        [(*key, cands) for key, cands in groups.items()], schema
    )


def _scored_expr(vec_col: str):
    """Per-candidate scores as an array of struct(dist, cid): the SAME
    squared-L2 dot identity (|v|^2 - 2<v,c> + |c|^2, left-to-right
    accumulation) the window formulation computed per joined row, with
    the struct field order making array_min / array_sort tie-break on
    the lower cid — exactly the old ``ORDER BY dist ASC, cid ASC``."""
    return F.transform(
        F.col("_tfs_cands"),
        lambda c: F.struct(
            (
                F.col("_tfs_sq")
                - 2 * dot(F.col(vec_col), c["cent"])
                + dot(c["cent"], c["cent"])
            ).alias("dist"),
            c["cid"].alias("cid"),
        ),
    )


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
    of the argmin.

    Deliberately the row_number-over-window form. A map-side
    array-argmin rewrite (pack the k candidates into one broadcast
    array, array_min over struct(dist, cid) per row — see `kmeans_fit`,
    which keeps that shape internally) was interleaved-A/B'd against
    this in r15: result-identical, at par for standalone batch
    consumers (the window's exchange is k-row-per-vector metadata, not
    payload), but 1.5-2x SLOWER for foreachBatch sinks that evaluate
    the assignment twice (count + write re-pay the candidate-packing
    stage, and the per-call centroid collect serializes against the
    micro-batch machinery). The window form stays because it is lazy,
    single-stage to plan, and every caller's centroid side is a k-row
    broadcast either way."""
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
    w = Window.partitionBy(*keys).orderBy(
        F.col("dist").asc(), F.col("cid").asc()
    )
    out_cols = keys + ["cid"] + (["dist"] if keep_dist else [])
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_n)
        .select(*out_cols)
    )


def _centroid_means(rows: DataFrame, g: list) -> DataFrame:
    """([group,] cid, cent, n_vecs) from (*g, cid, _tfs_e) member rows:
    the decimal-exact posexplode -> (cid, dim) aggregate -> sort_array
    re-assembly. (A 64-sum single-aggregate variant was A/B-measured
    2.2x SLOWER per Lloyd round — its generated aggregate code never
    amortizes — and is therefore not used; this explode shape compiles
    small and its exchange carries only k x dim decimal partials after
    map-side combine.)"""
    comp = rows.select(
        *g,
        "cid",
        F.posexplode(F.col("_tfs_e")).alias("pos0", "val"),
    ).select(
        *g,
        "cid",
        (F.col("pos0") + 1).alias("dim"),
        F.round("val", _COMP_SCALE)
        .cast(f"decimal(28,{_COMP_SCALE})")
        .alias("val"),
    )
    dims = comp.groupBy(*g, "cid", "dim").agg(
        F.sum("val").alias("s"), F.count(F.lit(1)).alias("n")
    )
    return (
        dims.select(
            *g,
            "cid",
            "n",
            F.struct(
                "dim", (F.col("s").cast("double") / F.col("n")).alias("c")
            ).alias("dc"),
        )
        .groupBy(*g, "cid")
        .agg(
            F.expr(
                "transform(sort_array(collect_list(dc)), s -> s.c)"
            ).alias("cent"),
            F.max("n").alias("n_vecs"),
        )
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
    members = assigned.join(vectors, on=[id_col] + g).select(
        *g, "cid", F.col(vec_col).alias("_tfs_e")
    )
    return _centroid_means(members, g)


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
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    spark = vectors.sparkSession
    sc = spark.sparkContext
    g = [group_col] if group_col else []
    v = vectors.select(
        *g, id_col, F.col(vec_col).cast("array<double>").alias("e")
    )
    before = _persistent_rdd_ids(sc)
    v = v.localCheckpoint()
    v_ids = _persistent_rdd_ids(sc) - before
    # centroids are k-row driver-sized BY DEFINITION (the session
    # codebook caches hold them as collected rows for the same reason),
    # so the Lloyd loop round-trips them through the driver: each round
    # is ONE job — scan the checkpointed corpus, per-row array argmin
    # (map-side, no shuffle, no sort), the decimal means aggregate over
    # the vector the argmin kept on the row, collect k rows — and the
    # next round's candidate array enters the plan as a LocalTableScan
    # broadcast (built driver-side, no distributed broadcast-build
    # sub-job). The previous shape paid per round: a window Exchange +
    # sort for the argmin, an id-keyed join back to the corpus, a
    # localCheckpoint materialization AND a broadcast-build job — all
    # for the same bits (A/B: cold fit 8.2 -> 3.4 s, steady-state ~par).
    cent_schema = StructType(
        [StructField(c, v.schema[c].dataType) for c in g]
        + [
            StructField("cid", v.schema[id_col].dataType),
            StructField("cent", ArrayType(DoubleType())),
            StructField("n_vecs", LongType()),
        ]
    )
    rows = (
        v.where(F.col(id_col) < k)
        .select(
            *g,
            F.col(id_col).alias("cid"),
            F.col("e").alias("cent"),
            F.lit(1).cast("long").alias("n_vecs"),
        )
        .collect()
    )
    cent_fields = {f.name: f for f in cent_schema.fields}
    for _ in range(iters):
        # rows are already in hand: pack them locally (zero jobs) —
        # round cost is exactly ONE job, the means aggregate's collect
        packed = _pack_rows(spark, rows, g, cent_fields)
        base = v.withColumn("_tfs_sq", dot(F.col("e"), F.col("e")))
        joined = (
            base.join(F.broadcast(packed), on=group_col)
            if group_col
            else base.crossJoin(F.broadcast(packed))
        )
        members = joined.select(
            *g,
            F.array_min(_scored_expr("e"))["cid"].alias("cid"),
            F.col("e").alias("_tfs_e"),
        )
        rows = _centroid_means(members, g).collect()
    _unpersist_ids(sc, v_ids)
    return spark.createDataFrame(rows, cent_schema)


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
    checkpointed_write(new_cents, tmp_c)
    disk_cents = spark.read.parquet(tmp_c)  # freeze doubles on disk
    new_assign = assign_clusters(v, disk_cents, id_col=id_col)
    new_assign.write.mode("overwrite").partitionBy("cid").parquet(tmp_a)
    new_baseline = assigned_mean_dist(
        v, disk_cents, spark.read.parquet(tmp_a), id_col=id_col
    )
    checkpointed_write(ivf_meta_df(spark, new_baseline, k, iters), tmp_m)
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
