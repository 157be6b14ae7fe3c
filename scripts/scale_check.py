"""Empirical scale spot-check (round-11 VERDICT item 8): run three
headline queries at sf0.1 and at a synthetic ~10x volume, and record the
wall-time ratio. Near-linear ratios (~10x work on 32 local cores => ~10x
wall unless a stage is super-linear) are the pass criterion; a
super-linear query is a bottleneck to find and fix.

The 10x corpus is built by replicating the sf0.1 tables with id offsets:

- documents: each replica's tokens are PREFIXED with a replica tag
  (c<k>_token), so every replica is an isolated near-dup universe —
  cross-replica Jaccard is 0 and the true pair set scales exactly 10x.
  Naive duplication would instead put 10 identical docs in every band
  bucket (10-doc cliques => ~100x candidate pairs), measuring a
  different workload, not the same one scaled.
- embeddings: identical vectors, offset vec_ids — cells get 10x
  occupancy, the geometry (and therefore the plan shape) is unchanged.

Each query runs twice per scale: run 1 pays the once-per-sf staged
fixture builds (signing / codebook fits — themselves part of the scaling
story), run 2 is the steady state. Writes SCALECHECK_r{N}.json.

Usage: python scripts/scale_check.py [round] [copies]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

QUERIES = ["flagship_topn_semijoin", "dedup_minhash_lsh", "ivf_pq_ann_topk"]
BASE_SF = "/root/testdata/sf0.1"


def build_scaled_dir(spark: SparkSession, copies: int) -> str:
    out = os.path.join(
        tempfile.gettempdir(), f"tfs-scale{copies}x-sf0.1"
    )
    if os.path.isdir(os.path.join(out, "documents.parquet")) and os.path.isdir(
        os.path.join(out, "embeddings.parquet")
    ):
        return out  # built by an earlier run
    os.makedirs(out, exist_ok=True)
    docs = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(BASE_SF, "embeddings.parquet"))
    max_doc = docs.agg(F.max("doc_id")).first()[0] + 1
    max_vec = emb.agg(F.max("vec_id")).first()[0] + 1

    doc_parts = []
    for k in range(copies):
        d = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(k * max_doc)
        )
        if k:
            # replica-tag every token: keeps each replica an isolated
            # near-dup universe (see module docstring)
            d = d.withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split("text", " "),
                        lambda t: F.concat(F.lit(f"c{k}_"), t),
                    ),
                ),
            )
        doc_parts.append(d)
    big_docs = doc_parts[0]
    for d in doc_parts[1:]:
        big_docs = big_docs.unionByName(d)
    big_docs.write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )

    big_emb = emb
    for k in range(1, copies):
        big_emb = big_emb.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * max_vec))
        )
    big_emb.write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    # small tables some fixtures touch incidentally: symlink from base
    for t in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        src = os.path.join(BASE_SF, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    return out


def time_queries(spark: SparkSession, sf_dir: str) -> dict:
    import __spark_entry__ as m

    qs = m.queries()
    res = {}
    for name in QUERIES:
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.perf_counter() - t0, 2))
        spark.catalog.clearCache()
        res[name] = {"cold_s": runs[0], "warm_s": runs[1]}
    return res


def maintenance_check(spark: SparkSession, big_dir: str) -> dict:
    """Round-13 VERDICT item 5: the incremental-LSH-maintenance claim —
    per-batch update cost is O(batch), not O(index) — measured instead
    of argued. Three timed `lsh_index_update` calls:

    - batch B1 (~1/8 of the sf0.1 corpus) against a SMALL index
      (1 replica) and against a BIG index (all replicas): the
      `index_size_ratio` should sit near 1 — the update re-signs only
      the batch, and its coverage consult is a pushed-filter scan of
      the marker slice, the only index-proportional touch.
    - batch B4 (~4x B1) against the same big index: `batch_size_ratio`
      should grow toward 4 — the cost lives with the batch.
    """
    import shutil

    from twitter_flink_spark.operators.dedup import (
        lsh_index_build,
        lsh_index_update,
    )

    docs_all = spark.read.parquet(
        os.path.join(big_dir, "documents.parquet")
    )
    docs_base = spark.read.parquet(
        os.path.join(BASE_SF, "documents.parquet")
    )
    max_doc = docs_base.agg(F.max("doc_id")).first()[0] + 1
    rep0 = docs_all.where(F.col("doc_id") < max_doc)
    # ~1/8 and ~4/8 of the replica: big enough that per-batch work
    # (shingle+sign+band the batch) dominates fixed job overhead
    b1 = F.col("doc_id") % 8 == 0
    b4 = (F.col("doc_id") % 8 >= 1) & (F.col("doc_id") % 8 <= 4)
    batch1 = rep0.where(b1)
    batch4 = rep0.where(b4)
    # lsh_index_update returns only BAND-ELIGIBLE docs (>= ngram=3
    # tokens — shorter docs can never produce a shingle); count the
    # batches under the same filter or a short doc in the batch makes
    # the equality assertion below fire spuriously
    eligible = F.size(F.split(F.col("text"), " ")) >= 3
    n1 = batch1.where(eligible).count()
    n4 = batch4.where(eligible).count()

    work = os.path.join(tempfile.gettempdir(), "tfs-scalecheck-maint")
    shutil.rmtree(work, ignore_errors=True)
    small_idx = os.path.join(work, "small")
    big_idx = os.path.join(work, "big")
    rep0_pred = F.col("doc_id") < max_doc
    n_small = lsh_index_build(spark, rep0.where(~b1), small_idx)
    # exclude ONLY replica 0's held-out batches: the big index keeps all
    # other replicas whole, so it is a genuine ~10x of the small one
    n_big = lsh_index_build(
        spark, docs_all.where(~(rep0_pred & (b1 | b4))), big_idx
    )

    def timed(batch, idx):
        t0 = time.perf_counter()
        n = lsh_index_update(spark, batch, idx)
        return round(time.perf_counter() - t0, 2), n

    t_small, u_small = timed(batch1, small_idx)
    t_big, u_big = timed(batch1, big_idx)
    t_big4, u_big4 = timed(batch4, big_idx)
    assert u_small == u_big == n1 and u_big4 == n4
    out = {
        "operator": "lsh_index_update",
        "index_docs": {"small": n_small, "big": n_big},
        "batch_docs": {"b1": n1, "b4": n4},
        "update_b1_small_index_s": t_small,
        "update_b1_big_index_s": t_big,
        "update_b4_big_index_s": t_big4,
        "index_size_ratio": round(t_big / max(t_small, 1e-9), 2),
        "batch_size_ratio": round(t_big4 / max(t_big, 1e-9), 2),
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def skipping_consult_check(spark: SparkSession, copies: int) -> dict:
    """Round-13 VERDICT item 6 (+ round-14 item 4: one more decade):
    the two-level-manifest claim — consult cost is O(parent + touched
    shards), independent of TOTAL file count — measured instead of
    argued. Three layouts of the same events data: SMALL (1 replica,
    ~80 files), BIG (``copies`` replicas with user_id AND ts offset
    per replica, ~80x``copies`` files — the extra replicas occupy
    disjoint key ranges, so a narrow predicate over replica 0 touches
    the SAME shard mass in every layout while total files grow), and
    HUGE (``10 x copies`` replicas, ~8000 files — two measured decades
    instead of one). The HUGE tier thins each replica to a 10% row
    sample: consult cost is driven by FILE COUNT (manifest rows =
    per-file envelopes), never rows-per-file, and full-mass replicas
    would pay ~100x the base data in build writes for no additional
    signal. `select_files_multi` with the same narrow 2-column box
    should cost ~the same on all three (``narrow_ratio`` /
    ``narrow_ratio_huge`` ~1, files_selected identical); a FULL-RANGE
    box on the big layout touches every shard and is the
    touched-shards-cost control."""
    import datetime
    import shutil

    from twitter_flink_spark.operators.skipping import (
        build_two_level_columns,
        select_files_multi,
    )
    from twitter_flink_spark.sources.tables import load_table

    # load_table, not a raw read: the testdata's TIMESTAMP(NANOS) must
    # normalize to TIMESTAMP (the raw read yields TIMESTAMP_NTZ, which
    # the manifest builder's unix_micros rejects)
    ev = load_table(spark, BASE_SF, "events")
    b = ev.agg(
        F.min("user_id").alias("ulo"),
        F.max("user_id").alias("uhi"),
        F.min("ts").alias("tlo"),
        F.max("ts").alias("thi"),
    ).first()
    ulo, uhi = int(b["ulo"]), int(b["uhi"])
    uspan = uhi - ulo + 1
    tspan_s = int((b["thi"] - b["tlo"]).total_seconds()) + 1

    work = os.path.join(tempfile.gettempdir(), "tfs-scalecheck-skip")
    shutil.rmtree(work, ignore_errors=True)
    small_dir = os.path.join(work, "small")
    big_dir = os.path.join(work, "big")
    huge_dir = os.path.join(work, "huge")
    files_per_rep = 80
    # Z-ordered layout per replica: tight (user_id, ts) envelopes are
    # what make the manifest prune at all — a hash-random layout gives
    # every file a full-range envelope and nothing skips (measured)
    from twitter_flink_spark.operators.zorder import zorder_layout

    def z_write(df, dest, k):
        bb = df.agg(
            F.min("user_id").alias("ul"),
            F.max("user_id").alias("uh"),
            F.min(F.unix_micros("ts")).alias("tl"),
            F.max(F.unix_micros("ts")).alias("th"),
        ).first()
        zorder_layout(
            df.withColumn("ts_us", F.unix_micros("ts")),
            "user_id",
            "ts_us",
            (int(bb["ul"]), int(bb["uh"]), int(bb["tl"]), int(bb["th"])),
            files_per_rep,
        ).drop("ts_us").write.mode(
            "overwrite" if k == 0 else "append"
        ).parquet(dest)

    def _rep(base_df, k):
        if not k:
            return base_df
        return base_df.withColumn(
            "user_id", F.col("user_id") + F.lit(k * uspan)
        ).withColumn(
            "ts",
            F.col("ts") + F.expr(f"INTERVAL {k * tspan_s} SECOND"),
        )

    z_write(ev, small_dir, 0)
    for k in range(copies):
        z_write(_rep(ev, k), big_dir, k)
    # HUGE tier: deterministic 10% thinning (md5 of event_id, not
    # sample() — reproducible across runs), full key-range coverage
    # per replica so the z-envelopes keep the same geometry
    thin = ev.where(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) == "0"
    )
    for k in range(10 * copies):
        z_write(_rep(thin, k), huge_dir, k)

    t0 = time.perf_counter()
    build_two_level_columns(spark, small_dir, ["user_id", "ts"])
    t_build_small = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    build_two_level_columns(spark, big_dir, ["user_id", "ts"])
    t_build_big = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    build_two_level_columns(spark, huge_dir, ["user_id", "ts"])
    t_build_huge = round(time.perf_counter() - t0, 2)

    narrow = [
        ("user_id", ulo, ulo + uspan // 100),
        (
            "ts",
            b["tlo"],
            b["tlo"] + datetime.timedelta(seconds=tspan_s // 100),
        ),
    ]
    full_big = [
        ("user_id", ulo, ulo + copies * uspan),
        (
            "ts",
            b["tlo"],
            b["tlo"] + datetime.timedelta(seconds=copies * tspan_s),
        ),
    ]

    def timed_consult(root, preds):
        out = {}
        for run in range(2):  # warm = run 2 (manifest footers cached)
            plan: dict = {}
            t0 = time.perf_counter()
            paths, total, _ = select_files_multi(
                spark, root, preds, plan_out=plan
            )
            out = {
                "consult_s": round(time.perf_counter() - t0, 2),
                "files_selected": len(paths),
                "files_total": total,
                "selected_per_col": plan.get("selected_files"),
            }
        return out

    c_small = timed_consult(small_dir, narrow)
    c_big = timed_consult(big_dir, narrow)
    c_huge = timed_consult(huge_dir, narrow)
    c_big_full = timed_consult(big_dir, full_big)
    out = {
        "claim": "consult cost ~ parent + touched shards, not total files",
        "build_small_s": t_build_small,
        "build_big_s": t_build_big,
        "build_huge_s": t_build_huge,
        "narrow_small": c_small,
        "narrow_big": c_big,
        "narrow_huge": c_huge,
        "full_big": c_big_full,
        "narrow_ratio": round(
            c_big["consult_s"] / max(c_small["consult_s"], 1e-9), 2
        ),
        "narrow_ratio_huge": round(
            c_huge["consult_s"] / max(c_small["consult_s"], 1e-9), 2
        ),
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def delete_lifecycle_check(spark: SparkSession, big_dir: str) -> dict:
    """Round-13 VERDICT item 7: the delete-lifecycle cost claims at 10x
    index size, measured.

    - IVF cell-local compaction: on the SAME big index, a delete batch
      confined to ONE cell vs the same-size batch spread across ALL
      cells — rewrite cost must track the TOUCHED-CELL MASS (spread
      compaction rewrites ~k cells' rows, confined rewrites ~1 cell's),
      never the index size. ``spread_vs_confined_ratio`` toward k is
      the pass signal.
    - LSH delete (tombstone append) at 1x vs 10x index:
      ``delete_index_ratio`` near 1 — O(batch) appends plus a
      pushed-filter marker consult.
    - LSH SEGMENT-LOCAL compaction (round-14 verdict item 1: the index
      is now partitioned into 16 doc-hash segments and compaction
      rewrites only tombstone-bearing ones): on the same 10x index, a
      delete batch CONFINED to one segment vs the same-size batch
      SPREAD across all segments — ``spread_vs_confined_compact_ratio``
      toward the segment count is the pass signal (compact cost tracks
      TOMBSTONE-BEARING SEGMENT MASS, not index size); the old
      full-rewrite O(index) cost is what the spread shape now prices,
      and the confined shape is the 1/nseg win."""
    import shutil

    from twitter_flink_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
    )
    from twitter_flink_spark.operators.dedup import (
        lsh_index_build,
        lsh_index_compact,
        lsh_index_delete,
    )
    from twitter_flink_spark.operators.ivf import (
        ivf_index_compact,
        ivf_index_delete,
    )

    work = os.path.join(tempfile.gettempdir(), "tfs-scalecheck-del")
    shutil.rmtree(work, ignore_errors=True)

    # ---- IVF: one-cell vs all-cells delete on the same big index ----
    emb = spark.read.parquet(os.path.join(big_dir, "embeddings.parquet"))
    vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    k = 4
    cents = kmeans_fit(vecs, k=k, iters=2, vec_col="e").select(
        "cid", "cent"
    )

    def build_ivf(p):
        cents.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(p, "_centroids")
        )
        disk = spark.read.parquet(os.path.join(p, "_centroids"))
        assign_clusters(vecs, disk).write.mode("overwrite").partitionBy(
            "cid"
        ).parquet(os.path.join(p, "_assign"))

    ivf_a = os.path.join(work, "ivf_confined")
    ivf_b = os.path.join(work, "ivf_spread")
    build_ivf(ivf_a)
    build_ivf(ivf_b)
    assign = spark.read.parquet(os.path.join(ivf_a, "_assign"))
    counts = {
        int(r["cid"]): int(r["n"])
        for r in assign.groupBy("cid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    hot = max(counts, key=lambda c: counts[c])
    d = 512  # delete batch size, same for both shapes
    # materialize the batches NOW: both delete sets are derived from
    # index A's assignment dir, which its own compaction rewrites —
    # a lazy plan would re-read vanished files on the second use
    def _ids_df(rows):
        return spark.createDataFrame(
            [(int(r["vec_id"]),) for r in rows], "vec_id long"
        )

    # build spread FIRST (small cells may cap its per-cell take), then
    # size the confined batch to exactly match it — the claim compares
    # SAME-SIZE batches, differing only in cell locality
    per_cell = d // len(counts)
    from pyspark.sql import Window

    w = Window.partitionBy("cid").orderBy("vec_id")
    spread_rows = (
        assign.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= per_cell)
        .select("vec_id")
        .collect()
    )
    spread = _ids_df(spread_rows)
    confined_rows = (
        assign.where(F.col("cid") == hot)
        .orderBy("vec_id")
        .limit(len(spread_rows))
        .collect()
    )
    assert len(confined_rows) == len(spread_rows), (
        len(confined_rows),
        len(spread_rows),
    )
    confined = _ids_df(confined_rows)

    def timed_ivf(idx, ids):
        t0 = time.perf_counter()
        nd = ivf_index_delete(spark, ids, idx)
        t_del = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        nc, cells = ivf_index_compact(spark, idx)
        return {
            "deleted": nd,
            "delete_s": t_del,
            "compact_s": round(time.perf_counter() - t0, 2),
            "cells_rewritten": cells,
        }

    r_conf = timed_ivf(ivf_a, confined)
    r_spread = timed_ivf(ivf_b, spread)

    # ---- LSH: O(batch) delete at 1x vs 10x, then segment-local
    # compaction (confined vs spread same-size batches on the 10x) ----
    from twitter_flink_spark.operators.dedup import (
        LSH_SEGMENTS,
        _seg_expr,
    )

    docs_all = spark.read.parquet(
        os.path.join(big_dir, "documents.parquet")
    )
    docs_base = spark.read.parquet(
        os.path.join(BASE_SF, "documents.parquet")
    )
    max_doc = docs_base.agg(F.max("doc_id")).first()[0] + 1
    rep0 = docs_all.where(F.col("doc_id") < max_doc)
    lsh_small = os.path.join(work, "lsh_small")
    lsh_big = os.path.join(work, "lsh_big")
    lsh_big2 = os.path.join(work, "lsh_big2")
    n_small = lsh_index_build(spark, rep0, lsh_small)
    n_big = lsh_index_build(spark, docs_all, lsh_big)
    n_big2 = lsh_index_build(spark, docs_all, lsh_big2)
    assert n_big == n_big2
    dels = rep0.where(F.col("doc_id") % 16 == 0).select("doc_id")

    def timed_lsh(idx, batch):
        t0 = time.perf_counter()
        nd = lsh_index_delete(spark, batch, idx)
        t_del = round(time.perf_counter() - t0, 2)
        # tombstone-bearing segments = what compaction will rewrite
        segs = (
            spark.read.parquet(idx)
            .where(F.col("band") == -2)
            .select("seg")
            .distinct()
            .count()
        )
        t0 = time.perf_counter()
        nc = lsh_index_compact(spark, idx)
        return {
            "deleted": nd,
            "delete_s": t_del,
            "compact_s": round(time.perf_counter() - t0, 2),
            "reclaimed": nc,
            "segments_rewritten": segs,
        }

    l_small = timed_lsh(lsh_small, dels)
    l_big = timed_lsh(lsh_big, dels)
    assert l_small["deleted"] == l_big["deleted"]

    # confined vs spread, SAME batch size, on equal 10x indexes:
    # spread built first (per-segment take may cap it), confined sized
    # to match (the r14 review's same-size-batches discipline). Batch
    # docs must be band-ELIGIBLE (>= 3 tokens — shorter docs are never
    # covered, so deleting them is a no-op) and outside the `dels`
    # pattern already compacted out of lsh_big, or the two shapes would
    # delete different effective batch sizes.
    eligible = F.size(F.split(F.col("text"), " ")) >= 3
    in_dels = (F.col("doc_id") < max_doc) & (F.col("doc_id") % 16 == 0)
    seg_of = docs_all.where(eligible & ~in_dels).select(
        "doc_id", _seg_expr(LSH_SEGMENTS).alias("s")
    )
    from pyspark.sql import Window

    m = 1024
    per_seg = m // LSH_SEGMENTS
    wseg = Window.partitionBy("s").orderBy("doc_id")
    spread_rows = (
        seg_of.withColumn("rn", F.row_number().over(wseg))
        .where(F.col("rn") <= per_seg)
        .select("doc_id")
        .collect()
    )
    hot_seg = int(
        seg_of.groupBy("s")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "s")
        .first()["s"]
    )
    confined_rows = (
        seg_of.where(F.col("s") == hot_seg)
        .orderBy("doc_id")
        .limit(len(spread_rows))
        .collect()
    )
    assert len(confined_rows) == len(spread_rows)

    def _doc_ids(rows):
        return spark.createDataFrame(
            [(int(r["doc_id"]),) for r in rows], "doc_id long"
        )

    # lsh_big was compacted above (tombstone-free): reuse it for the
    # confined shape; lsh_big2 is fresh for the spread shape
    l_conf = timed_lsh(lsh_big, _doc_ids(confined_rows))
    l_spread = timed_lsh(lsh_big2, _doc_ids(spread_rows))
    assert (
        l_conf["deleted"] == l_spread["deleted"] == len(spread_rows)
    ), (l_conf["deleted"], l_spread["deleted"], len(spread_rows))
    out = {
        "ivf": {
            "index_vectors": sum(counts.values()),
            "cells": len(counts),
            "confined_1cell": r_conf,
            "spread_allcells": r_spread,
            "spread_vs_confined_compact_ratio": round(
                r_spread["compact_s"] / max(r_conf["compact_s"], 1e-9), 2
            ),
            "claim": "compact cost tracks touched-cell mass, not index size",
        },
        "lsh": {
            "index_docs": {"small": n_small, "big": n_big},
            "segments": LSH_SEGMENTS,
            "small": l_small,
            "big": l_big,
            "delete_index_ratio": round(
                l_big["delete_s"] / max(l_small["delete_s"], 1e-9), 2
            ),
            "compact_index_ratio": round(
                l_big["compact_s"] / max(l_small["compact_s"], 1e-9), 2
            ),
            "confined_1seg": l_conf,
            "spread_allsegs": l_spread,
            "spread_vs_confined_compact_ratio": round(
                l_spread["compact_s"] / max(l_conf["compact_s"], 1e-9), 2
            ),
            "claim": (
                "delete is O(batch) (ratio ~1); compact is SEGMENT-"
                "LOCAL — cost tracks tombstone-bearing segment mass "
                "(spread/confined toward the segment count), not index "
                "size"
            ),
        },
    }
    shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    big = build_scaled_dir(spark, copies)
    print(f"scaled dir: {big}")
    base = time_queries(spark, BASE_SF)
    scaled = time_queries(spark, big)
    maint = maintenance_check(spark, big)
    print(f"maintenance: {json.dumps(maint)}")
    skip = skipping_consult_check(spark, copies)
    print(f"skipping consult: {json.dumps(skip)}")
    dlc = delete_lifecycle_check(spark, big)
    print(f"delete lifecycle: {json.dumps(dlc)}")
    out = {
        "copies": copies,
        "base_sf": 0.1,
        "queries": {},
        "maintenance": maint,
        "skipping_consult": skip,
        "delete_lifecycle": dlc,
    }
    for name in QUERIES:
        ratio = (
            round(scaled[name]["warm_s"] / max(base[name]["warm_s"], 1e-9), 2)
        )
        out["queries"][name] = {
            "base": base[name],
            "scaled": scaled[name],
            "warm_ratio": ratio,
        }
        print(
            f"{name}: base warm {base[name]['warm_s']}s -> "
            f"{copies}x warm {scaled[name]['warm_s']}s (ratio {ratio})"
        )
    path = ROOT / f"SCALECHECK_r{rnd:02d}.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
