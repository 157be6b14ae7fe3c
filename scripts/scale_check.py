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
    out = {
        "copies": copies,
        "base_sf": 0.1,
        "queries": {},
        "maintenance": maint,
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
