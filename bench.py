"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "n_queries": ..., "headline_total_s": ..., "canary_s": [...]}

Two round-over-round comparability anchors (the full registry's total
drifts every round purely from registry growth/mix):

- **Frozen headline subset** (`HEADLINE`, ~20 queries, one per operator
  family): benched FIRST in a fixed order, reported as its own
  `headline_total_s` + `headline` map. Compare THIS number across rounds;
  the subset only changes with an explicit BASELINE.md note.
- **Contention canary**: a constant 1-partition JVM-only job timed before
  the run, after every 20 queries, and at the end (`canary_s`). On a quiet
  machine the samples are flat; a co-running Spark job inflates the
  samples in exactly the wall-clock window it occupied, so an inflated
  alphabetical block in the per-query map can be attributed to machine
  contention (or not) from the artifact alone.

The stdout line keeps `queries` down to the 10 slowest entries so it fits
the driver's bounded stdout tail (the full per-query map overflowed it
every round through r5, leaving "parsed": null in BENCH_r*.json). The
complete map is written to BENCH_QUERIES_LATEST.json next to this script.

Each query is fully materialized via the `noop` datasource (executes the
whole plan, writes nothing, no driver-side collect) — the honest measure of
plan cost, not collect() serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

from twitter_flink_spark.session import get_spark

#: FROZEN headline subset — one query per operator family, benched first
#: in this exact order. Do not edit casually: round-over-round comparisons
#: key on it (see BASELINE.md "Headline subset").
HEADLINE = [
    "flagship_topn_semijoin",        # reference flagship (O1-O13 chain)
    "topn_tokens_per_window",        # windowed top-N w/ rank
    "sliding_window_event_counts",   # sliding-window grouped count
    "streaming_topn_feedback",       # streaming feedback loop + KV sink
    "streaming_incremental_mv",      # MV merge path (4 micro-batches)
    "mv_point_lookup",               # MV serving path
    "salted_join_supplier_revenue",  # skew-salted join
    "bucketed_join_order_revenue",   # co-located bucketed join
    "bloom_prefilter_join_revenue",  # bloom-prefiltered join
    "dedup_exact",                   # exact dedup
    "dedup_minhash_lsh",             # MinHash+LSH near-dup
    "simhash_hamming_pairs",         # SimHash banded retrieval
    "ngram_jaccard_prefix_same_source",  # prefix-filter set similarity
    "cosine_topk_bruteforce",        # ANN brute-force baseline
    "ivf_pq_ann_topk",               # ANN scale path (IVF-PQ)
    "lang_id_heuristic",             # text analysis: language ID
    "text_quality_scores",           # text analysis: quality scoring
    "bpe_learn_merges",              # tokenizer training
    "filestats_pruned_time_slice",   # scan-side skipping index
    "multimodal_feature_extract",    # multimodal Arrow-batched UDF
]

#: canary cadence: one sample per this many queries
CANARY_EVERY = 20


def _canary(spark) -> float:
    """Constant-work probe: 1 task, pure JVM codegen, no IO, no shuffle.
    Its wall time moves only with machine load — the contention signal."""
    t0 = time.perf_counter()
    spark.range(0, 2_000_000, 1, 1).selectExpr(
        "sum(pmod(xxhash64(id), 1000003)) as s"  # bounded: no ANSI overflow
    ).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def _claim_stdout() -> "os.IO":
    """Return a handle on the REAL stdout and point fd 1 at stderr.

    The driver parses our single JSON line off stdout; the Spark JVM (ivy
    resolution banners, log4j fallbacks) writes directly to fd 1, which it
    inherits at launch. Re-pointing fd 1 → fd 2 BEFORE the JVM starts keeps
    stdout byte-clean; the JSON line goes to the saved duplicate at the end.
    """
    real = os.fdopen(os.dup(1), "w")
    os.dup2(2, 1)
    sys.stdout = sys.stderr
    return real


def main() -> None:
    real_stdout = _claim_stdout()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="tfs-bench")

    import __spark_entry__ as entrymod

    # Warm up the JVM + parquet footers so the alphabetically-first query
    # doesn't absorb session startup in its timing.
    from twitter_flink_spark.sources.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.write.format("noop").mode("overwrite").save()
    # ...and the Python UDF workers: the daemon fork pool spins up on first
    # use (~3 s measured), which would otherwise be charged entirely to the
    # alphabetically-first pandas-UDF query instead of the session.
    spark.range(64).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()
    # ...and the session-scoped codebook fits (coarse k-means, PQ, residual
    # PQ). These are index-BUILD costs paid once per session and cached as
    # collected rows; without this pre-warm the alphabetically-first consumer
    # (ann_rbo_ivfpq, ~16 s of which ~14 s is Lloyd fitting) absorbs them,
    # making per-query round-over-round comparison misleading. The fit is
    # charged to its own line below.
    t_fit0 = time.perf_counter()
    codebook_fit_ok = True
    try:
        from twitter_flink_spark.queries.similarity import (
            _coarse_centroids,
            _pq_centroids,
            _residual_pq_centroids,
        )

        for fit in (_coarse_centroids, _pq_centroids, _residual_pq_centroids):
            fit(spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception as exc:
        codebook_fit_ok = False
        print(f"bench: codebook pre-warm FAILED: {exc}", file=sys.stderr)
    codebook_fit_s = round(time.perf_counter() - t_fit0, 3)
    # ...and the shared streaming-sink index drain: one 3-micro-batch
    # foreachBatch run maintaining BOTH sink index families per commit,
    # consumed by streaming_sink_skipping_index AND
    # streaming_sink_percolumn_indexes (round-11 verdict item 3). Like
    # the codebook fits it is a fixture-BUILD cost paid once per
    # session; charging it to whichever consumer the bench order hits
    # first made that query's number meaningless round-over-round. The
    # drain is charged to its own prewarm line below; the consumers
    # then time their serving reads.
    t_drain0 = time.perf_counter()
    sink_drain_ok = True
    try:
        from twitter_flink_spark.queries.streaming import (
            _drained_join_ckpt,
            _drained_sink_indexes,
        )

        _drained_sink_indexes(spark, sf_dir)
        # the interval-join drain shared by the two join-state
        # introspections — same fixture-build argument
        _drained_join_ckpt(spark, sf_dir)
    except Exception as exc:
        sink_drain_ok = False
        print(f"bench: sink-drain pre-warm FAILED: {exc}", file=sys.stderr)
    sink_drain_s = round(time.perf_counter() - t_drain0, 3)

    queries = entrymod.queries()
    # headline first (fixed order), then the rest alphabetically — a
    # missing headline name is a hard error so the frozen subset cannot
    # silently rot out of the registry
    missing = [n for n in HEADLINE if n not in queries]
    if missing:
        raise SystemExit(f"bench: headline queries missing: {missing}")
    order = HEADLINE + [n for n in sorted(queries) if n not in set(HEADLINE)]
    timings: dict[str, float] = {}
    canary_s: list[float] = [_canary(spark)]
    for i, name in enumerate(order):
        fn = queries[name]
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # keep the bench line parseable on failure
            timings[name] = -1.0
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
        # isolate queries: drop any persisted intermediates a query left
        # behind so later timings don't pay its cache memory pressure.
        # clearCache() misses RDD-level blocks (localCheckpoint), so sweep
        # the persistent-RDD registry too — nothing from a finished query
        # is referenced again.
        spark.catalog.clearCache()
        try:
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist(False)
        except Exception:
            pass
        if (i + 1) % CANARY_EVERY == 0:
            canary_s.append(_canary(spark))
    canary_s.append(_canary(spark))
    # staged-fixture freshness: which cross-process fixtures this run
    # BUILT (or awaited another process building) vs served from cache.
    # A query that jumps round-over-round while its fixture tag reads
    # "built" was charged a staging rebuild, not a plan regression —
    # the r14 doc-LSH attribution gap, closed in the artifact itself.
    from twitter_flink_spark.sources.staging import BUILD_OUTCOMES

    staged_builds = dict(sorted(BUILD_OUTCOMES.items()))
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    headline = {n: timings[n] for n in HEADLINE}
    headline_total = round(sum(t for t in headline.values() if t >= 0), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # codebook_fit is an index-BUILD cost, not a registered query: it gets its
    # own top-level field and is excluded from `value`/`n`/`queries` so
    # round-over-round per-query diffs never see a phantom entry. A pre-warm
    # failure is recorded in the JSON (not just stderr) because in that case
    # the fit cost silently shifts onto the first ANN consumer query.
    prewarm = {
        "codebook_fit_s": codebook_fit_s,
        "sink_drain_s": sink_drain_s,
        "ok": codebook_fit_ok and sink_drain_ok,
    }
    # like-for-like round-over-round total: query wall + the prewarm costs
    # (index fits / sink drains) that earlier rounds charged to queries
    all_in_s = round(total + codebook_fit_s + sink_drain_s, 3)
    # Full per-query map → file (the 245-entry map is ~9 KB and overflows the
    # driver's stdout tail); compact summary (10 slowest) → the stdout line.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_QUERIES_LATEST.json"), "w") as f:
        json.dump(
            {
                "metric": "total_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "n_queries": len(timings),
                "prewarm": prewarm,
                "all_in_s": all_in_s,
                "headline_total_s": headline_total,
                "headline": headline,
                "canary_s": canary_s,
                "staged_builds": staged_builds,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "sf": sf_val,
                "n_queries": len(timings),
                "prewarm": prewarm,
                "all_in_s": all_in_s,
                "headline_total_s": headline_total,
                "canary_s": canary_s,
                # stdout stays tail-bounded: only the tags that were NOT
                # pure cache hits (usually empty on a warm machine); the
                # complete map is in BENCH_QUERIES_LATEST.json
                "staged_builds": {
                    k: v for k, v in staged_builds.items() if v != "cached"
                },
                "failed": sorted(n for n, t in timings.items() if t < 0),
            }
        ),
        file=real_stdout,
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
