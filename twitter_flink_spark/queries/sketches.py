"""Approximate (sketch-based) aggregates — the 100 TB replacements for
exact distinct-count and exact percentile, whose exact forms appear in
`distinct_customers_per_status` / `value_percentiles_per_type`.

Both sketches are mergeable partials: each task builds a bounded-size
sketch over its partition and the shuffle carries sketches, not rows —
distinct-count state goes from O(distinct keys) to ~1.5 KB (HLL++ at 1%
rsd) and percentile state from a full sort to a fixed-size digest.

No `oracle_sql()` entries: sketch estimates are engine-specific (Spark's
HLL++/Greenwald-Khanna vs DuckDB's HLL/t-digest differ in the low bits),
so the driver applies its rows-only check; the REAL check is
tests/test_sketches.py, which bounds the estimates against the exact
values computed by the engine itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_flink_spark.registry import register
from twitter_flink_spark.sources.tables import load_table


@register("approx_distinct_users_per_type")
def approx_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type (rsd=1%)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register("approx_value_percentiles_per_type")
def approx_value_percentiles_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna, accuracy 10000 ≈ 0.01% rank
    error) for the same quantiles `value_percentiles_per_type` computes
    exactly."""
    e = load_table(spark, sf_dir, "events")
    pcts = F.expr(
        "approx_percentile(value, array(0.25, 0.5, 0.75, 0.95), 10000)"
    )
    return e.groupBy("event_type").agg(
        pcts[0].alias("p25"),
        pcts[1].alias("p50"),
        pcts[2].alias("p75"),
        pcts[3].alias("p95"),
    )


_CMS_D = 4  # independent hash rows
_CMS_W = 512  # counters per row; corpus has ~5 event types, so w >> keys
_CMS_THRESHOLD_PCT = 0.05  # heavy hitter = >= 5% of the stream


@register(
    "cms_heavy_hitters",
    oracle=f"""
WITH cells AS (
  SELECT s.seed,
         ('0x' || substr(md5(s.seed || ':' || e.event_type), 1, 8))::BIGINT
           % {_CMS_W} AS col,
         count(*) AS cnt
  FROM events e CROSS JOIN unnest(range(0, {_CMS_D})) AS s(seed)
  GROUP BY 1, 2
),
candidates AS (SELECT DISTINCT event_type FROM events),
est AS (
  SELECT c.event_type, min(cells.cnt) AS est_cnt
  FROM candidates c
  JOIN cells
    ON cells.col = ('0x' || substr(md5(cells.seed || ':' || c.event_type), 1, 8))::BIGINT
                   % {_CMS_W}
  GROUP BY 1
),
total AS (SELECT count(*) AS n FROM events)
SELECT e.event_type, e.est_cnt
FROM est e, total t
WHERE e.est_cnt >= t.n * {_CMS_THRESHOLD_PCT}
""",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch built AS a DataFrame: each event
    increments one counter per hash row (d=4 md5-derived hashes, w=512
    columns), so the sketch is a 4x512 table produced by ONE partial
    hash aggregation — the shuffle carries at most d*w counter cells per
    task, never per-key rows, which is the whole point at 100 TB (state is
    O(d*w), independent of key cardinality). Estimates are min-over-rows
    (classic CMS upper bound); candidate keys come from a distinct scan here,
    but any external candidate list joins the same way without rescanning the
    stream. md5-derived hashing makes the sketch deterministic across
    engines, so the oracle rebuilds the identical sketch in SQL.

    Reference parity: the reference keeps exact per-key windowed counts
    (`TopNHashtags.java` keyed state); this is the bounded-memory analog its
    topology would need once key cardinality outgrows state."""
    e = load_table(spark, sf_dir, "events")
    seeds = F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("seed")
    cell = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("seed"), F.col("event_type"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % _CMS_W
    )
    cells = (
        e.select("event_type", seeds)
        .select("seed", cell.alias("col"))
        .groupBy("seed", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    candidates = e.select("event_type").distinct()
    cand_cells = candidates.select(
        "event_type", F.explode(F.sequence(F.lit(0), F.lit(_CMS_D - 1))).alias("seed")
    ).select("event_type", "seed", cell.alias("col"))
    est = (
        cand_cells.join(F.broadcast(cells), ["seed", "col"])
        .groupBy("event_type")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    total = e.agg(F.count(F.lit(1)).alias("n"))
    return (
        est.join(F.broadcast(total))
        .where(F.col("est_cnt") >= F.col("n") * _CMS_THRESHOLD_PCT)
        .select("event_type", "est_cnt")
    )


@register("hll_shard_union_rollup")
def hll_shard_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-count via Apache DataSketches HLL: build
    one sketch PER SHARD (here event_id mod 8 stands in for the physical
    partition), then `hll_union_agg` merges shard sketches into the
    per-type estimate — the build-once/roll-up-anywhere pattern that makes
    100 TB distinct counts cheap: per-shard sketches are computed in one
    pass and any later rollup (per type, per day, global) merges
    kilobyte-sized sketches instead of rescanning rows. Union-of-shards
    equals the single-pass sketch EXACTLY (pinned in
    tests/test_sketches.py, along with the error bound vs the exact
    count); the estimate itself is engine-specific, so the driver applies
    its rows-only check like the other sketch queries."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "shard", F.pmod(F.col("event_id"), F.lit(8))
    )
    shard_sk = ev.groupBy("event_type", "shard").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return shard_sk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
    )
