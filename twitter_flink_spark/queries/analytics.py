"""Behavioral / frontier analytics beyond the reference surface (round 3).

Six shapes the reference cannot express but a production analytics engine
needs, each chosen for a distinct execution pattern:

- CDC latest-row compaction (the upsert-view of an append log)
- funnel conversion (ordered multi-stage dependency, staged semi-joins)
- frequent-pair co-occurrence (Apriori-style frequency pruning BEFORE the
  quadratic pair fan-out — the market-basket shape at corpus scale)
- Pareto frontier (dominance via aggregate + running max over price
  levels, not an O(n^2) all-pairs anti-join)
- observed metrics (`Dataset.observe` — data-quality counters collected
  DURING the main pass, no second scan)
- gaps-and-islands daily streaks (the classic sessionization-by-calendar
  trick: day - row_number collapses consecutive runs to a constant key)

Reference parity: none of these exist in the 450-LoC Flink job
(`TopNHashtags.java` has a single windowed count + semi-join); they extend
SURVEY.md §2.3's north-star inventory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from twitter_flink_spark.registry import register
from twitter_flink_spark.sources.tables import load_table


@register(
    "cdc_latest_per_key",
    oracle="""
WITH ranked AS (
  SELECT user_id, event_type, event_id, ts, value,
         row_number() OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events
)
SELECT user_id, event_type, event_id, ts, round(value, 2) AS value
FROM ranked WHERE rn = 1
""",
)
def cdc_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC/upsert compaction: latest row per (user_id, event_type) from an
    append-only log — how a change stream becomes a current-state table
    (and how an LLM corpus keeps only the newest version of each doc).
    Deterministic tie-break (ts DESC, event_id DESC). At scale this is one
    hash shuffle on the key; Spark turns the rn=1 filter into
    WindowGroupLimit, so each partition keeps one row per key before any
    sort completes."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            "event_id",
            "ts",
            F.round("value", 2).alias("value"),
        )
    )


@register(
    "funnel_conversion_steps",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT 'view' AS stage, 1 AS stage_ord, CAST(count(*) AS BIGINT) AS n_users FROM v
UNION ALL
SELECT 'click', 2, CAST(count(*) AS BIGINT) FROM c
UNION ALL
SELECT 'purchase', 3, CAST(count(*) AS BIGINT) FROM p
""",
)
def funnel_conversion_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER their first
    view, then purchased AFTER that first qualifying click. Each stage is
    min-ts aggregate -> equi-join to the next stage's candidates — three
    key-partitioned shuffles on user_id, no window over the raw log. The
    per-stage tables shrink monotonically, so at 100 TB every stage after
    the first joins against an already-reduced key set."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df: DataFrame, name: str, ord_: int) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.lit(ord_).alias("stage_ord"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return (
        stage(v, "view", 1)
        .unionAll(stage(c, "click", 2))
        .unionAll(stage(p, "purchase", 3))
    )


_TOP_TOKENS = 40


@register(
    "frequent_token_pairs",
    oracle=f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS token
  FROM documents
), top_tok AS (
  SELECT token FROM (
    SELECT token,
           row_number() OVER (ORDER BY count(*) DESC, token ASC) AS rn
    FROM tok GROUP BY token
  ) WHERE rn <= {_TOP_TOKENS}
), ftok AS (
  SELECT t.doc_id, t.token FROM tok t JOIN top_tok USING (token)
)
SELECT a.token AS t1, b.token AS t2, CAST(count(*) AS BIGINT) AS n_docs
FROM ftok a JOIN ftok b
  ON a.doc_id = b.doc_id AND a.token < b.token
GROUP BY a.token, b.token
""",
)
def frequent_token_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token co-occurrence (market-basket pairs) with Apriori-style
    pruning: only the {TOP} globally most document-frequent tokens enter
    the pair fan-out, so per-doc pair expansion is bounded by C({TOP},2)
    instead of C(tokens_per_doc,2). Plan choices that matter at corpus
    scale: the frequent set comes from `orderBy().limit()` —
    TakeOrderedAndProject, a distributed heap, NOT a single-partition
    rank window over the vocabulary — and pair generation is a per-doc
    ARRAY expansion (sorted set + higher-order `transform`/`slice`),
    which reads the token table once and generates pairs JVM-side,
    instead of a self-join that would scan and shuffle the whole
    token-exploded table twice."""
    docs = load_table(spark, sf_dir, "documents")
    return _token_pair_counts(docs)


def _token_pair_counts(docs: DataFrame) -> DataFrame:
    """(t1, t2, n_docs) co-occurrence counts among the `_TOP_TOKENS` most
    document-frequent tokens (t1 < t2) — the Apriori-pruned pair pipeline
    of `frequent_token_pairs`, shared with the triangle-count query."""
    from twitter_flink_spark.sources.tables import spread

    # single-file table at test SF = one scan task; the explode +
    # distinct-partial (the heavy map side) would serialize on it
    # (guide §2.5) — spread is a no-op once the input has >= default-
    # parallelism files
    tok = spread(docs, "doc_id").select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df_docs"))
    top = (
        counts.orderBy(F.col("df_docs").desc(), F.col("token").asc())
        .limit(_TOP_TOKENS)
        .select("token")
    )
    per_doc = (
        tok.join(F.broadcast(top), "token")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("token")).alias("toks"))
    )
    pairs = per_doc.select(
        F.explode(
            F.expr(
                "flatten(transform(toks, (x, i) -> "
                "transform(slice(toks, i + 2, size(toks)), "
                "y -> struct(x AS t1, y AS t2))))"
            )
        ).alias("p")
    ).select("p.t1", "p.t2")
    return pairs.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("n_docs"))


#: edge iff the pair co-occurs in >= 55/100 of documents. Kept as an
#: integer PERCENT so the threshold compares in exact integer arithmetic
#: on both engines (`n_docs * 100 >= 55 * total`) — a double `0.55 *
#: total` (Spark) vs DECIMAL (DuckDB) can disagree when a pair sits
#: exactly on the boundary and total is a multiple of 20
_TRI_MIN_SHARE_PCT = 55


def _triangle_oracle(
    top: int = _TOP_TOKENS, share_pct: int = _TRI_MIN_SHARE_PCT
) -> str:
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS token
  FROM documents
), top_tok AS (
  SELECT token FROM (
    SELECT token,
           row_number() OVER (ORDER BY count(*) DESC, token ASC) AS rn
    FROM tok GROUP BY token
  ) WHERE rn <= {top}
), ftok AS (
  SELECT t.doc_id, t.token FROM tok t JOIN top_tok USING (token)
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
pairs AS (
  SELECT a.token AS t1, b.token AS t2, count(*) AS c
  FROM ftok a JOIN ftok b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY 1, 2
),
e AS (
  SELECT t1, t2 FROM pairs CROSS JOIN n WHERE c * 100 >= {share_pct} * n.n_docs
),
deg AS (
  SELECT v, count(*) AS d
  FROM (SELECT t1 AS v FROM e UNION ALL SELECT t2 AS v FROM e)
  GROUP BY v
),
o AS (
  SELECT CASE WHEN (da.d, e.t1) < (db.d, e.t2) THEN e.t1 ELSE e.t2 END AS src,
         CASE WHEN (da.d, e.t1) < (db.d, e.t2) THEN e.t2 ELSE e.t1 END AS dst,
         CASE WHEN (da.d, e.t1) < (db.d, e.t2) THEN db.d ELSE da.d END AS dst_d
  FROM e JOIN deg da ON da.v = e.t1 JOIN deg db ON db.v = e.t2
),
tri AS (
  SELECT o1.src AS u, o1.dst AS v, o2.dst AS w
  FROM o o1
  JOIN o o2 ON o2.src = o1.src
    AND (o1.dst_d, o1.dst) < (o2.dst_d, o2.dst)
  JOIN o o3 ON o3.src = o1.dst AND o3.dst = o2.dst
)
SELECT m.token, CAST(deg.d AS BIGINT) AS degree,
       CAST(count(*) AS BIGINT) AS n_triangles
FROM (
  SELECT u AS token FROM tri
  UNION ALL SELECT v FROM tri
  UNION ALL SELECT w FROM tri
) m JOIN deg ON deg.v = m.token
GROUP BY 1, 2
"""


@register("triangle_count_token_graph", oracle=_triangle_oracle())
def triangle_count_token_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the token co-occurrence graph (edge iff
    a top-token pair co-occurs in >= 55% of documents) via DEGREE-ORDERED
    orientation — the MPS/node-iterator++ algorithm every distributed
    triangle count uses: orient each edge from its (degree, name)-smaller
    endpoint, enumerate wedges at the smaller endpoint only, close them
    with one equi-join on the oriented edge list. Orientation bounds the
    wedge fan-out per node by sqrt(2m) REGARDLESS of raw degree — a
    celebrity node with 10^6 neighbors generates no wedges unless both
    neighbors out-rank it — which is what makes the join survive skewed
    100 TB graphs; each triangle is counted exactly once (u < v < w in
    orientation order). Every join is an equi-join; the tuple (deg, name)
    tie-break makes the orientation — and the count — deterministic on
    both engines."""
    from twitter_flink_spark.operators.graph import triangle_counts

    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.countDistinct("doc_id").alias("n_docs_total"))
    edges = (
        _token_pair_counts(docs)
        .join(F.broadcast(n))
        .where(
            F.col("n_docs") * 100
            >= F.lit(_TRI_MIN_SHARE_PCT) * F.col("n_docs_total")
        )
        .select("t1", "t2")
    )
    return triangle_counts(edges, "t1", "t2").select(
        F.col("v").alias("token"), "degree", "n_triangles"
    )


def pareto_frontier(
    df: DataFrame, cost_col: str, gain_col: str
) -> DataFrame:
    """Rows not dominated by any row with strictly lower ``cost_col`` and
    at-least-equal ``gain_col``. The frontier test collapses to
    `gain > max(gain) over all strictly cheaper cost levels`: aggregate to
    distinct cost levels (orders of magnitude below row count), one
    running max over that tiny level table, broadcast it back —
    O(n) + O(levels) instead of an O(n^2) all-pairs anti-join. The only
    sequential piece is the window over distinct LEVELS, never rows.

    Null-cost rows follow the NOT-EXISTS dominance semantics: `cost <
    NULL` is never true, so a null-cost row is neither dominated nor
    dominates — it passes through unchanged, bypassing the level join
    (whose equi-key would otherwise drop it)."""
    nullcost = df.where(F.col(cost_col).isNull())
    nonnull = df.where(F.col(cost_col).isNotNull())
    levels = nonnull.groupBy(cost_col).agg(F.max(gain_col).alias("level_max"))
    w = Window.orderBy(cost_col).rowsBetween(Window.unboundedPreceding, -1)
    running = levels.select(
        cost_col, F.max("level_max").over(w).alias("__cheaper_max")
    )
    return (
        nonnull.join(F.broadcast(running), cost_col)
        .where(
            F.col("__cheaper_max").isNull()
            | (F.col(gain_col) > F.col("__cheaper_max"))
        )
        .drop("__cheaper_max")
        .unionByName(nullcost)
    )


@register(
    "pareto_frontier_parts",
    oracle="""
SELECT x.p_partkey, x.p_retailprice, x.p_size
FROM part x
WHERE NOT EXISTS (
  SELECT 1 FROM part y
  WHERE y.p_retailprice < x.p_retailprice AND y.p_size >= x.p_size
)
""",
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline): parts not dominated by any strictly
    cheaper part of at least equal size (see ``pareto_frontier``;
    property-tested against a brute-force dominance filter in
    tests/test_properties.py)."""
    part = load_table(spark, sf_dir, "part")
    return pareto_frontier(part, "p_retailprice", "p_size").select(
        "p_partkey", "p_retailprice", "p_size"
    )


def observed_clean_events(
    spark: SparkSession, sf_dir: str, observation=None
):
    """Filter pipeline with `observe` metrics attached: rows kept, rows
    with negative value, and mean kept value are counted DURING the scan
    (CollectMetrics node) — zero extra passes, the Spark-native form of
    data-quality counters a pipeline would otherwise pay a second
    aggregation for."""
    ev = load_table(spark, sf_dir, "events")
    kept = ev.where(F.col("value").isNotNull() & (F.col("event_type") != "error"))
    return kept.observe(
        observation if observation is not None else "dq_metrics",
        F.count(F.lit(1)).alias("n_kept"),
        F.sum((F.col("value") < 0).cast("long")).alias("n_negative"),
        F.round(F.avg("value"), 4).alias("mean_value"),
    )


@register(
    "observed_quality_metrics",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(avg(value), 2) AS avg_value
FROM events
WHERE value IS NOT NULL AND event_type <> 'error'
GROUP BY event_type
""",
)
def observed_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the observed filter pipeline (metrics piggyback on
    this same execution — asserted in tests/test_analytics.py)."""
    kept = observed_clean_events(spark, sf_dir)
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 2).alias("avg_value"),
    )


@register(
    "user_daily_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), keyed AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY d
             ) AS INTEGER) AS grp
  FROM days
), streaks AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS streak
  FROM keyed GROUP BY user_id, grp
)
SELECT user_id, max(streak) AS longest_streak
FROM streaks GROUP BY user_id
""",
)
def user_daily_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest run of CONSECUTIVE active days per user
    (see ``longest_daily_streaks``; property-tested against a brute-force
    scan in tests/test_properties.py)."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d"))
    return longest_daily_streaks(days, user_col="user_id", date_col="d")


def longest_daily_streaks(
    days: DataFrame, user_col: str, date_col: str
) -> DataFrame:
    """Longest run of consecutive calendar days per user. `day -
    row_number()` is constant within a consecutive run, so one window +
    two aggregations replace any iterative/self-join formulation.
    Everything partitions by the user key — a single shuffle key end to
    end. Input need not be deduplicated; distinct is applied here."""
    uniq = days.select(user_col, date_col).distinct()
    w = Window.partitionBy(user_col).orderBy(date_col)
    keyed = uniq.withColumn(
        "__grp", F.date_sub(F.col(date_col), F.row_number().over(w))
    )
    return (
        keyed.groupBy(user_col, "__grp")
        .agg(F.count(F.lit(1)).alias("__streak"))
        .groupBy(user_col)
        .agg(F.max("__streak").alias("longest_streak"))
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution

#: inverse-linear time decay: weight = 1 / (1 + hours between touch and
#: purchase). Rational in exact integers, so both engines compute the
#: identical double (unlike pow()-based decays, which cross libm).
_ATTR_DECAY_SECS = 3600


@register(
    "attribution_multi_touch",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, ts, value,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS kind
  FROM events WHERE event_type IN ('purchase', 'click', 'view')
),
tagged AS (
  SELECT *,
    first_value(CASE WHEN kind = 1 THEN event_id END IGNORE NULLS) OVER w
      AS p_id,
    first_value(CASE WHEN kind = 1 THEN ts END IGNORE NULLS) OVER w AS p_ts,
    first_value(CASE WHEN kind = 1 THEN value END IGNORE NULLS) OVER w
      AS p_value
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, kind, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
),
touches AS (
  SELECT event_type AS channel, event_id, p_id, p_value,
         1.0 / (1 + (CAST(floor(epoch(p_ts)) AS BIGINT)
                     - CAST(floor(epoch(ts)) AS BIGINT)) // {_ATTR_DECAY_SECS})
           AS w
  FROM tagged WHERE kind = 0 AND p_id IS NOT NULL
),
per_purchase AS (
  SELECT channel, event_id, p_id, p_value,
         CAST(round(w, 6) AS DECIMAL(18,6)) AS wdec,
         count(*) OVER (PARTITION BY p_id) AS n_touches,
         sum(CAST(round(w, 6) AS DECIMAL(18,6))) OVER (PARTITION BY p_id)
           AS sw
  FROM touches
)
SELECT channel,
       CAST(count(*) AS BIGINT) AS n_touches,
       round(sum(CAST(round(p_value / n_touches, 6) AS DECIMAL(18,6))), 2)
         AS linear_credit,
       round(sum(CAST(round(
         p_value * (CAST(wdec AS DOUBLE) / CAST(sw AS DOUBLE)), 6)
         AS DECIMAL(18,6))), 2) AS decay_credit
FROM per_purchase
GROUP BY channel
""",
)
def attribution_multi_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution, linear + time-decay: every click/view
    attributes to the SAME USER's next purchase; a purchase's value is
    split equally across its touches (linear) and proportionally to
    ``1/(1 + hours-before-purchase)`` (time decay). Extends the as-of
    last-touch join (`asof_join_purchase_attribution`) to the full touch
    set.

    Scale shape: touches meet their next purchase via ONE union + one
    window (`first_value ignore nulls` over the forward frame) per user —
    never a (touch x purchase) range join; the per-purchase normalization
    is a windowed sum over the touch set. Cross-engine determinism: decay
    weights are rationals of exact integers; every channel-level money sum
    accumulates ROUNDED DECIMALS (order-independent), so partitioning
    cannot change the hash."""
    e = load_table(spark, sf_dir, "events")
    ev = e.where(
        F.col("event_type").isin("purchase", "click", "view")
    ).select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("kind"),
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    p_col = lambda c: F.first(  # noqa: E731
        F.when(F.col("kind") == 1, F.col(c)), ignorenulls=True
    ).over(fwd)
    tagged = ev.select(
        "*",
        p_col("event_id").alias("p_id"),
        p_col("ts").alias("p_ts"),
        p_col("value").alias("p_value"),
    )
    touches = tagged.where(
        (F.col("kind") == 0) & F.col("p_id").isNotNull()
    ).select(
        F.col("event_type").alias("channel"),
        "event_id",
        "p_id",
        "p_value",
        (
            F.lit(1.0)
            / (
                1
                + F.floor(
                    (F.unix_timestamp("p_ts") - F.unix_timestamp("ts"))
                    / _ATTR_DECAY_SECS
                )
            )
        ).alias("w"),
    )
    pw = Window.partitionBy("p_id")
    per_purchase = touches.select(
        "channel",
        "p_id",
        "p_value",
        F.round("w", 6).cast("decimal(18,6)").alias("wdec"),
        F.count(F.lit(1)).over(pw).alias("n_touches"),
        F.sum(F.round("w", 6).cast("decimal(18,6)")).over(pw).alias("sw"),
    )
    return per_purchase.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.round(
            F.sum(
                F.round(F.col("p_value") / F.col("n_touches"), 6).cast(
                    "decimal(18,6)"
                )
            ),
            2,
        )
        .cast("double")
        .alias("linear_credit"),
        F.round(
            F.sum(
                F.round(
                    F.col("p_value")
                    * (
                        F.col("wdec").cast("double")
                        / F.col("sw").cast("double")
                    ),
                    6,
                ).cast("decimal(18,6)")
            ),
            2,
        )
        .cast("double")
        .alias("decay_credit"),
    )


# ---------------------------------------------------------------------------
# PageRank


def _pagerank_oracle(iters: int = 3) -> str:
    # literals mirror the Spark operator bit-for-bit: base is computed as
    # (1 - 0.85) IN DOUBLE (= 0.15000000000000002), never the decimal 0.15
    d = "CAST(0.85 AS DOUBLE)"
    base = "(CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))"
    ctes = [
        """edges0 AS (
  SELECT DISTINCT 'c:' || o.o_custkey AS src, 's:' || l.l_suppkey AS dst
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
),
edges AS (
  SELECT src, dst FROM edges0
  UNION
  SELECT dst AS src, src AS dst FROM edges0
),
outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY 1),
nodes AS (SELECT DISTINCT src AS node FROM edges),
pr0 AS (SELECT node, CAST(1 AS DOUBLE) AS pr FROM nodes)"""
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""pr{k} AS (
  SELECT n.node,
         {base} + {d} * coalesce(CAST(s.s AS DOUBLE), CAST(0 AS DOUBLE)) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           sum(CAST(round(p.pr / o.od, 8) AS DECIMAL(28,8))) AS s
    FROM edges e
    JOIN outdeg o ON o.src = e.src
    JOIN pr{k - 1} p ON p.node = e.src
    GROUP BY 1
  ) s ON s.node = n.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, round(pr, 6) AS pagerank FROM pr{iters}"
    )


@register("pagerank_cust_supplier", oracle=_pagerank_oracle())
def pagerank_cust_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed iterations, d=0.85) over the bipartite
    customer↔supplier trade graph derived from orders x lineitem — the
    iterative-scoring workload (influence/centrality over a derived edge
    table) on the `operators/graph.py` iteration scaffolding:
    localCheckpoint per round truncates lineage, each round is one
    edges⋈ranks shuffle join + an exact decimal contribution sum. Edges
    run BOTH directions so rank actually propagates across rounds
    (one-directional bipartite edges would freeze after round 2). The
    oracle unrolls the identical three iterations as plain CTEs — no
    recursive-SQL dependence."""
    from twitter_flink_spark.operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    # dedup on the two INT keys BEFORE building the string node ids: the
    # distinct's exchange then carries 16 bytes/row instead of two
    # concatenated strings, and the concat projection runs once per
    # SURVIVING pair (identical result — the c:/s: prefixing is
    # injective on the int pair)
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    e0 = pairs.select(
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias(
            "src"
        ),
        F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias(
            "dst"
        ),
    )
    bidir = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # bidir holds each edge exactly once BY CONSTRUCTION: e0 is distinct
    # and the flipped copy lives in disjoint (c:/s:) node namespaces —
    # attested to the operator so it skips a second full-edge-table
    # dedup exchange (the optimizer cannot prove this)
    pr = pagerank(bidir, iters=3, damping=0.85, edges_distinct=True)
    return pr.select("node", F.round("pr", 6).alias("pagerank"))


@register(
    "scd2_user_status_intervals",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, event_type, ts, value,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_id, event_type, ts, value
  FROM ordered
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, event_id, event_type,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to,
       round(value, 2) AS value,
       CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              IS NULL AS INT) AS is_current
FROM changes
""",
)
def scd2_user_status_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build from an append-only change
    log: per user, consecutive same-status events compress into one
    validity interval (gaps-and-islands on event_type), each carrying
    [valid_from, valid_to) and an is_current flag — the historized
    dimension a warehouse MERGEs from CDC, and the complement of
    `cdc_latest_per_key` (which keeps only the current row).

    One shuffle: BOTH window passes (the lag that detects changes and the
    lead that closes intervals) share the (user_id) partitioning and
    (ts, event_id) ordering, so Catalyst plans a single exchange + sort
    and the change filter runs between the two window functions without
    re-exchanging. At 100 TB this is the canonical one-pass SCD2
    derivation; the deterministic (ts, event_id) tie-break makes replays
    idempotent."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .drop("prev_type")
    )
    return changes.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.round("value", 2).alias("value"),
        F.lead("ts").over(w).isNull().cast("int").alias("is_current"),
    )


@register(
    "join_key_skew_profile",
    oracle="""
WITH per_key AS (
  SELECT l_orderkey, count(*) AS rows_per_key FROM lineitem GROUP BY 1
)
SELECT rows_per_key, CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(rows_per_key) AS BIGINT) AS n_rows,
       round(sum(rows_per_key) * 1.0
             / (SELECT sum(rows_per_key) FROM per_key), 6) AS row_share
FROM per_key
GROUP BY rows_per_key
""",
)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics: the rows-per-key histogram of
    lineitem.l_orderkey — the profile that decides a join strategy BEFORE
    running it (broadcast? salt the top keys? trust AQE's skew split?).
    Two hash aggregations (key → count, count → frequency): the second
    input is |distinct keys| and the histogram itself is at most
    |max multiplicity| rows, so the full profile of a 100 TB fact table
    is a few hundred rows on the driver. row_share against the broadcast
    1-row total shows where the mass sits (a head key with share >> 1/p
    is the salting candidate)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("rows_per_key")
    )
    total = per_key.agg(F.sum("rows_per_key").alias("__t"))
    return (
        per_key.groupBy("rows_per_key")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("rows_per_key").alias("n_rows"),
        )
        .join(F.broadcast(total))
        .select(
            "rows_per_key",
            "n_keys",
            "n_rows",
            F.round(F.col("n_rows") * 1.0 / F.col("__t"), 6).alias("row_share"),
        )
    )


@register(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
),
trans AS (
  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT from_type, sum(n) AS t FROM trans GROUP BY 1)
SELECT tr.from_type, tr.to_type, CAST(tr.n AS BIGINT) AS n_transitions,
       round(tr.n * 1.0 / tot.t, 6) AS prob
FROM trans tr JOIN tot USING (from_type)
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the process-mining / user-journey model behind "what
    happens after a click": P(next | current) with deterministic
    (ts, event_id) sequencing. One shuffle on user_id for the lead
    window; the transition aggregate is |types|^2-bounded, and the
    per-row normalizer attaches by broadcast — at 100 TB the matrix is a
    handful of rows no matter the corpus. (The same pipeline with a
    (from, to) -> embedding lookup is how behavioral embeddings get
    their training pairs.)"""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    tot = trans.groupBy("from_type").agg(F.sum("n_transitions").alias("t"))
    return (
        trans.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.round(F.col("n_transitions") * 1.0 / F.col("t"), 6).alias(
                "prob"
            ),
        )
    )


@register(
    "merge_upsert_delete_dim",
    oracle="""
WITH latest AS (
  SELECT user_id, event_type, value FROM (
    SELECT user_id, event_type, value,
           row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
),
changes AS (
  SELECT user_id + 100 AS cust_key,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         round(value, 2) AS new_bal
  FROM latest
)
SELECT c.c_custkey AS cust_key, round(c.c_acctbal, 2) AS acctbal,
       'kept' AS origin
FROM customer c LEFT JOIN changes ch ON ch.cust_key = c.c_custkey
WHERE ch.cust_key IS NULL
UNION ALL
SELECT c.c_custkey, ch.new_bal, 'updated'
FROM customer c JOIN changes ch ON ch.cust_key = c.c_custkey
WHERE ch.op = 'U'
UNION ALL
SELECT ch.cust_key, ch.new_bal, 'inserted'
FROM changes ch LEFT JOIN customer c ON c.c_custkey = ch.cust_key
WHERE c.c_custkey IS NULL AND ch.op = 'U'
""",
)
def merge_upsert_delete_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE INTO semantics — the declarative form of what
    `streaming_incremental_mv` does per micro-batch: a compacted change
    set (latest event per key; 'error' = DELETE, else UPSERT with the
    new balance) merges into the customer dimension in ONE full-outer
    join: matched+D drops the row, matched+U updates it, unmatched+U
    inserts, untouched rows pass through — each tagged with its origin.
    The key offset (+100) makes the change set straddle the dimension's
    key range so all four branches fire.

    At 100 TB this is a single co-partitioned shuffle on the merge key
    (a table format executes MERGE INTO exactly this way, plus
    file-level pruning the bucketed IncrementalMV already demonstrates);
    the one-pass full-outer formulation reads both inputs once, where
    the oracle's three-branch UNION reads them thrice."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    changes = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            (F.col("user_id") + 100).alias("cust_key"),
            F.when(F.col("event_type") == "error", "D")
            .otherwise("U")
            .alias("op"),
            F.round("value", 2).alias("new_bal"),
        )
    )
    base = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_key"),
        F.round("c_acctbal", 2).alias("acctbal"),
    )
    merged = base.join(changes, on="cust_key", how="full_outer")
    return (
        merged.where(
            ~((F.col("op") == "D") & F.col("acctbal").isNotNull())
            | F.col("op").isNull()
        )
        .where(~(F.col("acctbal").isNull() & (F.col("op") == "D")))
        .select(
            "cust_key",
            F.when(F.col("op") == "U", F.col("new_bal"))
            .otherwise(F.col("acctbal"))
            .alias("acctbal"),
            F.when(F.col("op").isNull(), "kept")
            .when(F.col("acctbal").isNull(), "inserted")
            .otherwise("updated")
            .alias("origin"),
        )
    )


#: edge iff the pair co-occurs in >= 635/1000 of documents — integer
#: PERMILLE so the comparison is exact integer arithmetic on both engines
#: (same boundary rationale as `_TRI_MIN_SHARE_PCT`)
_KCORE_SHARE_PERMILLE = 635
_KCORE_K = 12
_KCORE_ROUNDS = 4


def _kcore_oracle(
    top: int = _TOP_TOKENS,
    share_pm: int = _KCORE_SHARE_PERMILLE,
    k: int = _KCORE_K,
    rounds: int = _KCORE_ROUNDS,
) -> str:
    parts = [
        f"""tok AS (
  SELECT DISTINCT doc_id, unnest(str_split(text, ' ')) AS token
  FROM documents
), top_tok AS (
  SELECT token FROM (
    SELECT token,
           row_number() OVER (ORDER BY count(*) DESC, token ASC) AS rn
    FROM tok GROUP BY token
  ) WHERE rn <= {top}
), ftok AS (
  SELECT t.doc_id, t.token FROM tok t JOIN top_tok USING (token)
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
pairs AS (
  SELECT a.token AS t1, b.token AS t2, count(*) AS c
  FROM ftok a JOIN ftok b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY 1, 2
),
e0 AS MATERIALIZED (
  SELECT t1, t2 FROM pairs CROSS JOIN n WHERE c * 1000 >= {share_pm} * n.n_docs
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""d{r} AS MATERIALIZED (
  SELECT v, count(*) AS d
  FROM (SELECT t1 AS v FROM e{r - 1} UNION ALL SELECT t2 AS v FROM e{r - 1})
  GROUP BY v
),
k{r} AS (SELECT v FROM d{r} WHERE d >= {k}),
e{r} AS MATERIALIZED (
  SELECT e.t1, e.t2 FROM e{r - 1} e
  JOIN k{r} ka ON ka.v = e.t1 JOIN k{r} kb ON kb.v = e.t2
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT v AS token, CAST(count(*) AS BIGINT) AS degree
FROM (SELECT t1 AS v FROM e{rounds} UNION ALL SELECT t2 AS v FROM e{rounds})
GROUP BY v
"""
    )


@register("kcore_token_graph", oracle=_kcore_oracle())
def kcore_token_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core extraction (k=12, 4 peel rounds) on the token
    co-occurrence graph at a threshold that leaves an IRREGULAR degree
    distribution (unlike the triangle query's denser cut) — the
    dense-nucleus extractor of graph mining, here finding the boilerplate
    token clique that survives when peripheral co-occurrences peel away
    (`operators/graph.py::k_core_peel`). Each round is one degree
    aggregate + two left-semi joins on a shrinking edge list; fixed
    rounds make the result deterministic and the oracle an unrolled CTE
    chain."""
    from twitter_flink_spark.operators.graph import k_core_peel

    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.countDistinct("doc_id").alias("n_docs_total"))
    edges = (
        _token_pair_counts(docs)
        .join(F.broadcast(n))
        .where(
            F.col("n_docs") * 1000
            >= F.lit(_KCORE_SHARE_PERMILLE) * F.col("n_docs_total")
        )
        .select("t1", "t2")
    )
    return k_core_peel(
        edges, k=_KCORE_K, rounds=_KCORE_ROUNDS, a_col="t1", b_col="t2"
    ).select(F.col("v").alias("token"), "degree")


# ---------------------------------------------------------------------------
# Markov stationary distribution (3 unrolled power steps, exact rounding)

_MKV_ROUNDS = 3


def _markov_stationary_oracle() -> str:
    # unrolled power iteration: pi_{k+1}(j) = sum_i pi_k(i) P(i, j),
    # each pi re-rounded to 10 dp so both engines walk identical values
    steps = []
    prev = "pi0"
    for k in range(1, _MKV_ROUNDS + 1):
        steps.append(f"""
pi{k} AS (
  SELECT p.to_type AS state,
         CAST(round(sum(CAST({prev}.p AS DOUBLE) * CAST(p.prob AS DOUBLE)),
                    10) AS DECIMAL(28,10)) AS p
  FROM {prev} JOIN pmat p ON p.from_type = {prev}.state
  GROUP BY p.to_type
)""")
        prev = f"pi{k}"
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
),
trans AS (
  SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT from_type, sum(n) AS t FROM trans GROUP BY 1),
pmat AS (
  SELECT tr.from_type, tr.to_type,
         CAST(round(tr.n * 1.0 / tot.t, 10) AS DECIMAL(28,10)) AS prob
  FROM trans tr JOIN tot USING (from_type)
),
states AS (SELECT DISTINCT from_type AS state FROM pmat),
ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM states),
pi0 AS (
  SELECT state, CAST(round(1.0 / ns.n, 10) AS DECIMAL(28,10)) AS p
  FROM states, ns
),{",".join(steps)}
SELECT state AS event_type, CAST(p AS DOUBLE) + 0.0 AS stationary_p
FROM {prev}
"""


@register("event_markov_stationary", oracle=_markov_stationary_oracle())
def event_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate stationary distribution of the event-type Markov
    chain — {_MKV_ROUNDS} unrolled power-iteration steps from the
    uniform start over the empirical transition matrix
    (`event_transition_matrix`'s P, re-derived here at 10 dp): where
    user behavior settles if the observed dynamics keep running, the
    summary a capacity planner reads next to the raw frequencies. The
    matrix and every pi live at TYPES grain (5 rows), so each step is
    a broadcast join over tiny frames; the only data-sized work is the
    one user-keyed window building transitions. Determinism: P entries
    and every intermediate pi round to 10 dp (the same per-round
    re-rounding discipline as PageRank), so both engines walk
    identical vectors; no convergence test, a FIXED {_MKV_ROUNDS}
    steps (power iteration on a 5-state chain is near-converged by
    then, and fixed trip counts are reproducible)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).where(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = trans.groupBy("from_type").agg(F.sum("n").alias("t"))
    pmat = (
        trans.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            F.round(F.col("n") * 1.0 / F.col("t"), 10)
            .cast("decimal(28,10)")
            .alias("prob"),
        )
        .persist()
    )
    states = pmat.select(
        F.col("from_type").alias("state")
    ).distinct()
    ns = states.agg(F.count(F.lit(1)).cast("double").alias("n"))
    pi = states.join(F.broadcast(ns)).select(
        "state",
        F.round(F.lit(1.0) / F.col("n"), 10)
        .cast("decimal(28,10)")
        .alias("p"),
    )
    for _ in range(_MKV_ROUNDS):
        pi = (
            pi.join(
                F.broadcast(pmat), pi["state"] == pmat["from_type"]
            )
            .groupBy(F.col("to_type").alias("state2"))
            .agg(
                F.round(
                    F.sum(
                        F.col("p").cast("double")
                        * F.col("prob").cast("double")
                    ),
                    10,
                )
                .cast("decimal(28,10)")
                .alias("p")
            )
            .select(F.col("state2").alias("state"), "p")
        )
    return pi.select(
        F.col("state").alias("event_type"),
        (F.col("p").cast("double") + F.lit(0.0)).alias("stationary_p"),
    )


# ---------------------------------------------------------------------------
# Weight of evidence (event-type features vs the churn label)


@register(
    "woe_event_type_churn",
    oracle="""
WITH u AS (
  SELECT user_id, max(CAST(ts AS DATE)) AS last_day FROM events
  GROUP BY user_id
),
horizon AS (SELECT max(CAST(ts AS DATE)) AS h FROM events),
lbl AS (
  SELECT u.user_id,
         CAST(date_diff('day', u.last_day, horizon.h) >= 7 AS INTEGER)
           AS churned
  FROM u, horizon
),
e AS (
  SELECT ev.event_type, l.churned FROM events ev
  JOIN lbl l ON l.user_id = ev.user_id
),
per AS (
  SELECT event_type,
         sum(churned) AS n_pos,
         sum(1 - churned) AS n_neg
  FROM e GROUP BY event_type
),
tot AS (SELECT sum(n_pos) AS tp, sum(n_neg) AS tn FROM per)
SELECT p.event_type,
       CAST(p.n_pos AS BIGINT) AS n_churned_events,
       CAST(p.n_neg AS BIGINT) AS n_retained_events,
       round(ln(((p.n_pos + 0.5) / (tot.tp + 0.5))
                / ((p.n_neg + 0.5) / (tot.tn + 0.5))), 6) AS woe
FROM per p, tot
""",
)
def woe_event_type_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of evidence of each event type against the churn label
    (the credit-scoring feature transform: WOE = ln(share of positive
    events / share of negative events), 0.5-smoothed) — which event
    types are over-represented among soon-to-churn users' activity.
    Composes `user_churn_flags`' labeling rule (inactive >= 7 days at
    the horizon) with an event-grain join: labels live at USER grain
    (one aggregate), broadcast back onto events, and WOE evaluates on
    the types-sized rollup. The label join is the only data-sized
    work; at 100 TB the label table still broadcasts (users << events)
    or bucket-joins on user_id."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.to_date("ts")).alias("last_day")
    )
    horizon = ev.agg(F.max(F.to_date("ts")).alias("h"))
    lbl = u.join(F.broadcast(horizon)).select(
        "user_id",
        (F.datediff(F.col("h"), F.col("last_day")) >= 7)
        .cast("int")
        .alias("churned"),
    )
    e = ev.join(F.broadcast(lbl), "user_id").select(
        "event_type", "churned"
    )
    per = e.groupBy("event_type").agg(
        F.sum("churned").alias("n_pos"),
        F.sum(1 - F.col("churned")).alias("n_neg"),
    )
    tot = per.agg(
        F.sum("n_pos").alias("tp"), F.sum("n_neg").alias("tn")
    )
    return per.join(F.broadcast(tot)).select(
        "event_type",
        F.col("n_pos").cast("long").alias("n_churned_events"),
        F.col("n_neg").cast("long").alias("n_retained_events"),
        F.round(
            F.log(
                ((F.col("n_pos") + 0.5) / (F.col("tp") + 0.5))
                / ((F.col("n_neg") + 0.5) / (F.col("tn") + 0.5))
            ),
            6,
        ).alias("woe"),
    )


# ---------------------------------------------------------------------------
# Point-in-time join (fact @ SCD2 validity interval)


@register(
    "pit_join_purchases_status",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_id, event_type, ts,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
),
changes AS (
  SELECT user_id, event_id, event_type, ts
  FROM ordered
  WHERE prev_type IS NULL OR event_type <> prev_type
),
iv AS (
  SELECT user_id, event_type AS status, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM changes
),
p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
       iv.status, iv.valid_from AS status_since
FROM p JOIN iv ON iv.user_id = p.user_id
              AND p.ts >= iv.valid_from
              AND (iv.valid_to IS NULL OR p.ts < iv.valid_to)
""",
)
def pit_join_purchases_status(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Point-in-time join: every purchase annotated with the SCD2
    status interval (`scd2_user_status_intervals`' dimension) that was
    VALID AT the purchase timestamp — the temporal-warehouse pattern
    behind "price as of order date" / feature-store PIT correctness
    (joining the CURRENT dimension row instead leaks the future). The
    plan is the scalable AS-OF formulation, not a range join: interval
    starts (kind 0) union with purchases (kind 1), ONE user-keyed
    window carries last(status/valid_from ignore nulls) ordered by
    (ts, kind, event_id) — at equal timestamps the interval boundary
    sorts first, so a purchase at a boundary lands in the newly-opened
    interval, exactly the [valid_from, valid_to) convention the ORACLE
    expresses as the naive BETWEEN join (the gate certifies the window
    rewrite against the obvious-but-quadratic formulation)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select(
            "user_id",
            F.lit(0).alias("kind"),
            F.col("event_id").alias("src_event_id"),
            "ts",
            F.col("event_type").alias("status"),
        )
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.lit(1).alias("kind"),
        F.col("event_id").alias("src_event_id"),
        "ts",
        F.lit(None).cast("string").alias("status"),
    )
    unioned = changes.unionByName(purchases)
    wu = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "src_event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    annotated = unioned.select(
        "user_id",
        "kind",
        "src_event_id",
        "ts",
        F.last("status", ignorenulls=True).over(wu).alias("pit_status"),
        F.last(
            F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True
        )
        .over(wu)
        .alias("status_since"),
    )
    return annotated.where(F.col("kind") == 1).select(
        F.col("src_event_id").alias("event_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("pit_status").alias("status"),
        "status_since",
    )
