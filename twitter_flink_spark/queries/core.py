"""Core reference-pipeline queries (SURVEY.md §2.1 O1-O11), each with its
DuckDB oracle. These decompose the flagship pipeline so the driver checks
every operator stage independently, then the composed whole.

The sliding-window oracle SQL mirrors Spark's `window(ts, 300s, 60s)`
semantics exactly: each row belongs to the 5 epoch-aligned windows whose
start lies in (ts - 300s, ts], i.e. starts floor60(ts) - {0..4}*60.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_flink_spark.functions.text import tokenize
from twitter_flink_spark.operators.joins import (
    semi_join_array_contains,
    semi_join_exploded,
)
from twitter_flink_spark.operators.topn import global_topk
from twitter_flink_spark.operators.windows import sliding_window_counts
from twitter_flink_spark.plans import flagship as fs
from twitter_flink_spark.registry import register
from twitter_flink_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# O2 — filter + projection pushdown (reference TwitterFilterEndpoint.java:46-66)


@register(
    "scan_filter_project",
    oracle="""
SELECT event_id, user_id, round(value, 2) AS value_r
FROM events
WHERE event_type = 'purchase' AND value > 100.0
""",
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection pushed into the parquet scan — the engine-side
    analog of the reference's server-side track/language filtering
    (`TwitterFilterEndpoint.java:46-66`). `.explain` shows PushedFilters +
    a 3-column ReadSchema."""
    events = load_table(spark, sf_dir, "events")
    return events.where(
        (F.col("event_type") == "purchase") & (F.col("value") > 100.0)
    ).select("event_id", "user_id", F.round("value", 2).alias("value_r"))


# ---------------------------------------------------------------------------
# O3 — JSON parse + project + error-drop (reference TopNHashtags.java:188-209)


@register(
    "json_parse_props",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events
GROUP BY event_type
""",
)
def json_parse_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-record JSON parse of `events.props` (the analog of the tweet-JSON
    parse, `TopNHashtags.java:192-203`): extract `$.k`, aggregate. Malformed
    JSON yields NULL (ignored by sum) — same drop-don't-fail semantics as
    the reference's try/catch (`:207`)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("k").alias("sum_k"))
    )


# ---------------------------------------------------------------------------
# O5 — explode/unnest + count (reference TopNHashtags.java:232-242)


@register(
    "token_counts_global",
    oracle="""
WITH tok AS (
  SELECT unnest(str_split(text, ' ')) AS token FROM documents
)
SELECT token, count(*) AS cnt
FROM tok WHERE token <> ''
GROUP BY token
""",
)
def token_counts_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode document tokens, grouped count. The `(tag, 1)` pairing of the
    reference (`TopNHashtags.java:239`) is subsumed by Spark's partial
    aggregation — map-side combine ships one partial per (partition, token)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokenize(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# O6+O7 — sliding event-time window counts (reference TopNHashtags.java:126,247-280)

_SLIDING_EVENTS_ORACLE = """
WITH expanded AS (
  SELECT event_type,
         to_timestamp(CAST(floor(epoch(ts)/60)*60 - 60*i.i AS BIGINT))::TIMESTAMP
           AS window_start
  FROM events CROSS JOIN (SELECT unnest(range(5)) AS i) i
)
SELECT window_start,
       window_start + INTERVAL 300 SECOND AS window_end,
       event_type,
       count(*) AS cnt
FROM expanded
GROUP BY 1, 2, 3
"""


@register("sliding_window_event_counts", oracle=_SLIDING_EVENTS_ORACLE)
def sliding_window_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """300s/60s sliding-window count per event_type over `events` — the
    reference's `timeWindowAll` + count (`TopNHashtags.java:126,260-280`),
    but keyed and parallel (partial agg + one shuffle of partials)."""
    events = load_table(spark, sf_dir, "events")
    return sliding_window_counts(events, ts_col="ts", key_cols=("event_type",))


_WINDOWED_TOKENS_ORACLE = """
WITH docs AS (
  SELECT doc_id, text,
         TIMESTAMP '2024-01-01' + doc_id * INTERVAL 1 MINUTE AS ts
  FROM documents
),
tokens AS (
  SELECT ts, unnest(str_split(text, ' ')) AS token FROM docs
),
expanded AS (
  SELECT token,
         to_timestamp(CAST(floor(epoch(ts)/60)*60 - 60*i.i AS BIGINT))::TIMESTAMP
           AS window_start
  FROM tokens CROSS JOIN (SELECT unnest(range(5)) AS i) i
  WHERE token <> ''
)
SELECT window_start,
       window_start + INTERVAL 300 SECOND AS window_end,
       token, count(*) AS cnt
FROM expanded
GROUP BY 1, 2, 3
"""


@register("windowed_token_counts", oracle=_WINDOWED_TOKENS_ORACLE)
def windowed_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window token counts over the document token stream (flagship
    stage 2; reference O5→O7)."""
    return fs.windowed_token_counts(spark, sf_dir)


# ---------------------------------------------------------------------------
# O8 — top-N per window with rank (reference TopNHashtags.java:282-291)

_TOPN_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, text,
         TIMESTAMP '2024-01-01' + doc_id * INTERVAL 1 MINUTE AS ts
  FROM documents
),
tokens AS (
  SELECT ts, unnest(str_split(text, ' ')) AS token FROM docs
),
expanded AS (
  SELECT token,
         to_timestamp(CAST(floor(epoch(ts)/60)*60 - 60*i.i AS BIGINT))::TIMESTAMP
           AS window_start
  FROM tokens CROSS JOIN (SELECT unnest(range(5)) AS i) i
  WHERE token <> ''
),
counts AS (
  SELECT window_start, token, count(*) AS cnt FROM expanded GROUP BY 1, 2
)
SELECT window_start,
       window_start + INTERVAL 300 SECOND AS window_end,
       token, cnt,
       CAST(row_number() OVER (PARTITION BY window_start
                               ORDER BY cnt DESC, token ASC) AS INTEGER) AS rank
FROM counts
QUALIFY rank <= 10
"""


@register("topn_tokens_per_window", oracle=_TOPN_ORACLE)
def topn_tokens_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 tokens per sliding window, deterministic tie-break (cnt desc,
    token asc) — fixes the reference's unstable sort + int overflow
    (`TopNHashtags.java:282`). Catalyst executes the rank<=N filter as
    WindowGroupLimit (per-partition heap before the shuffle)."""
    return fs.topn_tokens_per_window(spark, sf_dir, n=10)


# ---------------------------------------------------------------------------
# O8 global variant — TakeOrderedAndProject top-K

@register(
    "global_topk_tokens",
    oracle="""
WITH tok AS (
  SELECT unnest(str_split(text, ' ')) AS token FROM documents
),
counts AS (
  SELECT token, count(*) AS cnt FROM tok WHERE token <> '' GROUP BY token
)
SELECT token, cnt FROM counts ORDER BY cnt DESC, token ASC LIMIT 10
""",
)
def global_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 tokens: `orderBy().limit()` → TakeOrderedAndProject
    (per-partition heaps, no full sort — the scalable form of the
    reference's single-task sort, `TopNHashtags.java:282-288`)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return global_topk(counts, order_col="cnt", tiebreak_cols=("token",), k=10)


# ---------------------------------------------------------------------------
# O10 — broadcast semi-join, both formulations (reference TopNHashtags.java:298-335)

_SEMI_ARRAY_ORACLE = """
WITH tok AS (
  SELECT unnest(str_split(text, ' ')) AS token FROM documents
),
counts AS (
  SELECT token, count(*) AS cnt FROM tok WHERE token <> '' GROUP BY token
),
topk AS (
  SELECT token FROM counts ORDER BY cnt DESC, token ASC LIMIT 10
)
SELECT d.doc_id, d.text
FROM documents d
WHERE EXISTS (
  SELECT 1 FROM topk t
  WHERE list_contains(str_split(d.text, ' '), t.token)
)
"""


@register("semi_join_topk_array", oracle=_SEMI_ARRAY_ORACLE)
def semi_join_topk_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents carrying >= 1 globally-top-10 token, via the direct
    `array_contains` broadcast semi-join — the literal Spark form of the
    reference's `ArrayUtils.contains` loop (`TopNHashtags.java:312-320`)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", tokenize(F.col("text")).alias("tokens")
    )
    topk = global_topk_tokens(spark, sf_dir).select("token")
    return semi_join_array_contains(docs, topk, "tokens", "token").select(
        "doc_id", "text"
    )


@register("semi_join_topk_exploded", oracle=_SEMI_ARRAY_ORACLE)
def semi_join_topk_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics via explode + equi BroadcastHashJoin — the form that
    keeps whole-stage codegen at scale. Checked against the identical
    oracle as `semi_join_topk_array` (the two formulations must agree)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", tokenize(F.col("text")).alias("tokens")
    )
    topk = global_topk_tokens(spark, sf_dir).select("token")
    return semi_join_exploded(
        docs, topk, "tokens", "token", id_cols=("doc_id",)
    ).select("doc_id", "text")


# ---------------------------------------------------------------------------
# Flagship — full pipeline composition (O3→O11)


@register("flagship_topn_semijoin", oracle=fs.flagship_oracle_sql(n=10))
def flagship_topn_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole reference pipeline in one query (SURVEY.md §7 flagship)."""
    return fs.flagship(spark, sf_dir, n=10)
