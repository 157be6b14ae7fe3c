"""The flagship query: the reference's full pipeline shape, batch, over the
driver's `documents` table.

Reference pipeline (`TopNHashtags.java:116-180`): parse tweets → explode
hashtags → 300s/60s sliding-window global count → top-10 per window fire →
broadcast semi-join back to tweets carrying a top-10 tag → project text.

Batch re-expression (FIXTURES.md §C): `documents.text` tokens play the tag
stream; event time is synthesized deterministically as
``TIMESTAMP '2024-01-01' + doc_id minutes`` (replacing the reference's
wall-clock ingestion time, `TopNHashtags.java:220-225`, for reproducibility).
A document passes the filter iff it carries >= 1 token that is top-N in >= 1
sliding window covering the document's timestamp — the batch analog of the
reference's "current top-N" membership test (`:312-320`).

Plan shape at scale (in .explain terms):
  scan documents (pruned to doc_id,text)
   → explode (codegen)                        [stays in one stage]
   → partial count → Exchange(window,token) → final count
   → WindowGroupLimit(rank<=N) → Exchange(window) → rank filter
   → BroadcastExchange (<= windows x N rows)
  probe: scan → explode → BroadcastHashJoin(token) + range filter → semi-join
One shuffle of pre-aggregated counts; the join side is broadcast; nothing
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_flink_spark.functions.text import tokenize
from twitter_flink_spark.operators.topn import topn_per_group
from twitter_flink_spark.operators.windows import sliding_window_counts
from twitter_flink_spark.sources.tables import load_table

EPOCH_START = "2024-01-01"


def docs_with_event_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + deterministic event time (doc_id minutes past 2024-01-01)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "text",
        (
            F.to_timestamp(F.lit(EPOCH_START))
            + F.make_dt_interval(mins=F.col("doc_id").cast("int"))
        ).alias("ts"),
    )


def token_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, ts, token) — the exploded tag stream (reference O5)."""
    docs = docs_with_event_time(spark, sf_dir)
    return docs.select(
        "doc_id", "ts", F.explode(tokenize(F.col("text"))).alias("token")
    )


def windowed_token_counts(
    spark: SparkSession,
    sf_dir: str,
    window_size: str = "300 seconds",
    window_slide: str = "60 seconds",
) -> DataFrame:
    """Sliding-window token counts (reference O6+O7)."""
    return sliding_window_counts(
        token_stream(spark, sf_dir),
        ts_col="ts",
        key_cols=("token",),
        window_size=window_size,
        window_slide=window_slide,
    )


def topn_tokens_per_window(
    spark: SparkSession, sf_dir: str, n: int = 10
) -> DataFrame:
    """Top-N tokens per sliding window with deterministic tie-break
    (cnt desc, token asc) — reference O8 with its unstable-sort bug fixed."""
    counts = windowed_token_counts(spark, sf_dir)
    return topn_per_group(
        counts,
        partition_cols=("window_start",),
        order_col="cnt",
        tiebreak_cols=("token",),
        n=n,
    ).select("window_start", "window_end", "token", "cnt", "rank")


def flagship(spark: SparkSession, sf_dir: str, n: int = 10) -> DataFrame:
    """Full pipeline: documents carrying a token that is top-N in a window
    covering the document's timestamp (reference O10 semi-join + O11 project).

    Join strategy: a naive formulation joins probe tokens to the top-N table
    on token equality with a time-range residual — but a token that is top-N
    in MANY windows (a persistently-hot hashtag) makes every probe of that
    token scan thousands of hash-bucket entries; measured 27 s at sf=0.1.
    Instead we expand each probe token into the size/slide window starts
    covering its timestamp (exactly what `window()` does on the agg side)
    and equi-join on (token, window_start) — perfectly selective composite
    key, broadcast-able build side, and the expansion stays inside codegen.
    Measured ~3 s at sf=0.1 for the identical result.

    Returns (doc_id, text)."""
    docs = docs_with_event_time(spark, sf_dir)
    tokens = token_stream(spark, sf_dir)
    topn = topn_tokens_per_window(spark, sf_dir, n=n)

    slide_s, size_s = 60, 300
    floor_slide = F.floor(F.unix_timestamp(F.col("ts")) / slide_s) * slide_s
    probe = tokens.withColumn(
        "window_start",
        F.explode(
            F.sequence(
                F.timestamp_seconds(floor_slide - (size_s - slide_s)),
                F.timestamp_seconds(floor_slide),
                F.expr(f"interval {slide_s} seconds"),
            )
        ),
    )
    matched_ids = probe.join(
        F.broadcast(topn.select("window_start", "token")),
        on=["token", "window_start"],
        how="left_semi",
    ).select("doc_id")
    return docs.join(matched_ids, on="doc_id", how="left_semi").select(
        "doc_id", "text"
    )


def flagship_oracle_sql(n: int = 10) -> str:
    """DuckDB-equivalent SQL for `flagship` (same tie-break, same windows)."""
    return f"""
WITH docs AS (
  SELECT doc_id, text,
         TIMESTAMP '2024-01-01' + doc_id * INTERVAL 1 MINUTE AS ts
  FROM documents
),
tokens AS (
  SELECT doc_id, ts, unnest(str_split(text, ' ')) AS token FROM docs
),
tok AS (
  SELECT * FROM tokens WHERE token <> ''
),
expanded AS (
  SELECT token,
         to_timestamp(CAST(floor(epoch(ts)/60)*60 - 60*i.i AS BIGINT))::TIMESTAMP
           AS window_start
  FROM tok CROSS JOIN (SELECT unnest(range(5)) AS i) i
),
counts AS (
  SELECT window_start, token, count(*) AS cnt FROM expanded GROUP BY 1, 2
),
topn AS (
  SELECT window_start, token, cnt,
         row_number() OVER (PARTITION BY window_start
                            ORDER BY cnt DESC, token ASC) AS rank
  FROM counts
  QUALIFY rank <= {n}
)
SELECT DISTINCT d.doc_id, d.text
FROM tok tk
JOIN topn tn
  ON tk.token = tn.token
 AND tk.ts >= tn.window_start
 AND tk.ts < tn.window_start + INTERVAL 300 SECOND
JOIN docs d ON d.doc_id = tk.doc_id
"""
