"""Multimodal queries: the mapInPandas decode/frame-sample plumbing run
end-to-end over synthesized binary payloads, oracle-checked because the
stub decode derives metadata deterministically from payload length (ASCII
text ⇒ n_bytes == strlen on both engines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from twitter_flink_spark.operators.multimodal import (
    attach_payload,
    decode_media_meta,
    extract_features,
    resize_media,
    sample_frames,
)
from twitter_flink_spark.registry import register
from twitter_flink_spark.sources.tables import load_table, spread


@register(
    "multimodal_decode_meta",
    oracle="""
SELECT doc_id,
       strlen(text) AS n_bytes,
       CAST(strlen(text) % 640 + 1 AS INTEGER) AS width,
       CAST((strlen(text) * 7) % 480 + 1 AS INTEGER) AS height,
       'fake/deterministic' AS format
FROM documents
""",
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload → mapInPandas decode → typed metadata. The Arrow
    batch plumbing is real; only the pixel decode is the deterministic
    stub (operators/multimodal.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return decode_media_meta(attach_payload(docs))


@register(
    "multimodal_frame_sample",
    oracle="""
WITH meta AS (
  SELECT doc_id, strlen(text) AS n, strlen(text) % 8 + 1 AS k FROM documents
),
f AS (
  SELECT doc_id, n, k, CAST(n // k AS BIGINT) AS step,
         unnest(range(k)) AS frame_idx
  FROM meta
)
SELECT doc_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       frame_idx * step AS frame_offset,
       CASE WHEN frame_idx < k - 1 THEN step ELSE n - (k - 1) * step END AS frame_len
FROM f
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one metadata row per sampled frame, offsets
    deterministic from payload length."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_payload(docs))


@register(
    "multimodal_resize",
    oracle="""
SELECT doc_id, CAST(ceil(strlen(text) / 4.0) AS BIGINT) AS resized_bytes
FROM documents
""",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload → stride-4 resize (stubbed byte downsample) → length
    of the resized column measured SPARK-side (F.length over the binary the
    UDF emitted), proving the resized payload itself round-trips through
    Arrow — not just its metadata. bytes[::4] has ceil(n/4) elements."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    resized = resize_media(attach_payload(docs), stride=4)
    return resized.select(
        "doc_id", F.length("resized").cast("long").alias("resized_bytes")
    )


@register(
    "multimodal_feature_extract",
    oracle="""
WITH chars AS (
  SELECT doc_id, ascii(c) % 16 AS bucket
  FROM (SELECT doc_id, unnest(str_split(text, '')) AS c FROM documents)
)
SELECT doc_id, bucket, count(*) AS cnt
FROM chars
GROUP BY doc_id, bucket
""",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload → byte-histogram feature vector (array<long>, 16 buckets) —
    a real content feature, numpy-vectorized per Arrow batch — exploded to
    (doc_id, bucket, cnt) rows for the oracle. ASCII text means byte
    values == codepoints, so DuckDB reproduces the histogram from chars;
    zero-count buckets are dropped on both sides."""
    docs = spread(load_table(spark, sf_dir, "documents"), "doc_id")
    feats = extract_features(attach_payload(docs), n_buckets=16)
    return (
        feats.select(
            "doc_id", F.posexplode("features").alias("bucket", "cnt")
        )
        .where(F.col("cnt") > 0)
        .select("doc_id", F.col("bucket").cast("int").alias("bucket"), "cnt")
    )


@register(
    "multimodal_byte_entropy",
    oracle="""
WITH ch AS (
  SELECT doc_id, substr(text, i.i, 1) AS c
  FROM documents, unnest(range(1, strlen(text) + 1)) AS i(i)
),
hist AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY doc_id, c),
tot AS (SELECT doc_id, sum(cnt) AS n FROM hist GROUP BY doc_id),
terms AS (
  SELECT h.doc_id,
         CAST(round(-(h.cnt * 1.0 / t.n) * ln(h.cnt * 1.0 / t.n), 10)
              AS DECIMAL(28,10)) AS term
  FROM hist h JOIN tot t USING (doc_id)
)
SELECT t.doc_id,
       CAST(tt.n AS BIGINT) AS n_bytes,
       CAST(count(*) AS BIGINT) AS n_distinct_bytes,
       CAST(sum(t.term) AS DOUBLE) + 0.0 AS byte_entropy_nats
FROM terms t JOIN tot tt USING (doc_id)
GROUP BY t.doc_id, tt.n
""",
)
def multimodal_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level Shannon entropy of each binary payload — the cheap
    content-type/corruption screen a media pipeline runs BEFORE any
    decode (ASCII text ≈ 4 nats ceiling, compressed/encrypted media
    ≈ ln 256, truncated or constant payloads collapse toward 0). The
    byte histogram is REAL numpy over the raw bytes inside mapInPandas
    (`operators/multimodal.py::byte_histogram`) with an INTEGER-ONLY
    Arrow boundary — counts cross back to the JVM, and the entropy
    terms (round(-p ln p, 10), DECIMAL-summed) evaluate with the same
    built-in expressions as `entropy_tokens_by_source`, so no Python
    libm ever touches a hashed float. Oracle: the payload is the
    UTF-8 image of the ASCII fixture text, so per-CHARACTER counts in
    SQL reproduce the per-byte histogram exactly."""
    from twitter_flink_spark.operators.multimodal import byte_histogram

    docs = load_table(spark, sf_dir, "documents")
    hist = byte_histogram(attach_payload(spread(docs, "doc_id")))
    # n_bytes rides every histogram row out of the Arrow boundary
    # (= sum of the doc's cnt by construction), so the per-byte
    # probability needs no aggregate-then-join back over the histogram
    # — one exchange (the final per-doc aggregate) instead of three
    terms = hist.select(
        "doc_id",
        F.col("n_bytes").alias("n"),
        F.round(
            -(F.col("cnt") * 1.0 / F.col("n_bytes"))
            * F.log(F.col("cnt") * 1.0 / F.col("n_bytes")),
            10,
        ).cast("decimal(28,10)").alias("term"),
    )
    return terms.groupBy("doc_id", "n").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct_bytes"),
        (F.sum("term").cast("double") + F.lit(0.0)).alias(
            "byte_entropy_nats"
        ),
    ).select(
        "doc_id",
        F.col("n").cast("long").alias("n_bytes"),
        "n_distinct_bytes",
        "byte_entropy_nats",
    )
