"""Multimodal queries: the mapInPandas decode/frame-sample plumbing run
end-to-end over synthesized binary payloads, oracle-checked because the
stub decode derives metadata deterministically from payload length (ASCII
text ⇒ n_bytes == strlen on both engines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from twitter_flink_spark.operators.multimodal import (
    attach_payload,
    decode_media_meta,
    sample_frames,
)
from twitter_flink_spark.registry import register
from twitter_flink_spark.sources.tables import load_table


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
