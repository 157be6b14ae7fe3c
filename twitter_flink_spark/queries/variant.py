"""Semi-structured data via Spark 4's VARIANT type.

Extends O3 (per-record JSON parse, `TopNHashtags.java:192-203`): at 100 TB
the JSON cost model changes — `get_json_object` re-parses the string per
extraction, while `parse_json` parses ONCE into a binary variant whose paths
are then O(1) binary probes. A pipeline extracting five fields from the same
props column pays one parse instead of five. The oracles verify values only
(DuckDB has no variant); the Spark side is what exercises the type."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_flink_spark.registry import register
from twitter_flink_spark.sources.tables import load_table


@register(
    "variant_props_extract",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k
FROM events
GROUP BY event_type
""",
)
def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`try_parse_json` → variant → three extractions off ONE parse (vs the
    three string re-parses `get_json_object` would cost — the variant win).
    `try_` keeps the reference's drop-don't-fail malformed-row semantics
    (`TopNHashtags.java:207`): bad JSON → NULL variant → NULL fields,
    ignored by the aggregates."""
    e = load_table(spark, sf_dir, "events")
    v = F.try_parse_json("props")
    k = F.variant_get(v, "$.k", "long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.min("k").alias("min_k"),
        )
    )


@register(
    "variant_nested_roundtrip",
    oracle="""
SELECT event_id,
       user_id AS uid,
       event_type AS second_tag,
       round(value, 2) AS val_r
FROM events
WHERE user_id % 7 = 0
""",
)
def variant_nested_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-path and array-index variant extraction, pinned by round-trip:
    build a nested JSON document from typed columns, parse to variant,
    extract `$.who.user_id`, `$.tags[1]`, `$.who.value` back out. The oracle
    computes the same values straight from the base columns, so any loss or
    type drift in to_json → parse_json → variant_get fails the value hash."""
    e = load_table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_id"),
            F.struct(F.col("user_id"), F.col("value")).alias("who"),
            F.array(F.lit("head"), F.col("event_type")).alias("tags"),
        )
    )
    v = F.parse_json(doc)
    return (
        e.select(
            "event_id",
            F.variant_get(v, "$.who.user_id", "bigint").alias("uid"),
            F.variant_get(v, "$.tags[1]", "string").alias("second_tag"),
            F.round(F.variant_get(v, "$.who.value", "double"), 2).alias("val_r"),
        )
        .where(F.col("uid") % 7 == 0)
    )
