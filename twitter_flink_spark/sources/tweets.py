"""Tweet-shaped JSON source + parse operator (reference O1+O3).

The reference consumes raw Twitter status JSON strings and flatMaps them to
`(id, text, tags)` with per-record try/catch drop of malformed input
(`TopNHashtags.java:116-118,188-209`), flattening the hashtag array to a
space-joined lowercased string (`:196-203`) — a lossy round-trip we replace
with a real `array<string>` column (SURVEY.md §1.2).

Spark-first: `from_json` with the explicit schema (FIXTURES.md §B) in
PERMISSIVE mode — malformed rows parse to null and are filtered, the exact
drop-don't-fail semantics of the reference's catch (`:207`), but expressed
declaratively so it runs inside codegen and the JSON pruning optimization
only materializes the referenced fields.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: FIXTURES.md §B / TopNHashtags.java:192-203 implied schema.
STATUS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField(
            "entities",
            T.StructType(
                [
                    T.StructField(
                        "hashtags",
                        T.ArrayType(
                            T.StructType([T.StructField("text", T.StringType())])
                        ),
                    )
                ]
            ),
        ),
    ]
)


def parse_statuses(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """Parse raw status JSON strings → (status_id, status_text, tags).

    - malformed JSON / missing id ⇒ row dropped (reference `:207`)
    - hashtags lowercased (reference `:202`), kept as array<string> —
      missing/zero hashtags ⇒ empty array (the reference emits an empty
      string, `:196-205`)
    """
    j = F.from_json(F.col(json_col), STATUS_SCHEMA)
    tags: Column = F.coalesce(
        F.transform(j["entities"]["hashtags"], lambda h: F.lower(h["text"])),
        F.array().cast("array<string>"),
    )
    return (
        raw.select(
            j["id"].alias("status_id"),
            j["text"].alias("status_text"),
            tags.alias("tags"),
        )
        .where(F.col("status_id").isNotNull())
    )


def read_status_lines(spark, path: str) -> DataFrame:
    """Batch JSON-lines reader for status fixtures: one raw JSON string per
    line (spark.read.text, NOT spark.read.json — parsing happens in
    `parse_statuses` so the drop semantics stay in one place)."""
    return spark.read.text(path)
