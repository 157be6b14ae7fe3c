"""Importing this package registers every driver-facing query into
`twitter_flink_spark.registry`. One module per SURVEY.md §2 area."""

from twitter_flink_spark.queries import analytics  # noqa: F401
from twitter_flink_spark.queries import connectors  # noqa: F401
from twitter_flink_spark.queries import core  # noqa: F401
from twitter_flink_spark.queries import dedup  # noqa: F401
from twitter_flink_spark.queries import formats  # noqa: F401
from twitter_flink_spark.queries import multimodal  # noqa: F401
from twitter_flink_spark.queries import pandasops  # noqa: F401
from twitter_flink_spark.queries import quality  # noqa: F401
from twitter_flink_spark.queries import relational  # noqa: F401
from twitter_flink_spark.queries import scale  # noqa: F401
from twitter_flink_spark.queries import similarity  # noqa: F401
from twitter_flink_spark.queries import sketches  # noqa: F401
from twitter_flink_spark.queries import sqlsurface  # noqa: F401
from twitter_flink_spark.queries import streaming  # noqa: F401
from twitter_flink_spark.queries import subqueries  # noqa: F401
from twitter_flink_spark.queries import temporal  # noqa: F401
from twitter_flink_spark.queries import textops  # noqa: F401
from twitter_flink_spark.queries import tpch_extra  # noqa: F401
from twitter_flink_spark.queries import tweets  # noqa: F401
from twitter_flink_spark.queries import variant  # noqa: F401
