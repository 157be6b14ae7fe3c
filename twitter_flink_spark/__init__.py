"""twitter_flink_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference `vriesdemichael/twitter-flink`
(a Flink 1.2 "Top-N hashtags over a sliding window" streaming job), rebuilt
Spark-first.

Design stance (see SURVEY.md §7):

- Batch DataFrame / Spark SQL core — Catalyst plans everything; zero custom
  optimizer rules are needed (SURVEY.md §4).
- Structured Streaming is a thin layer over the same query expressions
  (`twitter_flink_spark.streaming`), with the reference's top-N feedback loop
  reproduced via ``foreachBatch`` orchestration.
- Built-in JVM expressions everywhere; ``pandas_udf`` only where no builtin
  exists (and none is needed for the core pipeline).

Scale notes are inline in each operator module: every groupBy/join documents
its shuffle behavior and what holds at 100 TB / 1000 executors.
"""

from twitter_flink_spark.session import get_spark, tune_session

__all__ = ["get_spark", "tune_session"]
