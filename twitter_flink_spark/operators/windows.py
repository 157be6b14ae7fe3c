"""Sliding event-time window aggregation (reference O6+O7).

Reference: `.timeWindowAll(Time.seconds(300), Time.seconds(60))` followed by
a single-task O(records x distinct-tags) linked-list count
(`TopNHashtags.java:126,247-280` — forced non-parallel at `:129`).

Spark-first replacement: `groupBy(window(ts, size, slide), key).count()`.
Semantically identical slide windows (each record lands in size/slide
windows, aligned to the epoch), but:

- KEYED and PARALLEL: the count is a Tungsten hash aggregate with map-side
  partial aggregation, so the shuffle moves one partial count per
  (partition, window, key) — not one record per event like the reference's
  global window. At 100 TB this is the difference between a working job and
  a single hot task.
- The window struct is produced by expression (no buffering of raw rows):
  `window()` expands each row into size/slide (window, row) pairs *after*
  partial aggregation pushes through — Catalyst keeps the expansion inside
  whole-stage codegen.

Skew note: a globally hot key (one viral hashtag) still lands its partials
on one reducer, but post-aggregation cardinality is (windows x keys), tiny
relative to input; AQE skew handling covers the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sliding_window_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("tag",),
    window_size: str = "300 seconds",
    window_slide: str = "60 seconds",
    count_alias: str = "cnt",
) -> DataFrame:
    """Count rows per (sliding window, key).

    Output columns: ``window_start`` (timestamp), ``window_end``, ``*key_cols``,
    ``count_alias``. Window starts are epoch-aligned multiples of the slide,
    matching both Flink's TumblingAlignment and the DuckDB oracle's
    ``floor(epoch(ts)/slide)*slide`` arithmetic.
    """
    win = F.window(F.col(ts_col), window_size, window_slide)
    return (
        df.groupBy(win.alias("window"), *[F.col(c) for c in key_cols])
        .agg(F.count(F.lit(1)).alias(count_alias))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *[F.col(c) for c in key_cols],
            F.col(count_alias),
        )
    )


def sliding_window_agg(
    df: DataFrame,
    aggs: list[Column],
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = (),
    window_size: str = "300 seconds",
    window_slide: str = "60 seconds",
) -> DataFrame:
    """General windowed aggregation: arbitrary aggregate expressions per
    (sliding window, key). Same shuffle shape as `sliding_window_counts`."""
    win = F.window(F.col(ts_col), window_size, window_slide)
    return (
        df.groupBy(win.alias("window"), *[F.col(c) for c in key_cols])
        .agg(*aggs)
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "*",
        )
        .drop("window")
    )
