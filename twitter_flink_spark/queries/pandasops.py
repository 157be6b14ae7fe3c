"""Grouped-map Pandas UDF surface: per-group model fitting via
`applyInPandas`, oracle-checked against DuckDB's closed-form regression
aggregates.

This is the sanctioned escape hatch of SURVEY.md §2.2 ("UDF/UDAF/UDTF
surface") exercised on a real per-group computation: Arrow ships each
group's columns to Python as one vectorized batch (never row-at-a-time),
numpy does the math, Arrow ships one row back. At 100 TB the shape holds:
one shuffle on the group key, each group processed by exactly one task —
the risk is a skewed giant group, which for bounded per-user event counts
(rate-limited upstream) stays bounded."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_flink_spark.registry import register
from twitter_flink_spark.sources.tables import load_table


@register(
    "applyinpandas_user_trend",
    oracle="""
WITH base AS (
  SELECT user_id,
         (epoch_us(ts) - (SELECT epoch_us(min(ts)) FROM events)) / 3600e6 AS x,
         value AS y
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(y, x), 6) AS slope,
       round(regr_intercept(y, x), 6) AS intercept
FROM base
GROUP BY user_id
HAVING count(*) >= 3 AND var_pop(x) > 0
""",
)
def applyinpandas_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend of event value over time (hours since
    corpus start), fit group-by-group in a pandas grouped-map UDF. The
    oracle is DuckDB's regr_slope/regr_intercept — the UDF must reproduce
    the closed form exactly (population covariance over population
    variance). Time origin comes from a broadcast 1-row aggregate, not a
    driver-side collect."""
    e = load_table(spark, sf_dir, "events")
    t0 = e.agg(F.min("ts").alias("t0"))
    base = e.crossJoin(F.broadcast(t0)).select(
        "user_id",
        (
            (F.col("ts").cast("double") - F.col("t0").cast("double")) / 3600.0
        ).alias("x"),
        F.col("value").alias("y"),
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["x"].to_numpy()
        y = pdf["y"].to_numpy()
        n = len(x)
        if n < 3:
            return pd.DataFrame(
                columns=["user_id", "n", "slope", "intercept"]
            ).astype({"user_id": "int64", "n": "int64"})
        xbar = x.mean()
        ybar = y.mean()
        sxx = ((x - xbar) ** 2).sum()
        if sxx == 0.0:
            return pd.DataFrame(
                columns=["user_id", "n", "slope", "intercept"]
            ).astype({"user_id": "int64", "n": "int64"})
        slope = ((x - xbar) * (y - ybar)).sum() / sxx
        return pd.DataFrame(
            [
                {
                    "user_id": int(pdf["user_id"].iloc[0]),
                    "n": n,
                    "slope": slope,
                    "intercept": ybar - slope * xbar,
                }
            ]
        )

    fitted = base.groupBy("user_id").applyInPandas(
        fit, "user_id long, n long, slope double, intercept double"
    )
    # round Spark-side so both engines use the same rounding rule
    return fitted.select(
        "user_id",
        "n",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
    )


@register(
    "pandas_udaf_value_mad",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(mad(value), 6) AS value_mad
FROM events
GROUP BY event_type
""",
)
def pandas_udaf_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (Series → scalar) — the UDAF face of
    the UDF surface, distinct from the grouped-map form above: Spark plans
    it like an aggregate (per-group Arrow batch in, one value out). Note
    the planner restriction: pandas group-aggregates cannot share an .agg()
    with JVM aggregates, so the row count is a pandas aggregate too (the
    real cost is the same Arrow transfer either way). Median absolute
    deviation is the robust spread statistic quality pipelines prefer over
    stddev (outliers move stddev, not MAD); no built-in expression computes
    it, which is exactly when the escape hatch is warranted."""
    import numpy as np

    @F.pandas_udf("double")
    def mad(v: pd.Series) -> float:
        x = v.to_numpy()
        m = np.median(x)
        return float(np.median(np.abs(x - m)))

    @F.pandas_udf("long")
    def arrow_count(v: pd.Series) -> int:
        return len(v)

    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        arrow_count("value").alias("n"),
        F.round(mad("value"), 6).alias("value_mad"),
    )
