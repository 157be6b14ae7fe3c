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
