"""Query registry: the single place each operator registers its driver-facing
(query, oracle) pair. ``__spark_entry__.queries()/oracle_sql()`` read from
here, and the local pytest harness (tests/test_correctness.py) runs the same
comparison the driver does.

Conventions (driver contract):
- every callable takes (spark, sf_dir) and returns a DataFrame;
- every computed column is aliased identically in Spark and SQL;
- double aggregates are rounded identically on both sides (cross-engine
  float summation order must not flip the value hash);
- a query with no oracle entry gets the driver's weaker rows-only check —
  used only for genuinely non-SQL-expressible ops.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(
    name: str, oracle: str | None = None
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            # A silent overwrite hides one of the two definitions from the
            # driver sweep forever; fail loudly at import time instead.
            raise ValueError(f"duplicate query registration: {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Importing the query modules populates the registry.
from twitter_flink_spark import queries as _queries  # noqa: E402,F401
