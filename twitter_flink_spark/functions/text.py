"""Text scalar functions (reference O3/O5 analogs + north-star text analysis).

The reference's entire scalar-function surface is: `lower`
(`TopNHashtags.java:202`), split-on-space (`:235,:314`), `trim` (`:235`),
concat (`:162,:167`), and array membership (`:315`). All are built-in Spark
expressions (JVM-side, codegen'd) — no UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokenize(text: Column) -> Column:
    """Split on single spaces, drop empty tokens — exactly the reference's
    re-split + empty-token guard (`TopNHashtags.java:235-238`).
    Stays a builtin higher-order expression (no UDF)."""
    return F.filter(F.split(text, " "), lambda t: t != F.lit(""))


def with_tokens(df: DataFrame, text_col: str = "text", out: str = "tokens") -> DataFrame:
    return df.withColumn(out, tokenize(F.col(text_col)))
