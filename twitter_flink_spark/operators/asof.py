"""As-of (point-in-time) join: each left row picks the latest right row at
or before its timestamp, per key — the temporal lookup every feature store,
slowly-changing-dimension read, and trade/quote alignment needs, and an
operator Spark's join syntax lacks (the reference's engine family exposes it
as a primitive; DuckDB spells it `ASOF JOIN`, which is exactly what the
oracle uses).

Spark-first formulation: DO NOT join. A range-condition join per key either
explodes (every left x every earlier right, then argmax) or falls off the
equi-join fast path. Instead, union the two sides with a side marker and run
ONE `last(<right payload>, ignorenulls=True)` running window ordered by
(ts, side): each left row then carries the most recent right payload at or
before it. Cost = one hash shuffle per side on the key + one sort per
partition — identical to what a sort-merge join would pay BEFORE its probe,
with no range-probe or candidate blow-up on top. State per group is one
carried struct, so a key with millions of rows on both sides streams through
the window operator; at 100 TB the sort is the only super-linear term, and
it is per-partition, spillable, and AQE-sized.

Ties (right.ts == left.ts) match, mirroring DuckDB ASOF `>=`: the union sorts
right rows before left rows at equal ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: tuple[str, ...],
    how: str = "left",
) -> DataFrame:
    """Left as-of-backward join.

    Returns every `left` row plus `payload_cols` taken from the latest
    `right` row with ``right[right_ts] <= left[left_ts]`` and the same `on`
    key (NULL payload when no such row exists; ``how='inner'`` drops those).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join_backward: how must be left|inner, got {how!r}")
    left_cols = [c for c in left.columns]
    # side=0 sorts right rows first at equal ts → inclusive (<=) match
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*payload_cols).alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        *left_cols,
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r.unionByName(l)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )
    if how == "inner":
        carried = carried.where(F.col("__match").isNotNull())
    return carried.select(
        *left_cols,
        *[F.col(f"__match.{c}").alias(c) for c in payload_cols],
    )
