"""Top-N / rank operators (reference O8).

Reference: in-memory list sort + head-N inside the window function
(`TopNHashtags.java:282-291`), with two latent bugs we fix by construction:
an unstable sort on count ties (`:282` comparator) and `toIntExact` overflow
for count deltas > 2^31 (`:282`). We define the deterministic tie-break
(count desc, then key asc) and encode the same tie-break in every oracle.

Spark-first: `row_number().over(Window.partitionBy(...).orderBy(...))` with a
`<= n` filter. Catalyst ≥3.5 rewrites this into WindowGroupLimit — a
per-partition top-N heap BEFORE the shuffle, so each map task ships at most N
rows per window group instead of all rows. At 100 TB this prunes the rank
shuffle from (windows x keys) rows to (windows x N).

Global (un-partitioned) top-K uses `orderBy().limit(k)` which Spark executes
as TakeOrderedAndProject — per-partition heaps + a driver merge of K rows per
partition; no global sort ever materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topn_per_group(
    df: DataFrame,
    partition_cols: tuple[str, ...],
    order_col: str,
    tiebreak_cols: tuple[str, ...],
    n: int = 10,
    rank_alias: str = "rank",
) -> DataFrame:
    """Rank rows per group by ``order_col`` desc (ties broken by
    ``tiebreak_cols`` asc), keep rank <= n.

    Output adds an integer ``rank_alias`` column (1-based, like the
    reference's `TopNHashtags.java:284-288`).
    """
    order = [F.col(order_col).desc()] + [F.col(c).asc() for c in tiebreak_cols]
    win = Window.partitionBy(*[F.col(c) for c in partition_cols]).orderBy(*order)
    return (
        df.withColumn(rank_alias, F.row_number().over(win))
        .where(F.col(rank_alias) <= F.lit(n))
    )


def global_topk(
    df: DataFrame,
    order_col: str,
    tiebreak_cols: tuple[str, ...],
    k: int = 10,
) -> DataFrame:
    """Global top-K: executed as TakeOrderedAndProject (per-partition heaps,
    never a full sort)."""
    order = [F.col(order_col).desc()] + [F.col(c).asc() for c in tiebreak_cols]
    return df.orderBy(*order).limit(k)
