"""Custom stateful streaming operator via `applyInPandasWithState` — the
sanctioned escape hatch when built-in streaming aggregation can't express
the semantics (SURVEY.md §2.2 "UDF/UDAF/UDTF surface").

Reference analog: `FilterTopNCoFlatMap` keeps unmanaged per-task state (a
`String[] topN`, `TopNHashtags.java:303,328-334`) that is lost on restart.
Here the same *shape* — per-key mutable state updated batch-by-batch — is
held in Spark's managed state store instead: checkpointed, partitioned by
key, recovered on failure.

Per micro-batch, each key present in the batch emits one row with its
cumulative totals so far. The emission history depends on how the source
splits batches (nondeterministic), but the FINAL row per key — the one with
the highest `cum_events` — always equals the batch-mode groupBy totals,
which is what the oracle checks.

Scale: state is one (long, double) pair per key, hash-partitioned by the
grouping key across executors; Arrow moves each group's rows to Python in
one batch, not row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("cum_events", LongType()),
        StructField("cum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),
        StructField("vsum", DoubleType()),
    ]
)


def _update_running_totals(
    key: tuple[Any, ...],
    pdf_iter: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    cnt, vsum = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        cnt += len(pdf)
        vsum += float(pdf["value"].sum())
    state.update((cnt, vsum))
    yield pd.DataFrame(
        {"user_id": [user_id], "cum_events": [cnt], "cum_value": [vsum]}
    )


def running_totals_stream(src: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running (count, sum) over a stream: one emitted row per key
    per micro-batch it appears in, carrying the cumulative totals."""
    return src.select(key_col, "value").groupBy(key_col).applyInPandasWithState(
        _update_running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
