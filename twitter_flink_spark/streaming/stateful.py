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
    StringType,
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


# -- repair ledger: cumulative gate telemetry in the managed store ----------

REPAIR_CAP = 150.0  #: the ingest contract's value cap (quarantine rule)

LEDGER_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("cum_rows", LongType()),
        StructField("cum_repaired", LongType()),
        StructField("repaired_excess", DoubleType()),
    ]
)

LEDGER_STATE_SCHEMA = StructType(
    [
        StructField("rows", LongType()),
        StructField("rep", LongType()),
        StructField("exc", DoubleType()),
    ]
)


def _update_repair_ledger(
    key: tuple[Any, ...],
    pdf_iter: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    rows, rep, exc = state.get if state.exists else (0, 0, 0.0)
    for pdf in pdf_iter:
        rows += len(pdf)
        bad = pdf["value"] > REPAIR_CAP
        rep += int(bad.sum())
        exc += float((pdf.loc[bad, "value"] - REPAIR_CAP).sum())
    state.update((rows, rep, exc))
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "cum_rows": [rows],
            "cum_repaired": [rep],
            "repaired_excess": [exc],
        }
    )


def repair_ledger_stream(
    src: DataFrame, key_col: str = "event_type"
) -> DataFrame:
    """Cumulative repair-gate telemetry per key as EXPLICIT managed
    state: every micro-batch, each key present emits one row with its
    running (rows seen, rows over the cap = repaired, total clamped
    excess). The sink-side repair itself lives in foreachBatch
    (`streaming_quarantine_repair` — a repair must write quarantine,
    good table, and index, which a stateful transform cannot);
    this operator is the complementary always-on ledger the gate's
    dashboard watches: checkpointed, key-partitioned, recovered on
    restart — unlike the reference's lost per-task array
    (`TopNHashtags.java:303`). Arrow moves each group's batch rows to
    Python in one block; state is three scalars per key."""
    return (
        src.select(key_col, "value")
        .groupBy(key_col)
        .applyInPandasWithState(
            _update_repair_ledger,
            outputStructType=LEDGER_OUTPUT_SCHEMA,
            stateStructType=LEDGER_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
