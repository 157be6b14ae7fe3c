"""Custom connector via Spark 4's Python DataSource API.

Reference analog: the reference's only source is a custom connector — Flink's
``TwitterSource`` wired to a hand-built endpoint (`TopNHashtags.java:94-95`,
`TwitterFilterEndpoint.java:13-66`). The idiomatic Spark 4 counterpart is a
``pyspark.sql.datasource.DataSource``: the engine asks the source for its
schema and partitions, then runs ``read(partition)`` task-parallel on the
executors — exactly how a real connector to a REST API / proprietary store /
firehose is built today, with no JVM code.

This module implements a deterministic synthetic "status" source (the shape
of §1.2's tweet JSON after parsing: id, text, tags[], lang) in both batch and
micro-batch streaming forms. Determinism matters twice over:

- every row is a pure function of its ``status_id`` (md5-derived), so a
  DuckDB oracle can re-derive the exact dataset with ``range()`` + ``md5()``
  and the driver's value-hash check verifies the CONNECTOR, not just the
  query on top of it;
- partition boundaries don't affect content, so the batch read and the
  micro-batch streaming read of the same range are provably identical
  (pinned by tests/test_pyds.py).

Scale: ``partitions()`` splits the id range into ``numPartitions`` slices —
reading is embarrassingly parallel and driver-side state is O(partitions).
The streaming reader's offset is a single row index; each trigger claims the
next ``rowsPerBatch`` ids, so restart-from-checkpoint resumes exactly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    InputPartition,
    StringContains,
)

SOURCE_NAME = "synthetic_statuses"
SCHEMA = "status_id BIGINT, text STRING, tags ARRAY<STRING>, lang STRING"


def status_row(i: int) -> tuple[int, str, list[str], str]:
    """The one row for status id ``i`` — pure, shared by batch and stream.

    Mirrored in SQL by ``status_oracle_cte`` below; any edit here must keep
    the two in lockstep (the driver's value-hash compares them).
    """
    h = hashlib.md5(str(i).encode()).hexdigest()
    c0 = h[0]
    n_tags = 1 if c0 <= "4" else 2 if c0 <= "9" else 3
    tags = [f"tag{h[1 + j]}" for j in range(n_tags)]
    lang = "en" if h[1] <= "7" else "nl"
    text = f"status {i} " + " ".join("#" + t for t in tags)
    return (i, text, tags, lang)


def status_oracle_cte(n_rows: int) -> str:
    """DuckDB CTE producing exactly the rows ``status_row`` yields for ids
    [0, n_rows) — the SQL mirror of the Python generator (exploded to one
    row per (status_id, tag); re-aggregate as the query needs)."""
    return f"""
ids AS (
  SELECT CAST(g AS BIGINT) AS status_id, md5(CAST(g AS VARCHAR)) AS h
  FROM range(0, {n_rows}) t(g)
),
statuses AS (
  SELECT status_id, h,
         CASE WHEN substr(h, 1, 1) <= '4' THEN 1
              WHEN substr(h, 1, 1) <= '9' THEN 2
              ELSE 3 END AS n_tags,
         CASE WHEN substr(h, 2, 1) <= '7' THEN 'en' ELSE 'nl' END AS lang
  FROM ids
),
status_tags AS (
  SELECT status_id, lang, 'tag' || substr(h, 1 + j, 1) AS tag
  FROM statuses CROSS JOIN unnest([1, 2, 3]) AS u(j)
  WHERE j <= n_tags
)"""


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


#: rows per emitted Arrow batch: the columnar boundary keeps BOUNDED
#: memory per task (one chunk's rows, never the whole partition) while
#: staying large enough that per-batch overhead amortizes.
BATCH_ROWS = 8192


def rows_to_batches(rows):
    """Arrow RecordBatches of ``BATCH_ROWS`` each from an iterable of
    status rows (empty → nothing). ``read()`` yields Arrow batches
    instead of tuples so the executor boundary is columnar rather than
    one pickled row per status — the same guidance as pandas/Arrow UDFs
    (pass batches, not rows). Chunking (instead of one batch per
    partition) bounds peak task memory to a chunk and lets downstream
    execution start before the partition finishes generating. Values
    are exactly ``status_row``'s; only the serialization changes."""
    import pyarrow as pa

    schema = pa.schema(
        [
            ("status_id", pa.int64()),
            ("text", pa.string()),
            ("tags", pa.list_(pa.string())),
            ("lang", pa.string()),
        ]
    )
    chunk: list = []
    for row in rows:
        chunk.append(row)
        if len(chunk) >= BATCH_ROWS:
            yield _chunk_to_batch(chunk, pa, schema)
            chunk = []
    if chunk:
        yield _chunk_to_batch(chunk, pa, schema)


def _chunk_to_batch(rows: list, pa, schema):
    return pa.RecordBatch.from_arrays(
        [
            pa.array([r[0] for r in rows], pa.int64()),
            pa.array([r[1] for r in rows], pa.string()),
            pa.array([r[2] for r in rows], pa.list_(pa.string())),
            pa.array([r[3] for r in rows], pa.string()),
        ],
        schema=schema,
    )


class SyntheticStatusBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 10000))
        self.n_parts = max(1, int(options.get("numPartitions", 8)))
        self.lang_filter: str | None = None
        self.track_terms: list[str] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Source-side predicate pushdown — the connector-level analog of the
        reference pushing language AND track-term filters into Twitter's
        servers (`TwitterFilterEndpoint.java:46-66`). ``lang = <lit>`` and
        ``contains(text, <lit>)`` (the track-term shape) are absorbed —
        rows are skipped at generation, before they ever reach Spark;
        everything else is returned for Spark to evaluate post-scan.
        Absorbed filters keep Spark's conjunction semantics: every pushed
        predicate must hold."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("lang",):
                self.lang_filter = f.value
            elif isinstance(f, StringContains) and f.attribute == ("text",):
                self.track_terms.append(f.value)
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        step = -(-self.n_rows // self.n_parts)  # ceil div
        return [
            _IdRange(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _IdRange):
        def surviving():
            for i in range(partition.start, partition.end):
                row = status_row(i)
                if (
                    self.lang_filter is not None
                    and row[3] != self.lang_filter
                ):
                    continue
                if any(term not in row[1] for term in self.track_terms):
                    continue
                yield row

        yield from rows_to_batches(surviving())


class SyntheticStatusStreamReader(DataSourceStreamReader):
    """Micro-batch reader: the offset is just "rows emitted so far"."""

    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 10000))
        self.rows_per_batch = int(options.get("rowsPerBatch", 1000))
        self.n_parts = max(1, int(options.get("numPartitions", 4)))
        self._head = 0  # driver-side cursor for rate limiting

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        # Rate limiting MUST happen here: whatever this returns is the end
        # offset Spark records as consumed for the batch — truncating later
        # in partitions() would silently skip the remainder. A real
        # connector asks the upstream system for its (monotonic) head and
        # caps it; this synthetic source self-advances, so after a restart
        # the cursor must first be RESTORED from the offsets Spark replays
        # (partitions()/commit() below) — returning an offset below the
        # checkpointed position would rewind the offset log and re-emit
        # committed batches (observed as duplicates before this guard).
        self._head = min(self._head + self.rows_per_batch, self.n_rows)
        return {"index": self._head}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["index"]), int(end["index"])
        # WAL replay on restart hands us the checkpointed range — adopt it
        # as the cursor floor so latestOffset never goes backwards.
        self._head = max(self._head, lo, hi)
        if hi <= lo:
            # empty offset range: the contract wants an empty sequence —
            # a placeholder range would schedule a no-op task per batch
            return []
        step = -(-(hi - lo) // self.n_parts)
        return [_IdRange(a, min(a + step, hi)) for a in range(lo, hi, step)]

    def read(self, partition: _IdRange):
        yield from rows_to_batches(
            status_row(i) for i in range(partition.start, partition.end)
        )

    def commit(self, end: dict) -> None:
        # nothing external to ack (checkpoint offsets are the truth), but
        # adopt the committed position as the cursor floor — on restart
        # Spark may replay commit() before the next latestOffset().
        self._head = max(self._head, int(end["index"]))


class SyntheticStatusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SyntheticStatusBatchReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return SyntheticStatusStreamReader(self.options)


def register_datasource(spark) -> None:
    """Idempotently register the source on a session (the driver hands us a
    vanilla one, so every query that uses the source registers first).
    Spark refuses a reader that merely IMPLEMENTS pushFilters unless python
    filter pushdown is switched on, so enable it here too."""
    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    spark.dataSource.register(SyntheticStatusDataSource)
