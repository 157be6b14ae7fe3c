"""Local mirror of the driver's DuckDB-oracle comparison: row count, schema
(column-name set), and order-insensitive value comparison.

STRICT by default (round-2 change): cells are stringified essentially raw —
`str(int)` for ints, `repr(float)` for floats (so `123` vs `123.0` MISMATCH,
reproducing the driver's value-hash semantics that caught the r01
HUGEINT-sum oracles), timestamps → isoformat, NaN/None → sentinel. Any
cross-engine numeric-type or float-jitter divergence must be fixed in the
query/oracle pair (CAST both sides, round both sides) — never here.

The old 12-sig-digit / int-coercing comparison survives behind `lax=True`
for diagnostics only; no test uses it for pass/fail.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v, lax: bool = False) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NULL"
        if lax:
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return f"{v:.12g}"
        return repr(v)
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        return v.isoformat()
    return str(v)


def driver_canon_check(df: pd.DataFrame) -> None:
    """Mirror the DRIVER's canonicalizer shape: it sorts the pandas frame
    with ``sort_values`` over all columns (factorizing object cells), so any
    cell type pandas cannot hash — ndarray/list/dict from Array/Map/Struct
    output columns — raises ``TypeError: unhashable type`` on the driver
    even though the stringifying comparison below handles it fine. Raising
    HERE keeps the local sweep red wherever the driver would be red (the
    r04 divergence: 4 queries locally green, driver-err)."""
    if len(df):
        df.sort_values(by=sorted(df.columns))


def canon_rows(df: pd.DataFrame, lax: bool = False) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v, lax) for v in row))
    return sorted(out)


def compare(spark_df, oracle_df: pd.DataFrame, lax: bool = False) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(
            f"schema mismatch: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(sp) != len(oracle_df):
        problems.append(f"row count: spark={len(sp)} oracle={len(oracle_df)}")
    try:
        driver_canon_check(sp)
        driver_canon_check(oracle_df)
    except (TypeError, ValueError) as exc:
        # TypeError: unhashable ndarray in the multi-column lexsort path;
        # ValueError: ambiguous ndarray truth value in the single-column
        # nargsort path — both mean the driver's sort_values would crash
        problems.append(f"driver canon would crash: {exc}")
        return problems
    a, b = canon_rows(sp, lax), canon_rows(oracle_df, lax)
    if a != b:
        only_spark = [r for r in a if r not in set(b)][:5]
        only_oracle = [r for r in b if r not in set(a)][:5]
        problems.append(
            f"value mismatch: {len([r for r in a if r not in set(b)])} spark-only rows, "
            f"e.g. spark-only={only_spark} oracle-only={only_oracle}"
        )
    return problems
