"""Local mirror of the driver's DuckDB-oracle comparison: row count, schema
(column-name set), and order-insensitive value comparison.

Values are canonicalized cell-by-cell (timestamps → isoformat, floats →
12-significant-digit repr, NaN/None → sentinel) and compared as sorted row
multisets, so any residual cross-engine float jitter must be removed by the
queries themselves (round on both sides) — same discipline the driver's
value-hash demands.
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


def _canon_cell(v) -> str:
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.12g}"
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        return v.isoformat()
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    return sorted(out)


def compare(spark_df, oracle_df: pd.DataFrame) -> list[str]:
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
    a, b = canon_rows(sp), canon_rows(oracle_df)
    if a != b:
        only_spark = [r for r in a if r not in set(b)][:5]
        only_oracle = [r for r in b if r not in set(a)][:5]
        problems.append(
            f"value mismatch: {len([r for r in a if r not in set(b)])} spark-only rows, "
            f"e.g. spark-only={only_spark} oracle-only={only_oracle}"
        )
    return problems
