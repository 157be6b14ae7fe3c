"""Simulate the external driver's contract check against __spark_entry__.

Runs with a PLAIN SparkSession (no repo confs) exactly like the driver:
  - entry(spark) smoke check (collect, rows >= 0)
  - every queries() entry at sf0.01, compared to its oracle_sql() in DuckDB
    on row count (full value compare lives in tests/oracle.py)
Prints per-query wall time so the registry can be profiled against the
driver's correctness budget.

Usage: python scripts/driver_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
from pyspark.sql import SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    import __spark_entry__ as m

    t0 = time.monotonic()
    n = len(m.entry(spark).collect())
    print(f"entry: {n} rows in {time.monotonic() - t0:.1f}s", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, osql = m.queries(), m.oracle_sql()
    fails, total = [], 0.0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            spark_rows = len(fn(spark, sf_dir).collect())
            err = None
        except Exception as e:  # noqa: BLE001
            spark_rows, err = -1, f"{type(e).__name__}: {e}"
        dt = time.monotonic() - t0
        total += dt
        if err:
            fails.append(name)
            print(f"FAIL {name}: {err[:200]}  [{dt:.1f}s]", flush=True)
            continue
        if name in osql:
            oracle_rows = len(con.execute(osql[name]).fetchall())
            ok = spark_rows == oracle_rows
        else:
            oracle_rows, ok = None, spark_rows >= 0
        status = "ok  " if ok else "FAIL"
        if not ok:
            fails.append(name)
        print(
            f"{status} {name}: spark={spark_rows} oracle={oracle_rows} [{dt:.1f}s]",
            flush=True,
        )

    print(f"\n{len(fails)} failures of {len(qs)} queries; spark total {total:.1f}s")
    if fails:
        print("failed:", ", ".join(fails))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
