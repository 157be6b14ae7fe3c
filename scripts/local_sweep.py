"""Full-registry correctness sweep in the driver's artifact format.

The external driver verifies at most 50 queries per round
(`CORRECTNESS_r{N}.json`); this script runs EVERY registered query against
its DuckDB oracle at sf0.01 with a vanilla SparkSession — the same
comparison (`tests/oracle.py`, driver-strict) — and writes
`CORRECTNESS_LOCAL_r{N}.json` so the full-registry verification state is a
committed artifact, not just a transient pytest run.

Usage: python scripts/local_sweep.py <round> [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))

from pyspark.sql import SparkSession

from oracle import canon_rows, driver_canon_check, duck_connection  # noqa: E402


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    import __spark_entry__ as m

    qs, osql = m.queries(), m.oracle_sql()
    duck = duck_connection(sf_dir)
    out: dict[str, dict] = {}
    t_start = time.monotonic()
    for name, fn in qs.items():
        row = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        t0 = time.monotonic()
        try:
            df = fn(spark, sf_dir)
            if name not in osql:
                row["spark_rows"] = df.count()
                row["err"] = "no_oracle"
            else:
                oracle_df = duck.execute(osql[name]).fetchdf()
                sp = df.toPandas()  # single execution; compare on pandas
                # the driver sorts with pandas sort_values; raise the same
                # TypeError it would on unhashable (array) cells
                driver_canon_check(sp)
                driver_canon_check(oracle_df)
                row["spark_rows"] = len(sp)
                row["oracle_rows"] = len(oracle_df)
                row["schema_match"] = sorted(sp.columns) == sorted(
                    oracle_df.columns
                )
                row["rows_match"] = len(sp) == len(oracle_df)
                row["hash_match"] = row["schema_match"] and canon_rows(
                    sp
                ) == canon_rows(oracle_df)
        except Exception as exc:  # noqa: BLE001
            row["err"] = f"{type(exc).__name__}: {exc}"[:300]
        out[name] = row
        status = "ok" if row["hash_match"] else (row["err"] or "FAIL")
        print(f"{name}: {status} ({time.monotonic() - t0:.1f}s)", flush=True)

    dest = ROOT / f"CORRECTNESS_LOCAL_r{rnd:02d}.json"
    dest.write_text(json.dumps(out, indent=2))
    bad = [
        n
        for n, r in out.items()
        if r["err"] not in (None, "no_oracle") or r["hash_match"] is False
    ]
    print(
        f"swept {len(out)} queries in {time.monotonic() - t_start:.0f}s -> "
        f"{dest.name}; failures: {bad or 'none'}"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
