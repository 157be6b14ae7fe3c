"""Full-registry correctness sweep in the driver's artifact format.

The external driver verifies at most 50 queries per round
(`CORRECTNESS_r{N}.json`); this script runs EVERY registered query against
its DuckDB oracle at sf0.01 with a vanilla SparkSession — the same
comparison (`tests/oracle.py`, driver-strict) — and writes
`CORRECTNESS_LOCAL_r{N}.json` so the full-registry verification state is a
committed artifact, not just a transient pytest run.

Usage: python scripts/local_sweep.py <round> [sf_dir] [--top N] [--out PATH]

--top N restricts the sweep to the N heaviest queries by the latest bench
timings (BENCH_QUERIES_LATEST.json) — the sf0.1 spot-sweep mode that
catches scale-dependent drift (AQE plan switches, decimal overflow) on
exactly the queries where scale bites first. --out overrides the artifact
path (default CORRECTNESS_LOCAL_r{NN}.json).
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
    args = list(sys.argv[1:])
    top_n = None
    out_path = None
    if "--top" in args:
        i = args.index("--top")
        top_n = int(args[i + 1])
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out_path = Path(args[i + 1])
        del args[i : i + 2]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        del args[i : i + 2]
    rnd = int(args[0]) if args else 0
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    import __spark_entry__ as m

    qs, osql = m.queries(), m.oracle_sql()
    if top_n is not None:
        bench = json.loads(
            (ROOT / "BENCH_QUERIES_LATEST.json").read_text()
        )["queries"]
        heavy = sorted(bench, key=lambda k: -bench[k])[:top_n]
        qs = {n: qs[n] for n in heavy if n in qs}
        print(f"spot-sweep of the {len(qs)} heaviest queries", flush=True)
    if only is not None:
        missing = only - set(qs)
        if missing:
            print(f"unknown queries: {sorted(missing)}")
            return 1
        qs = {n: qs[n] for n in qs if n in only}
        print(f"scoped sweep of {len(qs)} queries", flush=True)
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

    dest = out_path or ROOT / f"CORRECTNESS_LOCAL_r{rnd:02d}.json"
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
