"""Interleaved per-query timing harness (the PLANS.md A/B discipline).

Runs the named queries ROUND-ROBIN for --reps rounds in ONE session —
noop-sink materialization, bench-identical cache sweep between runs — and
prints per-rep wall seconds plus the number of Spark JOBS each run
submitted (micro-batch/maintenance queries are job-submission bound at
bench SF, so job count is the structural metric wall time only hints at).

Usage:
  python scripts/ab_time.py [--reps N] [--sf DIR] query [query ...]

Interleaving (A B A B ...) makes same-session pairs comparable on a
machine whose absolute numbers drift run-over-run.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from twitter_flink_spark.session import get_spark  # noqa: E402


def _n_jobs(spark) -> int:
    """Total jobs submitted so far (AppStatusStore.jobsList)."""
    try:
        return spark._jsparkSession.sparkContext().statusStore().jobsList(
            None
        ).size()
    except Exception:
        return -1


def main() -> int:
    args = list(sys.argv[1:])
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args
    spark = get_spark(app_name="tfs-ab")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    from twitter_flink_spark.sources.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.write.format("noop").mode("overwrite").save()
    spark.range(64).repartition(64).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    results: dict[str, list[tuple[float, int]]] = {n: [] for n in names}
    for rep in range(reps):
        for name in names:
            fn = queries[name]
            j0 = _n_jobs(spark)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            nj = _n_jobs(spark) - j0
            results[name].append((dt, nj))
            spark.catalog.clearCache()
            try:
                for rdd in list(
                    spark.sparkContext._jsc.getPersistentRDDs().values()
                ):
                    rdd.unpersist(False)
            except Exception:
                pass
            print(
                f"rep{rep} {name}: {dt:.3f}s jobs={nj}",
                file=sys.stderr,
                flush=True,
            )
    print("\n== summary ==")
    for name in names:
        ts = [t for t, _ in results[name]]
        js = [j for _, j in results[name]]
        print(
            f"{name}: times={ts} jobs={js} "
            f"min={min(ts):.3f} med={sorted(ts)[len(ts) // 2]:.3f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
