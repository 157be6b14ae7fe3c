"""CLI entry point: run the flagship pipeline batch or streaming, or any
registered query by name.

Batch:  python -m twitter_flink_spark --sf-dir /root/testdata/sf0.001 --N 5
Stream: python -m twitter_flink_spark --mode stream
List:   python -m twitter_flink_spark --mode list
Query:  python -m twitter_flink_spark --mode query --query q1_pricing_summary

Prints the per-window top-N leaderboard (reference console sink, O12) and —
when a Redis host is configured — would upsert rank-keyed entries (O13; the
in-process KVStore stands in, printed at exit). `--mode query` exposes the
whole registry (the complete-engine surface a reference user migrates to)
through the same console sink.
"""

from __future__ import annotations

import sys

from twitter_flink_spark.config import resolve
from twitter_flink_spark.session import get_spark


def run_registered(spark, name: str, sf_dir: str, n_rows: int = 20):
    """Run one registered query and return its DataFrame (the testable
    core of `--mode query`)."""
    from twitter_flink_spark.registry import QUERIES

    if name not in QUERIES:
        import difflib

        close = difflib.get_close_matches(name, QUERIES, n=3)
        raise SystemExit(
            f"unknown query {name!r}; close matches: {close}; "
            f"--mode list prints all {len(QUERIES)}"
        )
    return QUERIES[name](spark, sf_dir)


def main(argv: list[str] | None = None) -> int:
    cfg = resolve(argv)
    spark = get_spark(
        app_name="twitter-flink-spark",
        shuffle_partitions=cfg.parallelism or None,
    )
    try:
        if cfg.mode == "list":
            from twitter_flink_spark.registry import QUERIES

            for name in sorted(QUERIES):
                print(name)
            return 0
        if cfg.mode == "query":
            if not cfg.query:
                raise SystemExit("--mode query requires --query <name>")
            df = run_registered(spark, cfg.query, cfg.sf_dir)
            df.show(cfg.N or 20, truncate=False)
            print(f"{cfg.query}: {df.count()} rows")
            return 0
        if cfg.mode == "stream":
            from twitter_flink_spark.streaming.pipeline import TopNFeedback

            fb = TopNFeedback(spark, cfg.sf_dir, key_col="event_type", n=cfg.N)
            fb.run_leaderboard()
            matches = fb.run_filter()
            print(f"top-{cfg.N} snapshot: {fb.snapshot}")
            print(f"kv leaderboard: {fb.kv.data}")
            print(f"matched events: {matches.count()}")
        else:
            from twitter_flink_spark.plans.flagship import (
                flagship,
                topn_tokens_per_window,
            )

            topn = topn_tokens_per_window(spark, cfg.sf_dir, n=cfg.N)
            topn.orderBy("window_start", "rank").show(3 * cfg.N, truncate=False)
            matched = flagship(spark, cfg.sf_dir, n=cfg.N)
            print(f"documents matching a top-{cfg.N} token: {matched.count()}")
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
