"""Capture .explain("formatted") for named queries into plans/<round>/.

Usage: python scripts/capture_plans.py <round_dir> <suffix> <query> [...]
Writes plans/<round_dir>/<query>_<suffix>.txt for each (suffix:
before|after). The round dir is an argument (not hardcoded) so reusing
the script next round can never overwrite or mislabel a prior round's
artifacts.

The plan is the final served DataFrame's formatted physical plan — for
queries whose body executes work before returning (streaming drains,
index builds), that prelude runs here exactly as in the bench, and the
captured plan is the serve plan (inner micro-batch plans live in
tests/test_plans.py's STREAM_PLANS capture instead).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from twitter_flink_spark.session import get_spark  # noqa: E402


def main() -> int:
    round_dir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = ROOT / "plans" / round_dir
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="tfs-plan-capture")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain(mode="formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"captured {name}_{suffix}.txt", file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
