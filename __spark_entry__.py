"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Every query aliases its computed columns identically in Spark and SQL, and
rounds floating-point aggregates on both sides so cross-engine summation
order cannot flip the value hash.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from twitter_flink_spark.registry import ORACLES, QUERIES
from twitter_flink_spark.plans.flagship import flagship
from twitter_flink_spark.session import tune_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return flagship(spark, "/root/testdata/sf0.001")


def _touched_module_files() -> set[str]:
    """Repo-relative .py paths changed since the last driver-artifact
    commit (the commit that last touched a CORRECTNESS_r*.json), plus
    any uncommitted changes — i.e. "this round's" code churn. Empty set
    on any git hiccup: the rotation then degrades to plain LRU."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))

    def _git(*args: str) -> str:
        return subprocess.run(
            ["git", *args],
            cwd=here,
            capture_output=True,
            text=True,
            timeout=10,
        ).stdout

    try:
        base = _git(
            "log", "-1", "--format=%H", "--", "CORRECTNESS_r*.json"
        ).strip()
        if not base:
            return set()
        changed = _git("diff", "--name-only", base, "HEAD")
        changed += _git("diff", "--name-only")  # uncommitted too
        return {p for p in changed.splitlines() if p.endswith(".py")}
    except Exception:
        return set()


def _affected_modules(touched_files: set[str]) -> set[str]:
    """Close the touched set over the package's import graph: a query
    defined in queries/X.py whose behavior lives in operators/Y.py must
    sort as touched when Y changes (most rounds change operators/*, not
    the defining query module — the rotation's blind spot otherwise).
    Static regex scan of `from twitter_flink_spark.a.b import` /
    `import twitter_flink_spark.a.b` per module, then a reverse-reachability
    pass: a module is affected if it IS touched or (transitively)
    imports a touched module. Cheap (one pass over ~30 files), no code
    execution."""
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    pkg_root = os.path.join(here, "twitter_flink_spark")
    # `from pkg.sub import a, b` can import MODULES as names (the
    # dominant idiom here: `from twitter_flink_spark.operators import
    # skipping`), so capture both the base and the imported names
    pat_from = re.compile(
        r"^\s*from\s+(twitter_flink_spark(?:\.\w+)*)\s+import\s+"
        r"\(?\s*([\w][\w,\s]*)",
        re.M,
    )
    pat_import = re.compile(
        r"^\s*import\s+(twitter_flink_spark(?:\.\w+)*)", re.M
    )
    imports: dict[str, set[str]] = {}
    for root, _dirs, files in os.walk(pkg_root):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            rel = os.path.relpath(path, here)
            try:
                with open(path) as fh:
                    src = fh.read()
            except OSError:
                continue
            deps = set()

            def _add(mod: str) -> bool:
                for cand in (mod + ".py", mod + "/__init__.py"):
                    if os.path.exists(os.path.join(here, cand)):
                        deps.add(cand)
                        return True
                return False

            for m in pat_import.finditer(src):
                _add(m.group(1).replace(".", "/"))
            for m in pat_from.finditer(src):
                base = m.group(1).replace(".", "/")
                _add(base)
                for name in re.split(r"[,\s]+", m.group(2)):
                    if name:  # symbol names resolve to no file: skipped
                        _add(f"{base}/{name}")
            # drop hub nodes (registration/aggregation only): the
            # registry and package __init__s import or are imported by
            # EVERYTHING, so traversing them marks the whole registry as
            # touched and the priority signal dilutes to nothing
            imports[rel] = {
                d
                for d in deps
                if not d.endswith("__init__.py")
                and d != "twitter_flink_spark/registry.py"
            }
    affected = set(touched_files)
    changed = True
    while changed:  # transitive closure, reversed (importers of touched)
        changed = False
        for rel, deps in imports.items():
            if rel not in affected and deps & affected:
                affected.add(rel)
                changed = True
    return affected


#: a query whose last driver-green round is this many rounds old jumps
#: the WHOLE queue, ahead even of touched-module priority: with a
#: ~50-row driver cap over a 333-query registry, touched-first ordering
#: alone starved pure-LRU rotation (by round 14, 42 queries had gone
#: 9+ rounds driver-unverified — found by scripts/check_artifacts.py's
#: staleness gate, which fails if an overdue query is not scheduled in
#: the next driver window)
_OVERDUE_ROUNDS = 7


def _last_green_rounds() -> tuple[dict[str, int], int]:
    """(query -> latest driver-green round, latest driver round seen),
    read from the driver's own committed CORRECTNESS_r*.json outputs."""
    import re

    last_green: dict[str, int] = {}
    latest = 0
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        latest = max(latest, rnd)
        for name, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and row.get("err") in (None, "")
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green, latest


def _verification_order(names: list[str]) -> list[str]:
    """Order queries so the driver's per-round correctness budget (r01 checked
    exactly the first 50 of 75) maximizes the VALUE of its 50 rows:
    OVERDUE queries first (last driver-green `_OVERDUE_ROUNDS`+ rounds
    ago, or never green — the staleness bound no priority may starve),
    then queries whose defining module changed this round (their
    behavior may have changed — a 333-query registry under a 50-row cap
    is otherwise a 7-round blind spot for regressions in touched code),
    then previously-green ones least-recently-verified first. Reads the
    driver's own CORRECTNESS_r*.json outputs and git's changed-file
    list, so the rotation is self-maintaining round over round.
    """
    last_green, latest = _last_green_rounds()
    touched_files = _touched_module_files()
    affected = _affected_modules(touched_files)
    touched = {
        n
        for n in names
        if QUERIES[n].__module__.replace(".", "/") + ".py" in affected
    }

    def _overdue(n: str) -> bool:
        return latest - last_green.get(n, 0) >= _OVERDUE_ROUNDS

    return sorted(
        names,
        key=lambda n: (
            not _overdue(n),
            n not in touched,
            last_green.get(n, 0),
            n,
        ),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ north-star)."""
    return {n: QUERIES[n] for n in _verification_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted only for ops whose
    semantics are not SQL-expressible; the driver then does a rows-only
    check)."""
    return {n: ORACLES[n] for n in _verification_order(list(QUERIES)) if n in ORACLES}
