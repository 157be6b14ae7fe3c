"""IVF index delete lifecycle: tombstones + CELL-LOCAL compaction.

The assignment table of the incremental IVF index
(`queries/similarity.py::_ensure_ivf_inc_index`) is partitioned by cid —
the inverted-list layout where a probe opens exactly its cell's
directory. Deletion follows the same tombstone-then-compact split as the
LSH index (`operators/dedup.py::lsh_index_delete`), with one structural
advantage the partitioning buys: compaction rewrites ONLY the cid
directories that actually contain deleted vectors, never the whole
assignment table — at 100 TB a delete batch touching k' of k cells pays
k'/k of a full rewrite, the partition-level rewrite every table format
optimizes deletes into.

Tombstones live in a ``_tombs`` sibling of ``_assign`` (one vec_id row
per deleted vector, appended O(batch) via stage+rename); every serve
path anti-joins them before scoring. A tombstoned vector also stays
"known" to the incremental assigner (its assignment row is intact), so
redelivery does not resurrect it — until compaction, whose contract
matches the LSH one: the index forgets, keeping deleted vectors out of
the SOURCE is the upstream contract.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOMBS_DIR = "_tombs"


def _tombs_path(index_dir: str) -> str:
    return os.path.join(index_dir, TOMBS_DIR)


def ivf_tombstones(spark: SparkSession, index_dir: str) -> DataFrame:
    """The current tombstone set (empty frame if none)."""
    p = _tombs_path(index_dir)
    if os.path.isdir(p):
        return spark.read.parquet(p).select("vec_id")
    return spark.createDataFrame([], "vec_id long")


def ivf_index_delete(
    spark: SparkSession, vec_ids: DataFrame, index_dir: str
) -> int:
    """Tombstone ``vec_ids`` out of the IVF index: O(delete batch) — one
    semi-join against the assignment table (only indexed vectors can be
    forgotten), one anti-join against existing tombstones (idempotent:
    re-deleting returns 0 and appends nothing), one appended parquet.
    Returns the number of newly tombstoned vectors."""
    from twitter_flink_spark.operators.dedup import _move_parquet_into

    assign = spark.read.parquet(os.path.join(index_dir, "_assign"))
    todo = (
        vec_ids.select("vec_id")
        .distinct()
        .join(assign.select("vec_id"), "vec_id", "left_semi")
        .join(ivf_tombstones(spark, index_dir), "vec_id", "left_anti")
    )
    n = todo.count()
    if not n:
        return 0
    p = _tombs_path(index_dir)
    os.makedirs(p, exist_ok=True)
    _move_parquet_into(todo, p, "tomb")
    return n


def ivf_index_compact(spark: SparkSession, index_dir: str) -> tuple[int, int]:
    """Physically drop tombstoned vectors, rewriting ONLY the cid
    directories that hold them: the tombstone set joins the assignment
    table once to find the touched cells, each touched ``cid=<c>`` dir
    is rewritten (anti-join) via tmp + atomic swap, untouched cells'
    files are never opened, and the tombstone dir is removed last — a
    crash mid-compact leaves some cells rewritten and the tombstones
    still in place, so serving stays correct (the anti-join still hides
    the not-yet-reclaimed rows) and the next compact finishes the rest.
    Returns (vectors reclaimed, cells rewritten); (0, 0) is a no-op."""
    from twitter_flink_spark.operators.skipping import (
        _replace_dir,
        _scratch_name,
    )

    tombs = ivf_tombstones(spark, index_dir)
    assign_dir = os.path.join(index_dir, "_assign")
    doomed = (
        spark.read.parquet(assign_dir)
        .join(tombs, "vec_id", "left_semi")
        .select("vec_id", "cid")
    )
    cells = [int(r["cid"]) for r in doomed.select("cid").distinct().collect()]
    n = doomed.count()
    if not n:
        return 0, 0
    for c in sorted(cells):
        cell_dir = os.path.join(assign_dir, f"cid={c}")
        kept = spark.read.parquet(cell_dir).join(
            tombs, "vec_id", "left_anti"
        )
        tmp = _scratch_name(cell_dir, "tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        kept.write.mode("overwrite").parquet(tmp)
        _replace_dir(tmp, cell_dir)
    shutil.rmtree(_tombs_path(index_dir), ignore_errors=True)
    return n, len(cells)
