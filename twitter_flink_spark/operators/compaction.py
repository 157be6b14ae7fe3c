"""Small-file compaction: plan (bin-pack) + execute (copy-free swap).

The small-files problem is the canonical lakehouse maintenance chore: a
streaming sink or fine-grained ingest leaves a table as thousands of
KB-scale parquet files, and every scan pays per-file open/footer/schedule
cost that dwarfs the data. Compaction is the fix, and its two halves are
deliberately separate here:

- ``compaction_plan``: pure metadata — first-fit-decreasing bin-packing
  of the files below the size threshold into groups whose merged size
  approaches ``target_bytes``. O(files) driver-side planning over sizes
  the filesystem already knows (at 100 TB: over the table format's
  manifest), no data read.
- ``compact_table``: executes the plan by building a NEW GENERATION of
  the table directory — every untouched file HARDLINKED in (zero bytes
  copied, the object-store analogue is reusing the same immutable
  object keys in a new manifest), every planned group read once and
  written as one merged file — and publishing it with the same atomic
  pointer swap the skipping manifests use (`_replace_dir`): readers see
  the old or the new file set at every instant, a crash strands only a
  uniquely-named scratch generation, and rows are never duplicated or
  lost mid-compact (the failure mode of delete-originals-after-merge
  protocols).

Only the planned small files are ever opened: the I/O bill is the small
fraction being fixed, not the table.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession

from twitter_flink_spark.operators.skipping import (
    _norm_path,
    _replace_dir,
    _scratch_name,
)


def compaction_plan(
    files: list[tuple[str, int]], target_bytes: int
) -> list[list[str]]:
    """First-fit-decreasing bin-packing of the files strictly smaller
    than ``target_bytes`` into merge groups of summed size <=
    ``target_bytes``; only groups of >= 2 files are worth a rewrite and
    returned. Deterministic: ties in size break on path."""
    smalls = sorted(
        ((p, s) for p, s in files if s < target_bytes),
        key=lambda ps: (-ps[1], ps[0]),
    )
    bins: list[tuple[int, list[str]]] = []
    for p, s in smalls:
        for i, (used, members) in enumerate(bins):
            if used + s <= target_bytes:
                bins[i] = (used + s, members + [p])
                break
        else:
            bins.append((s, [p]))
    return [members for _, members in bins if len(members) >= 2]


def compact_table(
    spark: SparkSession, root: str, target_bytes: int
) -> tuple[int, int, int]:
    """Compact ``root``'s small parquet files per ``compaction_plan``;
    returns (files_before, files_after, groups_merged). No-op (no swap)
    when the plan is empty. Untouched files are hardlinked into the new
    generation — same inode, zero copy — so repeated compactions cost
    only the small tail they actually fix."""
    live = [
        _norm_path(f) for f in spark.read.parquet(root).inputFiles()
    ]
    sizes = [(p, os.stat(p).st_size) for p in sorted(live)]
    plan = compaction_plan(sizes, target_bytes)
    if not plan:
        return len(live), len(live), 0
    planned = {p for group in plan for p in group}
    gen = _scratch_name(root, "tmp")
    shutil.rmtree(gen, ignore_errors=True)
    os.makedirs(gen, exist_ok=True)
    for p, _ in sizes:
        if p not in planned:
            os.link(p, os.path.join(gen, os.path.basename(p)))
    for i, group in enumerate(plan):
        stage = _scratch_name(root, f"merge{i}")
        shutil.rmtree(stage, ignore_errors=True)
        spark.read.parquet(*group).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = next(
            f for f in os.listdir(stage) if f.endswith(".parquet")
        )
        os.rename(
            os.path.join(stage, part),
            os.path.join(gen, f"compacted-{i:05d}.parquet"),
        )
        shutil.rmtree(stage, ignore_errors=True)
    n_after = sum(
        1 for f in os.listdir(gen) if f.endswith(".parquet")
    )
    _replace_dir(gen, root)
    return len(live), n_after, len(plan)
