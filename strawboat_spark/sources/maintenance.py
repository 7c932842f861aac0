"""Table maintenance for strawboat directories.

compact(): merge many small files (the natural output of a streaming
sink's per-microbatch-per-task files) into few right-sized ones.
Layout-preserving: a hive-partitioned directory is compacted leaf-dir
by leaf-dir, so partition pruning keeps working and each output file
still holds exactly one partition value.

Scale shape: one Spark job per leaf directory, reading through the
datasource (stripes fan out) and writing `target_files` outputs via
coalesce — no driver-side data movement; the swap is file renames.
Local-FS rename swap is near-atomic per directory; an object-store
deployment would swap a manifest instead (out of scope here).
"""

from __future__ import annotations

import glob as _glob
import os
import shutil

from strawboat_spark.sources.datasource import FILE_EXT, register


def _leaf_dirs(path: str) -> list[str]:
    """Directories that directly contain data files."""
    out = []
    for root, _dirs, files in os.walk(path):
        if any(f.endswith(FILE_EXT) for f in files):
            out.append(root)
    return sorted(out)


def compact(spark, path: str, target_files: int = 1) -> dict:
    """Rewrite each leaf directory's files into `target_files` files.

    Returns {"before": n_files, "after": n_files}. Skips leaf dirs that
    already have <= target_files files.
    """
    register(spark)
    before = after = 0
    for leaf in _leaf_dirs(path):
        files = sorted(_glob.glob(os.path.join(leaf, f"*{FILE_EXT}")))
        before += len(files)
        if len(files) <= target_files:
            after += len(files)
            continue
        tmp = leaf + ".__compact__"
        (
            spark.read.format("strawboat")
            .load(leaf)
            .coalesce(target_files)
            .write.format("strawboat")
            .mode("overwrite")
            .save(tmp)
        )
        new_files = sorted(_glob.glob(os.path.join(tmp, f"*{FILE_EXT}")))
        # Move replacements in (unique uuid names) BEFORE deleting the
        # originals: a crash or concurrent reader mid-swap sees a
        # complete (at worst duplicated) set, never missing rows.
        for f in new_files:
            shutil.move(f, os.path.join(leaf, os.path.basename(f)))
        for f in files:
            os.remove(f)
        shutil.rmtree(tmp, ignore_errors=True)
        after += len(new_files)
    return {"before": before, "after": after}
