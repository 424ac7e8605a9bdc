"""Atomic snapshot publish for parquet outputs — the Iceberg-commit analog.

Reference: the write mode in core/src/main/java/org/neo4j/gds/core/write/
NativeNodePropertyExporter.java commits node properties transactionally:
readers never observe a half-written result, and a failed write leaves the
previous state intact.  SURVEY.md maps this to an Iceberg `MERGE INTO` /
snapshot commit on a cluster; this module is the plain-filesystem analog for
the sandbox (and any POSIX staging area):

  1. STAGE    — write the full parquet dataset into a fresh version dir
                `.<name>.versions/v_<uuid>` next to the target path.
  2. PUBLISH  — create a temp symlink to the version dir, then `os.replace`
                it onto the target path.  `rename(2)` is atomic on POSIX, so
                a reader either sees the old snapshot or the new one, never
                a partial directory.
  3. GC       — after the pointer flip, delete superseded version dirs.

A crash at any point before step 2's `os.replace` leaves the target symlink
untouched and the previous snapshot fully readable (crash-injection test:
tests/test_atomic_write.py).  `spark.read.parquet(target)` follows the
symlink transparently, so readers need no special API.

At 100 TB the same protocol holds with the version dir on object storage and
the pointer flip delegated to the Iceberg/Hive catalog's metadata swap —
the STAGE step (a full parallel parquet write) is unchanged.
"""

import os
import shutil
import uuid

from pyspark.sql import DataFrame

__all__ = ["atomic_parquet_overwrite", "versions_root"]


def versions_root(path: str) -> str:
    path = os.path.abspath(path)
    return os.path.join(
        os.path.dirname(path), f".{os.path.basename(path)}.versions"
    )


def _stage_dir(path: str) -> str:
    root = versions_root(path)
    os.makedirs(root, exist_ok=True)
    return os.path.join(root, f"v_{uuid.uuid4().hex}")


def _publish(path: str, staged: str) -> None:
    """Atomically point `path` at the staged version dir (commit point)."""
    path = os.path.abspath(path)
    root = versions_root(path)
    tmp_link = os.path.join(root, f".link_{uuid.uuid4().hex}")
    os.symlink(staged, tmp_link)
    if os.path.lexists(path) and not os.path.islink(path):
        # Migrate a pre-existing plain directory (legacy non-atomic output)
        # into the versions root so the final rename can succeed; this one
        # rename is the only non-idempotent step and still leaves the old
        # data readable at its new location if we crash here.
        os.rename(path, os.path.join(root, f"v_legacy_{uuid.uuid4().hex}"))
    os.replace(tmp_link, path)  # atomic on POSIX


def _gc(path: str) -> None:
    path = os.path.abspath(path)
    root = versions_root(path)
    current = os.path.realpath(path)
    for d in os.listdir(root):
        full = os.path.join(root, d)
        if d.startswith("v_") and os.path.realpath(full) != current:
            shutil.rmtree(full, ignore_errors=True)


def atomic_parquet_overwrite(df: DataFrame, path: str, gc: bool = True) -> str:
    """Write `df` as parquet to `path` with snapshot semantics.

    Returns the published path.  Concurrent readers holding the old snapshot
    open keep reading it until GC; pass gc=False to retain all versions
    (time-travel-lite).
    """
    path = os.path.abspath(path)
    staged = _stage_dir(path)
    df.write.mode("overwrite").parquet(staged)  # STAGE (parallel, restartable)
    _publish(path, staged)  # COMMIT
    if gc:
        _gc(path)
    return path


def atomic_publish_dir(path: str, populate, gc: bool = True) -> str:
    """Generalized form: `populate(staging_dir)` fills a fresh directory
    (any files — multiple parquet tables, manifests); the directory is then
    atomically published at `path`.  Used by GraphCatalog.save so the
    nodes/edges/manifest triple commits as one snapshot."""
    path = os.path.abspath(path)
    staged = _stage_dir(path)
    os.makedirs(staged, exist_ok=True)
    populate(staged)
    _publish(path, staged)
    if gc:
        _gc(path)
    return path
