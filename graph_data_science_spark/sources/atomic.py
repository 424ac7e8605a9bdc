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

Snapshot history (the Iceberg snapshot-log analog): every commit stamps a
`_SNAPSHOT.json` manifest (hidden from Spark/DuckDB scans by the leading
underscore) into its version dir; `snapshot_history(path)` lists committed
versions oldest-first and `read_snapshot(spark, path, version)` time-travels
to any retained one.  Writes with `gc=False` retain predecessors (the
expire-snapshots knob); the default GC keeps only the current version.
"""

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame

__all__ = [
    "atomic_parquet_overwrite",
    "versions_root",
    "snapshot_history",
    "read_snapshot",
]

_SNAPSHOT_MANIFEST = "_SNAPSHOT.json"  # leading "_": hidden from Spark scans


def versions_root(path: str) -> str:
    path = os.path.abspath(path)
    return os.path.join(
        os.path.dirname(path), f".{os.path.basename(path)}.versions"
    )


def _stage_dir(path: str) -> str:
    root = versions_root(path)
    os.makedirs(root, exist_ok=True)
    return os.path.join(root, f"v_{uuid.uuid4().hex}")


def _stamp(staged: str) -> None:
    """Snapshot manifest, written LAST in the staging step (commit metadata:
    a version without it is an uncommitted stage and invisible to history)."""
    with open(os.path.join(staged, _SNAPSHOT_MANIFEST), "w") as fh:
        json.dump(
            {
                "version": os.path.basename(staged),
                "committed_at_ns": time.time_ns(),
            },
            fh,
        )


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
    _stamp(staged)
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
    _stamp(staged)
    _publish(path, staged)
    if gc:
        _gc(path)
    return path


# -- snapshot history / time travel (the Iceberg snapshot-log analog) --------

def snapshot_history(path: str) -> list[dict]:
    """Committed snapshots of `path`, oldest first: `{"version",
    "committed_at_ns", "path", "is_current"}` per retained version.  Only
    versions written with `gc=False` survive their successor (matching
    Iceberg's expire-snapshots semantics: GC prunes history, not the
    current snapshot).  Version dirs without a commit manifest are
    in-flight/crashed stages and are not history."""
    path = os.path.abspath(path)
    root = versions_root(path)
    if not os.path.isdir(root):
        return []
    current = os.path.realpath(path)
    out = []
    for d in sorted(os.listdir(root)):
        full = os.path.join(root, d)
        mf = os.path.join(full, _SNAPSHOT_MANIFEST)
        if not (d.startswith("v_") and os.path.isfile(mf)):
            continue
        with open(mf) as fh:
            meta = json.load(fh)
        meta["path"] = full
        meta["is_current"] = os.path.realpath(full) == current
        out.append(meta)
    out.sort(key=lambda m: m["committed_at_ns"])
    return out


def read_snapshot(spark, path: str, version: str | None = None) -> DataFrame:
    """Read a parquet snapshot of `path` as of `version` (a `snapshot_history`
    version id); None = the current snapshot.  Raises KeyError for unknown
    or expired versions."""
    if version is None:
        return spark.read.parquet(os.path.abspath(path))
    for meta in snapshot_history(path):
        if meta["version"] == version:
            return spark.read.parquet(meta["path"])
    raise KeyError(
        f"snapshot {version!r} of {path} not found (expired by gc, or never "
        "committed — write with gc=False to retain history)"
    )
