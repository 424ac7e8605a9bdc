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

Snapshot history (the Iceberg snapshot-log analog): commit membership is
recorded in an append-only `_COMMITS.jsonl` log in the versions root,
written AFTER the pointer flip — so a crash anywhere before the publish
leaves no phantom history entry (a stamped-but-never-published version dir
is a crashed stage, not a commit).  Each log line carries a monotonically
increasing `seq`; history orders by it, keeping `committed_at_ns` as
informational metadata only (wall-clock steps can't reorder history).  The
per-version `_SNAPSHOT.json` manifest (hidden from Spark/DuckDB scans by
the leading underscore) remains as in-dir metadata and is written via
temp-file + `os.replace`, so a torn manifest cannot exist; unreadable
manifests from older writers are tolerated (skipped, or synthesized from
dir mtime when the version is the published current snapshot — the pointer
itself is proof of commit).  `snapshot_history(path)` lists committed
versions oldest-first and `read_snapshot(spark, path, version)` time-travels
to any retained one.  Writes with `gc=False` retain predecessors (the
expire-snapshots knob); the default GC keeps only the current version.

Legacy note: versions committed before the commit log existed are visible
while no log is present (manifest = commit, the old rule), and the first
post-upgrade commit ADOPTS them into the log (oldest first, plus a
manifest-less published pointer target — the pointer is proof of commit),
so pre-upgrade history survives durably.  After that point a stamped dir
absent from the log is exactly what it looks like: a crash between stamp
and publish, not history.
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
_COMMIT_LOG = "_COMMITS.jsonl"  # append-only, written post-publish


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
    """Per-version metadata manifest, written LAST in the staging step.
    Crash-safe: written to a temp name and `os.replace`d into place, so a
    reader never sees a torn manifest.  NOTE this is metadata only — commit
    membership is proven by the post-publish commit log (`_COMMITS.jsonl`),
    not by the manifest's existence (a crash between stamp and publish must
    not fabricate history)."""
    final = os.path.join(staged, _SNAPSHOT_MANIFEST)
    tmp = final + f".tmp_{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        json.dump(
            {
                "version": os.path.basename(staged),
                "committed_at_ns": time.time_ns(),
            },
            fh,
        )
    os.replace(tmp, final)


def _read_manifest(version_dir: str) -> dict | None:
    """The version dir's manifest, or None if absent/unreadable (torn
    manifests from pre-fix writers must not break history for the whole
    dataset)."""
    try:
        with open(os.path.join(version_dir, _SNAPSHOT_MANIFEST)) as fh:
            return json.load(fh)
    except (OSError, json.JSONDecodeError, ValueError):
        return None


def _read_commit_log(root: str) -> dict[str, dict]:
    """Committed versions by name from the append-only log.  Torn trailing
    lines (crash mid-append) are skipped — the corresponding publish may or
    may not have landed, and the pointer check in snapshot_history resolves
    the current one either way."""
    out: dict[str, dict] = {}
    try:
        with open(os.path.join(root, _COMMIT_LOG)) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                    out[rec["version"]] = rec
                except (json.JSONDecodeError, ValueError, KeyError, TypeError):
                    continue
    except OSError:
        pass
    return out


def _log_commit(root: str, staged: str) -> None:
    """Record commit membership AFTER the pointer flip.  seq is a monotonic
    commit sequence number (max existing + 1), the history ordering key —
    wall-clock `committed_at_ns` is informational only."""
    log = _read_commit_log(root)
    seq = 1 + max((rec.get("seq", 0) for rec in log.values()), default=0)
    line = json.dumps(
        {
            "seq": seq,
            "version": os.path.basename(staged),
            "committed_at_ns": time.time_ns(),
        }
    )
    with open(os.path.join(root, _COMMIT_LOG), "a") as fh:
        fh.write(line + "\n")


def _adopt_unlogged_current(root: str, path: str) -> None:
    """If the published pointer targets a version the commit log doesn't
    know (a snapshot committed before the log existed), adopt it into the
    log NOW, before it stops being current — the pointer is proof of commit,
    so this is retro-recording a fact, not fabricating one.  Keeps legacy
    history visible after upgrades."""
    log = _read_commit_log(root)
    have_log = os.path.isfile(os.path.join(root, _COMMIT_LOG))
    adopt: list[tuple[int, str]] = []  # (ts, version)
    if not have_log and os.path.isdir(root):
        # Upgrade moment: under the pre-log rule, manifest = commit, so every
        # manifest-bearing retained version was visible history.  Preserve
        # that across the upgrade by adopting them all, oldest first.
        for d in sorted(os.listdir(root)):
            full = os.path.join(root, d)
            if not (d.startswith("v_") and os.path.isdir(full)):
                continue
            manifest = _read_manifest(full)
            if manifest is not None:
                adopt.append((manifest.get("committed_at_ns", 0), d))
    if os.path.islink(path):
        cur = os.path.realpath(path)
        if os.path.isdir(cur) and os.path.dirname(cur) == root:
            name = os.path.basename(cur)
            if name not in log and name not in {v for _, v in adopt}:
                manifest = _read_manifest(cur)
                adopt.append(
                    (
                        manifest.get("committed_at_ns", 0)
                        if manifest is not None
                        else os.stat(cur).st_mtime_ns,
                        name,
                    )
                )
    if not adopt:
        return
    seq = 1 + max((rec.get("seq", 0) for rec in log.values()), default=0)
    with open(os.path.join(root, _COMMIT_LOG), "a") as fh:
        for ts, name in sorted(adopt):
            fh.write(
                json.dumps(
                    {"seq": seq, "version": name, "committed_at_ns": ts}
                )
                + "\n"
            )
            seq += 1


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
    _adopt_unlogged_current(versions_root(path), path)  # legacy durability
    _stamp(staged)
    _publish(path, staged)  # COMMIT (pointer flip)
    _log_commit(versions_root(path), staged)  # history membership, post-commit
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
    _adopt_unlogged_current(versions_root(path), path)
    _stamp(staged)
    _publish(path, staged)
    _log_commit(versions_root(path), staged)
    if gc:
        _gc(path)
    return path


# -- snapshot history / time travel (the Iceberg snapshot-log analog) --------

def snapshot_history(path: str) -> list[dict]:
    """Committed snapshots of `path`, oldest first: `{"version", "seq",
    "committed_at_ns", "path", "is_current"}` per retained version.  Only
    versions written with `gc=False` survive their successor (matching
    Iceberg's expire-snapshots semantics: GC prunes history, not the
    current snapshot).

    Commit membership, in precedence order:
      1. the version appears in the post-publish commit log (`seq` >= 1), or
      2. the version IS the published pointer target — the pointer itself is
         proof of commit (covers legacy snapshots written before the log
         existed, and torn/absent manifests), or
      3. no commit log exists at all AND the version carries a readable
         manifest (pure-legacy datasets keep their full retained history).
    Everything else — unstamped dirs, stamped-but-never-published dirs
    (crash between stamp and publish), torn non-current manifests — is an
    in-flight/crashed stage and is not history.

    Ordering: by the log's monotonic `seq` (pre-log/legacy entries sort
    first with seq=0, tie-broken by informational `committed_at_ns`)."""
    path = os.path.abspath(path)
    root = versions_root(path)
    if not os.path.isdir(root):
        return []
    log = _read_commit_log(root)
    have_log = os.path.isfile(os.path.join(root, _COMMIT_LOG))
    current = os.path.realpath(path)
    out = []
    for d in sorted(os.listdir(root)):
        full = os.path.join(root, d)
        if not (d.startswith("v_") and os.path.isdir(full)):
            continue
        is_current = os.path.realpath(full) == current
        manifest = _read_manifest(full)
        if d in log:
            seq = log[d].get("seq", 0)
            ts = log[d].get("committed_at_ns", 0)
        elif is_current or (not have_log and manifest is not None):
            seq = 0  # pre-log commit: predates every logged seq
            ts = (
                manifest.get("committed_at_ns", 0)
                if manifest is not None
                else os.stat(full).st_mtime_ns  # legacy current, no manifest
            )
        else:
            continue  # crashed stage / phantom — never published, not history
        out.append(
            {
                "version": d,
                "seq": seq,
                "committed_at_ns": ts,
                "path": full,
                "is_current": is_current,
            }
        )
    out.sort(key=lambda m: (m["seq"], m["committed_at_ns"]))
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
