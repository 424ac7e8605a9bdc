"""Atomic write mode — the transactional-commit analog of the reference's
core/src/main/java/org/neo4j/gds/core/write/NativeNodePropertyExporter.java:
a failed write must leave the previous snapshot fully readable (VERDICT r2
next-round task 7).  Crash injection = raising inside the STAGE step, after
data has been partially/fully staged but before the pointer flip."""

import os

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph
from graph_data_science_spark.operators import modes
from graph_data_science_spark.sources import atomic
from graph_data_science_spark.sources.catalog import GraphCatalog


def _graph(spark, n):
    edges = [(i, (i + 1) % n) for i in range(n)]
    return LinkGraph.from_edges(spark, edges)


def test_atomic_overwrite_roundtrip(spark, tmp_path):
    p = str(tmp_path / "out")
    df1 = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
    atomic.atomic_parquet_overwrite(df1, p)
    assert os.path.islink(p)
    assert spark.read.parquet(p).count() == 10
    # second publish swaps the snapshot and GCs the first version dir
    df2 = spark.range(3).select(F.col("id"), (F.col("id") * 3).alias("v"))
    atomic.atomic_parquet_overwrite(df2, p)
    assert spark.read.parquet(p).count() == 3
    vroot = atomic.versions_root(p)
    assert len([d for d in os.listdir(vroot) if d.startswith("v_")]) == 1


def test_crash_between_stage_and_publish_keeps_old_snapshot(
    spark, tmp_path, monkeypatch
):
    p = str(tmp_path / "out")
    df1 = spark.range(10).select(F.col("id"))
    atomic.atomic_parquet_overwrite(df1, p)

    def boom(path, staged):
        raise RuntimeError("injected crash before commit")

    monkeypatch.setattr(atomic, "_publish", boom)
    with pytest.raises(RuntimeError, match="injected"):
        atomic.atomic_parquet_overwrite(spark.range(99).select(F.col("id")), p)
    monkeypatch.undo()
    # old snapshot still fully readable; orphaned staging dir is inert
    assert spark.read.parquet(p).count() == 10
    # the next successful publish supersedes + GCs the orphan
    atomic.atomic_parquet_overwrite(spark.range(5).select(F.col("id")), p)
    assert spark.read.parquet(p).count() == 5
    vroot = atomic.versions_root(p)
    assert len([d for d in os.listdir(vroot) if d.startswith("v_")]) == 1


def test_atomic_migrates_legacy_plain_dir(spark, tmp_path):
    """A pre-existing non-atomic parquet dir at the target path is migrated,
    then overwritten — old API outputs keep working."""
    p = str(tmp_path / "legacy")
    spark.range(7).write.parquet(p)
    assert not os.path.islink(p)
    atomic.atomic_parquet_overwrite(spark.range(4).select(F.col("id")), p)
    assert os.path.islink(p)
    assert spark.read.parquet(p).count() == 4


def test_catalog_save_is_atomic(spark, tmp_path, monkeypatch):
    cat = GraphCatalog(spark, str(tmp_path / "cat"))
    g1 = _graph(spark, 6)
    m1 = cat.save("g", g1)
    assert m1["node_count"] == 6
    assert cat.load("g").nodes.count() == 6

    # crash mid-save (after staging, before pointer flip): old snapshot holds
    def boom(path, staged):
        raise RuntimeError("injected crash before commit")

    monkeypatch.setattr(atomic, "_publish", boom)
    with pytest.raises(RuntimeError, match="injected"):
        cat.save("g", _graph(spark, 20))
    monkeypatch.undo()
    assert cat.exists("g")
    assert cat.load("g").nodes.count() == 6
    assert cat.load("g").edges.count() == 6

    # a clean save then fully replaces it; drop removes link + versions
    cat.save("g", _graph(spark, 3))
    assert cat.load("g").nodes.count() == 3
    assert cat.drop("g")
    assert not cat.exists("g")
    assert not os.path.lexists(os.path.join(str(tmp_path / "cat"), "g"))


def test_modes_write_is_atomic(spark, tmp_path):
    g = _graph(spark, 8)
    p = str(tmp_path / "wcc_out")
    path, meta = modes.run(g, "wcc", mode="write", write_path=p)
    assert path == p
    assert os.path.islink(p)
    out = spark.read.parquet(p)
    assert out.count() == 8
    # ring graph => single component
    assert out.select("component").distinct().count() == 1


def test_snapshot_history_and_time_travel(spark, tmp_path):
    from graph_data_science_spark.sources.atomic import (
        atomic_parquet_overwrite,
        read_snapshot,
        snapshot_history,
    )

    p = str(tmp_path / "snap")
    for n in (3, 5, 7):
        atomic_parquet_overwrite(spark.range(n), p, gc=False)
    hist = snapshot_history(p)
    assert len(hist) == 3
    assert [h["is_current"] for h in hist] == [False, False, True]
    assert (
        hist[0]["committed_at_ns"]
        <= hist[1]["committed_at_ns"]
        <= hist[2]["committed_at_ns"]
    )
    # time travel to each retained version
    assert read_snapshot(spark, p, hist[0]["version"]).count() == 3
    assert read_snapshot(spark, p, hist[1]["version"]).count() == 5
    assert read_snapshot(spark, p).count() == 7  # current

    # default gc expires predecessors but never the current snapshot
    atomic_parquet_overwrite(spark.range(9), p, gc=True)
    hist2 = snapshot_history(p)
    assert len(hist2) == 1 and hist2[0]["is_current"]
    assert read_snapshot(spark, p).count() == 9
    import pytest as _pt

    with _pt.raises(KeyError, match="expired by gc"):
        read_snapshot(spark, p, hist[0]["version"])


def test_uncommitted_stage_is_not_history(spark, tmp_path):
    """A version dir without the commit manifest (a crashed stage) must not
    appear in history."""
    import os

    from graph_data_science_spark.sources.atomic import (
        atomic_parquet_overwrite,
        snapshot_history,
        versions_root,
    )

    p = str(tmp_path / "snap2")
    atomic_parquet_overwrite(spark.range(4), p)
    os.makedirs(os.path.join(versions_root(p), "v_crashed_stage"))
    hist = snapshot_history(p)
    assert len(hist) == 1 and hist[0]["is_current"]


def test_crash_between_stamp_and_publish_is_not_history(
    spark, tmp_path, monkeypatch
):
    """ADVICE r4: a version dir that was stamped but never published (crash
    between _stamp and the os.replace commit) must NOT appear as committed
    history — commit membership comes from the post-publish log, not from
    the staged manifest."""
    p = str(tmp_path / "snapA")
    atomic.atomic_parquet_overwrite(spark.range(4), p, gc=False)

    def boom(path, staged):
        raise RuntimeError("injected crash after stamp, before commit")

    monkeypatch.setattr(atomic, "_publish", boom)
    with pytest.raises(RuntimeError, match="injected"):
        atomic.atomic_parquet_overwrite(spark.range(9), p, gc=False)
    monkeypatch.undo()
    hist = atomic.snapshot_history(p)
    assert len(hist) == 1 and hist[0]["is_current"]  # no phantom commit
    # the orphaned-but-stamped dir exists on disk yet is invisible
    vdirs = [
        d for d in os.listdir(atomic.versions_root(p)) if d.startswith("v_")
    ]
    assert len(vdirs) == 2


def test_torn_manifest_does_not_break_history(spark, tmp_path):
    """ADVICE r4: an unreadable _SNAPSHOT.json (crash mid-write by an old
    writer) must not raise out of snapshot_history — and if it belongs to
    the published current version, the pointer is proof of commit."""
    p = str(tmp_path / "snapB")
    atomic.atomic_parquet_overwrite(spark.range(3), p, gc=False)
    atomic.atomic_parquet_overwrite(spark.range(5), p, gc=False)
    hist = atomic.snapshot_history(p)
    assert len(hist) == 2
    # tear the CURRENT version's manifest: still committed (pointer proves it)
    cur = [h for h in hist if h["is_current"]][0]
    with open(os.path.join(cur["path"], "_SNAPSHOT.json"), "w") as fh:
        fh.write('{"version": "tor')  # torn mid-write
    hist2 = atomic.snapshot_history(p)
    assert [h["version"] for h in hist2] == [h["version"] for h in hist]
    assert hist2[-1]["is_current"]
    assert atomic.read_snapshot(spark, p, hist2[0]["version"]).count() == 3


def test_legacy_current_without_manifest_is_visible(spark, tmp_path):
    """ADVICE r4: a snapshot committed by a pre-history writer (no manifest,
    no commit log) must still surface as the current committed version."""
    p = str(tmp_path / "snapC")
    root = atomic.versions_root(p)
    os.makedirs(root)
    legacy = os.path.join(root, "v_legacyabc")
    spark.range(6).write.parquet(legacy)
    os.symlink(legacy, p)  # a pre-upgrade published pointer
    hist = atomic.snapshot_history(p)
    assert len(hist) == 1
    assert hist[0]["is_current"] and hist[0]["version"] == "v_legacyabc"
    assert atomic.read_snapshot(spark, p, "v_legacyabc").count() == 6
    # first post-upgrade commit starts the log; legacy current stays visible
    atomic.atomic_parquet_overwrite(spark.range(2), p, gc=False)
    hist2 = atomic.snapshot_history(p)
    assert [h["version"] for h in hist2][0] == "v_legacyabc"  # ordered first
    assert hist2[-1]["is_current"] and hist2[-1]["seq"] >= 1


def test_history_orders_by_monotonic_seq_not_wall_clock(spark, tmp_path):
    """ADVICE r4: ordering key is the commit log's monotonic seq; a clock
    step that scrambles committed_at_ns must not reorder history."""
    import json as _json

    p = str(tmp_path / "snapD")
    for n in (1, 2, 3):
        atomic.atomic_parquet_overwrite(spark.range(n), p, gc=False)
    hist = atomic.snapshot_history(p)
    assert [h["seq"] for h in hist] == [1, 2, 3]
    # simulate an NTP step: rewrite the log with scrambled timestamps
    logf = os.path.join(atomic.versions_root(p), "_COMMITS.jsonl")
    with open(logf) as fh:
        recs = [_json.loads(line) for line in fh]
    ts = [r["committed_at_ns"] for r in recs]
    for r, t in zip(recs, reversed(ts)):
        r["committed_at_ns"] = t
    with open(logf, "w") as fh:
        fh.writelines(_json.dumps(r) + "\n" for r in recs)
    hist2 = atomic.snapshot_history(p)
    assert [h["seq"] for h in hist2] == [1, 2, 3]  # unchanged order
    assert [h["version"] for h in hist2] == [h["version"] for h in hist]


def test_catalog_history_and_time_travel(spark, tmp_path):
    """Graph-level snapshot log: retain_history keeps predecessors, history()
    carries each version's manifest, load(name, version) time-travels."""
    cat = GraphCatalog(spark, str(tmp_path / "cat"))
    for n in (4, 6):
        cat.save("g", _graph(spark, n), retain_history=True)
    hist = cat.history("g")
    assert len(hist) == 2
    assert [h["is_current"] for h in hist] == [False, True]
    assert [h["manifest"]["node_count"] for h in hist] == [4, 6]
    old = cat.load("g", version=hist[0]["version"])
    assert old.nodes.count() == 4 and old.edges.count() == 4
    assert cat.load("g").nodes.count() == 6

    # default save (retain_history=False) expires predecessors
    cat.save("g", _graph(spark, 9))
    hist2 = cat.history("g")
    assert len(hist2) == 1 and hist2[0]["manifest"]["node_count"] == 9
    with pytest.raises(KeyError, match="expired by gc"):
        cat.load("g", version=hist[0]["version"])
