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
