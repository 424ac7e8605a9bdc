"""GraphCatalog — the GraphStoreCatalog analog.

Reference: core/src/main/java/org/neo4j/gds/core/loading/GraphStoreCatalog.java
keeps named projected graphs in a process-global map (get :46 / set :137 /
exists :161 / drop).  Our unit of persistence is a *namespace of tables*
(nodes, edges + a manifest) under a base path — parquet here; on a cluster
the writer is an Iceberg catalog and `save` is an atomic snapshot commit.

Also covers gds.beta.graph.export.csv / CSV re-import (csv/.../
GraphStoreToFileExporter.java) via `export_csv` / `import_csv`.
"""

import json
import os
import shutil
import time

from pyspark.sql import SparkSession

from graph_data_science_spark.operators.graph import LinkGraph


class GraphCatalog:
    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base_path = base_path
        os.makedirs(base_path, exist_ok=True)

    def _ns(self, name: str) -> str:
        return os.path.join(self.base_path, name)

    # -- GraphStoreCatalog.set ------------------------------------------------
    def save(self, name: str, graph: LinkGraph, retain_history: bool = False) -> dict:
        """Atomic snapshot commit: nodes + edges + manifest are staged into a
        fresh version dir and published with one rename (sources/atomic.py),
        so a crash mid-save leaves the previous snapshot readable — the
        NativeNodePropertyExporter transactional-write analog.

        ``retain_history=True`` keeps predecessor snapshots (Iceberg
        expire-snapshots semantics: GC is opt-out per save) so `history()`
        lists them and `load(name, version=...)` time-travels."""
        from graph_data_science_spark.sources.atomic import atomic_publish_dir

        ns = self._ns(name)
        manifest = {
            "name": name,
            "node_count": graph.node_count(),
            "relationship_count": graph.relationship_count(),
            "node_columns": graph.nodes.columns,
            "edge_columns": graph.edges.columns,
            "created_at": time.time(),
        }

        def populate(staged: str) -> None:
            graph.nodes.write.mode("overwrite").parquet(os.path.join(staged, "nodes"))
            graph.edges.write.mode("overwrite").parquet(os.path.join(staged, "edges"))
            with open(os.path.join(staged, "manifest.json"), "w") as f:
                json.dump(manifest, f)

        atomic_publish_dir(ns, populate, gc=not retain_history)
        return manifest

    # -- GraphStoreCatalog.get ------------------------------------------------
    def load(self, name: str, version: str | None = None) -> LinkGraph:
        """Load the current snapshot of `name`, or (time travel) any retained
        `version` from `history()`."""
        ns = self._ns(name)
        if version is not None:
            ns = self._version_path(name, version)
        nodes = self.spark.read.parquet(os.path.join(ns, "nodes"))
        edges = self.spark.read.parquet(os.path.join(ns, "edges"))
        return LinkGraph(nodes=nodes, edges=edges)

    def _version_path(self, name: str, version: str) -> str:
        from graph_data_science_spark.sources.atomic import snapshot_history

        for meta in snapshot_history(self._ns(name)):
            if meta["version"] == version:
                return meta["path"]
        raise KeyError(
            f"graph {name!r} has no retained snapshot {version!r} (expired by "
            "gc, or never committed — save with retain_history=True)"
        )

    def history(self, name: str) -> list[dict]:
        """Committed snapshots of graph `name`, oldest first — each entry is
        the atomic-writer snapshot record plus that version's manifest (the
        Iceberg snapshot-log analog)."""
        from graph_data_science_spark.sources.atomic import snapshot_history

        out = []
        for meta in snapshot_history(self._ns(name)):
            mf = os.path.join(meta["path"], "manifest.json")
            if os.path.isfile(mf):
                with open(mf) as f:
                    meta = {**meta, "manifest": json.load(f)}
            out.append(meta)
        return out

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._ns(name), "manifest.json"))

    def list(self) -> list[dict]:
        out = []
        for d in sorted(os.listdir(self.base_path)):
            mf = os.path.join(self.base_path, d, "manifest.json")
            if os.path.exists(mf):
                with open(mf) as f:
                    out.append(json.load(f))
        return out

    def drop(self, name: str) -> bool:
        ns = self._ns(name)
        if not os.path.lexists(ns):
            return False
        if os.path.islink(ns):
            from graph_data_science_spark.sources.atomic import versions_root

            os.unlink(ns)
            shutil.rmtree(versions_root(ns), ignore_errors=True)
        else:  # legacy non-atomic namespace
            shutil.rmtree(ns)
        return True

    # -- export/import (gds.beta.graph.export.csv analog) ----------------------
    def export_csv(self, name: str, out_path: str) -> None:
        g = self.load(name)
        g.nodes.write.mode("overwrite").option("header", True).csv(os.path.join(out_path, "nodes"))
        g.edges.write.mode("overwrite").option("header", True).csv(os.path.join(out_path, "edges"))

    def import_csv(self, name: str, in_path: str) -> LinkGraph:
        from pyspark.sql import functions as F

        nodes = (
            self.spark.read.option("header", True)
            .csv(os.path.join(in_path, "nodes"))
            .withColumn("id", F.col("id").cast("long"))
        )
        edges = (
            self.spark.read.option("header", True)
            .csv(os.path.join(in_path, "edges"))
            .select(
                F.col("src").cast("long"),
                F.col("dst").cast("long"),
                F.col("weight").cast("double"),
            )
        )
        g = LinkGraph(nodes=nodes, edges=edges)
        self.save(name, g)
        return g
