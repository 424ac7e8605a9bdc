"""Bucketed graph storage: shuffle-free src-keyed access at any scale.

The reference keeps its adjacency in a compressed CSR keyed by source node
(core/src/main/java/org/neo4j/gds/core/loading/CSRGraphStore.java) so every
per-source operation is a local array walk.  The Spark-first analog of that
physical layout is a BUCKETED table: `bucketBy(n, "src").sortBy("src",
"dst")` persists the edge list hash-partitioned AND sorted by source, and
Catalyst then treats every scan of it as already exchanged —

  * `groupBy("src")` (degrees, out-shares) runs with ZERO exchange;
  * `probe.join(edges, id == src)` shuffles ONLY the probe side into the
    bucket layout (verified in tests: 1 Exchange vs 2 unbucketed);
  * every PageRank/WCC/LP superstep's state-edges join therefore moves the
    per-superstep delta rows, never the edge table.

That is the 100-TB contract: the 100-TB side of every superstep join is
written once and never reshuffled, exactly like the reference's CSR is built
once per projection.  On a cluster the same tables live in the Hive/Iceberg
metastore; bucket count should be sized so one bucket's edges fit an
executor's shuffle memory (edges / buckets ~ 128-512 MB).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph, Orientation

__all__ = ["save_bucketed", "load_bucketed", "drop_bucketed", "bucketed_tables"]


def bucketed_tables(name: str) -> tuple[str, str]:
    return f"{name}_edges_b", f"{name}_nodes_b"


def save_bucketed(graph: LinkGraph, name: str, buckets: int = 32) -> dict:
    """Persist the graph as bucketed catalog tables; returns a manifest."""
    et, nt = bucketed_tables(name)
    edges = graph.edges
    if "weight" not in edges.columns:
        edges = edges.withColumn("weight", F.lit(1.0))
    (
        edges.select("src", "dst", "weight")
        .write.bucketBy(buckets, "src")
        .sortBy("src", "dst")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(et)
    )
    graph.nodes.write.mode("overwrite").format("parquet").saveAsTable(nt)
    return {"edges_table": et, "nodes_table": nt, "buckets": buckets}


def load_bucketed(spark: SparkSession, name: str) -> LinkGraph:
    """Load a graph whose edge scans carry the bucket distribution."""
    et, nt = bucketed_tables(name)
    return LinkGraph(
        nodes=spark.table(nt),
        edges=spark.table(et),
        orientation=Orientation.NATURAL,
    )


def drop_bucketed(spark: SparkSession, name: str) -> None:
    for t in bucketed_tables(name):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
