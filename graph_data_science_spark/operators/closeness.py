"""Closeness + harmonic centrality via multi-source BFS.

Reference:
- Closeness (gds.beta.closeness.*, algo/src/main/java/org/neo4j/gds/beta/
  closeness/ClosenessCentrality.java): MSBFS from every node; at each visited
  node u, farness(u) += depth per reaching source and component(u) += 1
  (:110-111); centrality = componentSize / farness
  (DefaultCentralityComputer.java:25-31), Wasserman-Faust variant multiplies
  by componentSize / (nodeCount - 1) (WassermanFaustCentralityComputer.java),
  farness 0 -> 0.0.
- Harmonic (gds.alpha.closeness.harmonic.*, alpha/alpha-algo/.../harmonic/
  HarmonicCentrality.java): inverseFarness(u) = sum over reaching sources of
  1/depth (:59-60); score = inverseFarness / (nodeCount - 1) (:80).

Spark decomposition: GDS packs 64 BFS sources into a bitmask word (MSBFS);
the DataFrame analog is a (root, id) pair frontier expanded level-
synchronously with dedup + anti-join against the visited set — one join +
one distinct per hop, all sources advancing together in the same shuffle.
Pair volume is O(Σ reachable pairs); `sources` restricts the root set for
the sampled variant on large graphs (the aggregate is then a per-root-set
estimate, same formulas).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph, Orientation
from graph_data_science_spark.plans.checkpoint import SuperstepCheckpointer
from graph_data_science_spark.session import no_aqe


def hop_distances(
    graph: LinkGraph,
    orientation: Orientation = Orientation.NATURAL,
    sources: Optional[DataFrame] = None,
    max_depth: int = 100,
) -> DataFrame:
    """(root, id, dist) for every node `id` reachable from `root` in >= 1 hop."""
    spark = graph.nodes.sparkSession
    ckpt = SuperstepCheckpointer(spark, None)
    edges = graph.oriented_edges(orientation).select("src", "dst").distinct().cache()

    roots = (sources or graph.nodes).select(F.col("id").alias("root"))
    frontier = roots.select("root", F.col("root").alias("id"), F.lit(0).alias("dist"))
    visited = frontier
    depth = 0
    with no_aqe(spark):
        while depth < max_depth:
            depth += 1
            nxt = (
                frontier.join(edges, frontier["id"] == edges["src"])
                .select("root", F.col("dst").alias("id"))
                .distinct()
                .join(visited.select("root", "id"), ["root", "id"], "left_anti")
                .withColumn("dist", F.lit(depth))
            )
            nxt = ckpt.checkpoint(nxt, depth, name="frontier")
            if nxt.isEmpty():
                break
            visited = ckpt.checkpoint(
                visited.unionByName(nxt), depth, name="visited"
            )
            frontier = nxt
    edges.unpersist()
    return visited.where(F.col("dist") > 0)


def closeness_centrality(
    graph: LinkGraph,
    wasserman_faust: bool = False,
    orientation: Orientation = Orientation.NATURAL,
    sources: Optional[DataFrame] = None,
) -> DataFrame:
    """id, score — farness aggregated at the REACHED node over reaching
    sources (the MSBFS accumulation direction, ClosenessCentrality.java:110)."""
    n = graph.node_count()
    d = hop_distances(graph, orientation, sources)
    agg = d.groupBy("id").agg(
        F.sum("dist").alias("farness"), F.count(F.lit(1)).alias("comp_size")
    )
    score = F.col("comp_size") / F.col("farness")
    if wasserman_faust:
        score = score * (F.col("comp_size") / F.lit(float(n - 1)))
    return (
        graph.nodes.select("id")
        .join(agg, "id", "left")
        .select(
            "id",
            F.when(
                F.col("farness").isNull() | (F.col("farness") == 0), F.lit(0.0)
            )
            .otherwise(score)
            .alias("score"),
        )
    )


def harmonic_centrality(
    graph: LinkGraph,
    orientation: Orientation = Orientation.NATURAL,
    sources: Optional[DataFrame] = None,
) -> DataFrame:
    """id, score = (Σ 1/dist over reaching sources) / (nodeCount - 1)."""
    n = graph.node_count()
    d = hop_distances(graph, orientation, sources)
    agg = d.groupBy("id").agg(F.sum(F.lit(1.0) / F.col("dist")).alias("inv"))
    return (
        graph.nodes.select("id")
        .join(agg, "id", "left")
        .select(
            "id",
            (F.coalesce("inv", F.lit(0.0)) / F.lit(float(n - 1))).alias("score"),
        )
    )
