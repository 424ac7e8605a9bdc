"""Path / traversal operators with Spark-friendly decompositions.

- collapse_path (gds.alpha.collapsePath.mutate,
  alpha/alpha-algo/.../walking/CollapsePath.java): contract A-b-C two-hop
  paths into direct A->C edges — a single self-join.
- bfs (gds.bfs.*, algo/.../paths/traverse/BFS.java): level-synchronous
  frontier expansion via semi-joins; returns hop distance per reached node.
- sssp_delta (gds.allShortestPaths.delta.*,
  algo/.../paths/delta/DeltaStepping.java): parallel SSSP by iterative
  bucket relaxation — each round relaxes the active frontier through a join +
  groupBy(min) (Spark's partial agg is the bucket combine); converges when no
  distance improves.  Dijkstra/A*/Yens are sequential-PQ algorithms with no
  efficient Spark analog (SURVEY.md §2.4) — delta-relaxation is the
  scale-out replacement and returns identical distances.
"""

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph, Orientation
from graph_data_science_spark.plans.checkpoint import SuperstepCheckpointer
from graph_data_science_spark.session import no_aqe


def collapse_path(graph: LinkGraph, other: Optional[LinkGraph] = None) -> DataFrame:
    """Distinct A->C pairs such that A->b and b->C exist (A != C)."""
    e1 = graph.edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = (other or graph).edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    return (
        e1.join(e2, "b")
        .where(F.col("a") != F.col("c"))
        .select(F.col("a").alias("src"), F.col("c").alias("dst"))
        .distinct()
    )


def bfs(
    graph: LinkGraph,
    source: int,
    max_depth: Optional[int] = None,
    orientation: Orientation = Orientation.NATURAL,
) -> DataFrame:
    """id, hops for every node reachable from source (source included, 0)."""
    spark = graph.nodes.sparkSession
    ckpt = SuperstepCheckpointer(spark, None)
    edges = graph.oriented_edges(orientation).select("src", "dst").distinct().cache()
    visited = spark.createDataFrame([(int(source), 0)], "id long, hops int")
    frontier = visited
    depth = 0
    with no_aqe(spark):
        while True:
            depth += 1
            if max_depth is not None and depth > max_depth:
                break
            nxt = (
                frontier.join(edges, frontier["id"] == edges["src"])
                .select(F.col("dst").alias("id"))
                .distinct()
                .join(visited.select("id"), "id", "left_anti")
                .withColumn("hops", F.lit(depth))
            )
            # parquet-backed checkpoint: truncates lineage AND resets plan stats
            # (localCheckpoint preserves inflated sizeInBytes — see plans/checkpoint.py)
            nxt = ckpt.checkpoint(nxt, depth, name="frontier")
            if nxt.isEmpty():
                break
            visited = ckpt.checkpoint(visited.unionByName(nxt), depth, name="visited")
            frontier = nxt
    edges.unpersist()
    return visited


@dataclass
class SsspResult:
    distances: DataFrame  # id, distance (double); unreachable nodes omitted
    rounds: int
    metrics: list = field(default_factory=list)


def sssp_delta(
    graph: LinkGraph,
    source: int,
    weighted: bool = True,
    max_rounds: int = 100,
    checkpoint_path: Optional[str] = None,
) -> SsspResult:
    spark = graph.nodes.sparkSession
    ckpt = SuperstepCheckpointer(spark, checkpoint_path)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    w = F.col("weight") if weighted else F.lit(1.0)
    edges = (
        graph.edges.select("src", "dst", w.alias("w")).repartition(n_part, "src").cache()
    )

    dist = spark.createDataFrame([(int(source), 0.0)], "id long, distance double")
    frontier = dist
    rounds = 0
    with no_aqe(spark):
        for r in range(1, max_rounds + 1):
            rounds = r
            cand = (
                frontier.join(edges, frontier["id"] == edges["src"])
                .groupBy("dst")
                .agg(F.min(F.col("distance") + F.col("w")).alias("nd"))
            )
            merged = dist.join(cand, dist["id"] == cand["dst"], "full").select(
                F.coalesce(dist["id"], cand["dst"]).alias("id"),
                F.coalesce("distance", F.lit(float("inf"))).alias("old"),
                F.least(
                    F.coalesce("distance", F.lit(float("inf"))),
                    F.coalesce("nd", F.lit(float("inf"))),
                ).alias("distance"),
            )
            merged = ckpt.checkpoint(merged, r)
            frontier = merged.where(F.col("distance") < F.col("old")).select("id", "distance")
            improved = frontier.count()
            ckpt.log(r, algorithm="sssp_delta", improved=improved)
            dist = merged.select("id", "distance")
            if improved == 0:
                break
    edges.unpersist()
    return SsspResult(dist, rounds, ckpt.metrics)
