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
    from pyspark.sql import Observation

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
            # improved-count rides the checkpoint write — one action per round
            obs = Observation()
            merged = merged.observe(
                obs, F.sum((F.col("distance") < F.col("old")).cast("long")).alias("imp")
            )
            merged = ckpt.checkpoint(merged, r)
            improved = int(obs.get["imp"] or 0)
            frontier = merged.where(F.col("distance") < F.col("old")).select("id", "distance")
            ckpt.log(r, algorithm="sssp_delta", improved=improved)
            dist = merged.select("id", "distance")
            if improved == 0:
                break
    edges.unpersist()
    return SsspResult(dist, rounds, ckpt.metrics)


@dataclass
class ShortestPathResult:
    """PathFindingResultBuilder output shape (algo/src/main/java/org/neo4j/
    gds/paths/dijkstra/Dijkstra.java:49, paths/PathResult.java): one row per
    reachable target with the full node sequence and per-hop cumulative costs.
    """

    paths: DataFrame  # source, target, total_cost, node_ids ARRAY, costs ARRAY
    distances: DataFrame  # id, distance
    rounds: int
    metrics: list = field(default_factory=list)


def shortest_paths(
    graph: LinkGraph,
    source: int,
    weighted: bool = True,
    max_rounds: int = 100,
    checkpoint_path: Optional[str] = None,
) -> ShortestPathResult:
    """Single-source shortest PATHS (distances + actual node sequences).

    The reference's Dijkstra/DeltaStepping track predecessors during
    relaxation (paths/delta/DeltaStepping.java:60); here predecessors are
    derived deterministically AFTER the distance fixpoint —
    pred(v) = min u such that dist(u) + w(u,v) == dist(v) — which makes the
    chosen tree independent of relaxation order (and SQL-replayable by the
    correctness oracle).  Paths are then rebuilt by pointer doubling:
    O(log max_path_len) join rounds, each concatenating resolved prefix
    segments — no sequential per-node chase.
    """
    spark = graph.nodes.sparkSession
    ckpt = SuperstepCheckpointer(spark, checkpoint_path)
    res = sssp_delta(graph, source, weighted=weighted, max_rounds=max_rounds,
                     checkpoint_path=checkpoint_path)
    dist = res.distances.where(F.col("distance") != float("inf"))

    w = F.col("weight") if weighted else F.lit(1.0)
    edges = graph.edges.select("src", "dst", w.alias("w"))
    du = dist.select(F.col("id").alias("src"), F.col("distance").alias("d_src"))
    dv = dist.select(F.col("id").alias("dst"), F.col("distance").alias("d_dst"))
    preds = (
        edges.join(du, "src")
        .join(dv, "dst")
        .where(F.col("d_src") + F.col("w") == F.col("d_dst"))
        .groupBy("dst")
        .agg(F.min("src").alias("pred"))
        .select(F.col("dst").alias("id"), "pred")
    )

    # pointer doubling over the predecessor forest: state(v) = (anc, seg)
    # where seg = path nodes from anc (exclusive) to v (inclusive), each
    # carrying its cumulative cost; anc NULL <=> seg starts at the source.
    state = (
        dist.join(preds, "id", "left")
        .select(
            "id",
            F.when(F.col("id") == int(source), F.lit(None).cast("long"))
            .otherwise(F.col("pred"))
            .alias("anc"),
            F.array(F.struct(F.col("id").alias("node"), F.col("distance").alias("cost"))).alias(
                "seg"
            ),
        )
    )
    state = ckpt.checkpoint(state, 0, name="paths")
    from pyspark.sql import Observation

    for r in range(1, 64):
        anc_map = state.select(
            F.col("id").alias("anc"), F.col("anc").alias("anc2"), F.col("seg").alias("seg2")
        )
        merged = state.join(anc_map, "anc", "left").select(
            "id",
            F.when(F.col("anc").isNull(), F.lit(None).cast("long"))
            .otherwise(F.col("anc2"))
            .alias("anc"),
            F.when(F.col("seg2").isNull(), F.col("seg"))
            .otherwise(F.concat("seg2", "seg"))
            .alias("seg"),
        )
        obs = Observation()
        merged = merged.observe(
            obs, F.sum(F.col("anc").isNotNull().cast("long")).alias("open")
        )
        state = ckpt.checkpoint(merged, r, name="paths")
        if int(obs.get["open"] or 0) == 0:
            break

    paths = state.select(
        F.lit(int(source)).alias("source"),
        F.col("id").alias("target"),
        F.element_at(F.col("seg"), F.size("seg")).getField("cost").alias("total_cost"),
        F.col("seg.node").alias("node_ids"),
        F.col("seg.cost").alias("costs"),
    )
    return ShortestPathResult(paths, dist, res.rounds, ckpt.metrics)
