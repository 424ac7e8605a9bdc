"""Betweenness centrality — Brandes' algorithm with optional source sampling.

Reference: algo/src/main/java/org/neo4j/gds/betweenness/
BetweennessCentrality.java:42 — per (sampled) source s: forward BFS
accumulating shortest-path counts sigma, then a backward sweep by descending
BFS level accumulating dependencies
delta(v) = sum over successors w of (sigma_v / sigma_w) * (1 + delta_w);
bc(v) += delta(v) for v != s.  Source sampling (`SelectionStrategy`) trades
exactness for cost; with all nodes as sources the result is exact.

Spark decomposition (all sources advance together, MSBFS-style):
- forward: a (root, id) pair frontier; sigma(root, v) = sum of sigma over
  predecessor-frontier rows reaching v — one join + one groupBy per level.
- backward: iterate levels from deepest to 1; each step joins level-L nodes
  with their predecessors (edges reversed) and aggregates the dependency sum
  — again one join + one groupBy per level.
Pair volume is O(sum of reachable pairs); use `sources` to sample on large
graphs.  Directed semantics (NATURAL); run on an undirected LinkGraph view
for the undirected variant (each undirected edge projected both ways).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph, Orientation
from graph_data_science_spark.plans.checkpoint import SuperstepCheckpointer
from graph_data_science_spark.session import no_aqe

# All-sources exact mode materializes O(n * reachable) (root, id) pairs.
# Above this node count, callers must either pass `sources=` (the
# SelectionStrategy analog — see `select_sources_random_degree`) or opt in
# with `exact=True`.  Mirrors the reference's explicit samplingSize knob
# (algo/src/main/java/org/neo4j/gds/betweenness/SelectionStrategy.java).
EXACT_ALL_SOURCES_LIMIT = 16384


def guard_all_sources(graph: LinkGraph, sources, exact: bool, op_name: str):
    """Resolve the source set; refuse silent all-sources exact runs on large
    graphs (carried VERDICT item: the library default must not be a
    web-scale O(n^2) footgun just because the caller omitted an arg)."""
    if sources is not None:
        return sources
    n = graph.nodes.count()
    if n > EXACT_ALL_SOURCES_LIMIT and not exact:
        raise ValueError(
            f"{op_name}: exact all-sources mode on {n} nodes materializes "
            f"O(n*reachable) pairs. Pass sources= (e.g. "
            f"select_sources_random_degree(graph, k)) to sample, or force "
            f"with exact=True."
        )
    return graph.nodes


def select_sources_random_degree(
    graph: LinkGraph, k: int, seed: int = 42
) -> DataFrame:
    """Degree-weighted source sample without replacement — the
    RandomDegreeSelectionStrategy analog (SelectionStrategy.java RANDOM_DEGREE).
    Deterministic Efraimidis-Spirakis: key = -ln(u)/deg with u derived from
    md5(id:seed); the k smallest keys win."""
    deg = (
        graph.edges.select(F.col("src").alias("id"))
        .unionByName(graph.edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("_d"))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("id").cast("string"), F.lit(str(seed)))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / float(16**8 + 1)
    key = -F.log(u) / F.col("_d").cast("double")
    return (
        graph.nodes.select("id")
        .join(deg, "id")
        .withColumn("_key", key)
        .orderBy("_key", "id")
        .limit(k)
        .select("id")
    )


def betweenness_centrality(
    graph: LinkGraph,
    sources: Optional[DataFrame] = None,
    orientation: Orientation = Orientation.NATURAL,
    max_depth: int = 100,
    exact: bool = False,
) -> DataFrame:
    """id, score (unnormalized dependency sums, Brandes semantics)."""
    spark = graph.nodes.sparkSession
    ckpt = SuperstepCheckpointer(spark, None)
    edges = graph.oriented_edges(orientation).select("src", "dst").distinct().cache()

    roots = guard_all_sources(graph, sources, exact, "betweenness_centrality").select(
        F.col("id").alias("root")
    )
    # forward phase: levels[(root, id, level, sigma)]
    frontier = roots.select(
        "root", F.col("root").alias("id"), F.lit(0).alias("level"),
        F.lit(1.0).alias("sigma"),
    )
    visited = frontier
    depth = 0
    with no_aqe(spark):
        while depth < max_depth:
            depth += 1
            expanded = (
                frontier.join(edges, frontier["id"] == edges["src"])
                .groupBy("root", F.col("dst").alias("nid"))
                .agg(F.sum("sigma").alias("sigma"))
            )
            nxt = (
                expanded.join(
                    visited.select("root", F.col("id").alias("nid")),
                    ["root", "nid"],
                    "left_anti",
                )
                .select(
                    "root", F.col("nid").alias("id"), F.lit(depth).alias("level"),
                    "sigma",
                )
            )
            nxt = ckpt.checkpoint(nxt, depth, name="fwd")
            if nxt.isEmpty():
                break
            visited = ckpt.checkpoint(visited.unionByName(nxt), depth, name="vis")
            frontier = nxt

        levels = visited.cache()
        max_level = levels.agg(F.max("level")).collect()[0][0] or 0

        # backward phase: delta per (root, id), deepest level first.
        # Per-level dependency frames are checkpointed individually and only
        # UNIONED LAZILY at the end — the accumulator is never re-written per
        # level (previously acc was union-checkpointed every level, an
        # O(levels * pairs) rewrite).
        acc_parts: list[DataFrame] = []
        delta_next = None  # (root, id, delta) of level L+1
        for lvl in range(max_level, 0, -1):
            lvl_nodes = levels.where(F.col("level") == lvl).select(
                "root", "id", "sigma"
            )
            if delta_next is None:
                cur_delta = lvl_nodes.select(
                    "root", "id", "sigma", F.lit(0.0).alias("delta")
                )
            else:
                cur_delta = lvl_nodes.join(
                    delta_next, ["root", "id"], "left"
                ).select(
                    "root", "id", "sigma",
                    F.coalesce("delta", F.lit(0.0)).alias("delta"),
                )
            # push dependency to predecessors: pred p of w iff edge p->w and
            # level(p) = level(w) - 1; contribution = sigma_p/sigma_w * (1+delta_w)
            w_side = cur_delta.select(
                F.col("root"), F.col("id").alias("w"),
                F.col("sigma").alias("sigma_w"), F.col("delta").alias("delta_w"),
            )
            preds = levels.where(F.col("level") == lvl - 1).select(
                "root", F.col("id").alias("p"), F.col("sigma").alias("sigma_p")
            )
            contrib = (
                w_side.join(edges, w_side["w"] == edges["dst"])
                .join(
                    preds,
                    (w_side["root"] == preds["root"]) & (edges["src"] == preds["p"]),
                )
                .drop(preds["root"])
                .groupBy("root", "p")
                .agg(
                    F.sum(
                        (F.col("sigma_p") / F.col("sigma_w"))
                        * (F.lit(1.0) + F.col("delta_w"))
                    ).alias("delta")
                )
                .select("root", F.col("p").alias("id"), "delta")
            )
            delta_next = ckpt.checkpoint(contrib, lvl, name="delta")
            # dependencies of this level's nodes contribute to bc (v != root);
            # checkpointed once per level, unioned lazily below
            scored = cur_delta.where(F.col("id") != F.col("root")).select(
                "root", "id", F.col("delta").alias("score")
            )
            acc_parts.append(ckpt.checkpoint(scored, lvl, name=f"acc_l{lvl}"))

    edges.unpersist()
    levels.unpersist()
    if not acc_parts:
        return graph.nodes.select("id", F.lit(0.0).alias("score"))
    acc = acc_parts[0]
    for part in acc_parts[1:]:
        acc = acc.unionByName(part)
    bc = acc.groupBy("id").agg(F.sum("score").alias("score"))
    return (
        graph.nodes.select("id")
        .join(bc, "id", "left")
        .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    )
