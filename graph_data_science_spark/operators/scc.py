"""Strongly connected components (gds.alpha.scc.*).

Reference semantics: alpha/alpha-algo/src/main/java/org/neo4j/gds/impl/scc/
SccAlgorithm.java — every node is assigned the id of its strongly connected
component; the reference uses a sequential iterative Tarjan variant, which
has no scalable Spark analog.  This implementation uses the standard
distributed decomposition (coloring / forward-backward, cf. Orzan 2004 and
the FW-BW-Trim literature cited in PAPERS.md):

repeat until no active nodes:
  1. TRIM: iteratively peel nodes with in-degree 0 or out-degree 0 within the
     active subgraph — each is a singleton SCC (kills the long tails of web
     graphs cheaply).
  2. COLOR: propagate max node id forward to a fixpoint;
     color(v) = max id that reaches v.  Each color class c contains the
     complete SCC of node c (and maybe more).
  3. BACKWARD: BFS from each color root c along REVERSED edges restricted to
     same-color nodes; the reached set IS the SCC of c (mutual reachability:
     forward via color, backward via the BFS).  All roots run batched in one
     (root, id) pair frontier.
  4. Remove found SCCs from the active set; repeat.

Every phase is joins + groupBy aggregations with parquet-checkpointed state;
convergence counts ride the checkpoint writes (observe) — no extra jobs.
Output component id = MIN member id (matching WCC's union-by-min convention
and the SQL oracle's mutual-reachability definition).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph
from graph_data_science_spark.plans.checkpoint import SuperstepCheckpointer
from graph_data_science_spark.session import no_aqe


@dataclass
class SccResult:
    components: DataFrame  # id, comp (min member id of the SCC)
    outer_rounds: int
    metrics: list = field(default_factory=list)


def _observe_count(df: DataFrame, col, ckpt: SuperstepCheckpointer, step: int, name: str):
    obs = Observation()
    out = ckpt.checkpoint(df.observe(obs, F.sum(col.cast("long")).alias("c")), step, name=name)
    return out, int(obs.get["c"] or 0)


def scc(
    graph: LinkGraph,
    max_outer_rounds: int = 50,
    checkpoint_path: Optional[str] = None,
) -> SccResult:
    spark = graph.nodes.sparkSession
    ckpt = SuperstepCheckpointer(spark, checkpoint_path)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    all_edges = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(n_part, "src")
        .cache()
    )
    active = graph.nodes.select("id")
    active = ckpt.checkpoint(active, 0, name="active")
    assigned_parts: list = []  # per-phase (id, comp) frames, unioned lazily

    t0 = time.time()
    outer = 0
    with no_aqe(spark):
        while outer < max_outer_rounds:
            outer += 1

            # -- 1. trim singleton SCCs (no in- or no out-edge in the active
            # subgraph), iterated to a fixpoint.  ONE checkpoint per round:
            # keep/trimmed both derive lazily from the same materialized
            # `marked` frame (unique name per round so lazily-referenced
            # trimmed parts are never evicted), and both counts ride the
            # write via observe.
            trim_round = 0
            n_active = None
            while True:
                trim_round += 1
                e = (
                    all_edges.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
                    .join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
                )
                srcs = e.select(F.col("src").alias("id")).distinct().withColumn("_s", F.lit(1))
                dsts = e.select(F.col("dst").alias("id")).distinct().withColumn("_d", F.lit(1))
                marked = (
                    active.join(srcs, "id", "left")
                    .join(dsts, "id", "left")
                    .select(
                        "id",
                        (F.col("_s").isNotNull() & F.col("_d").isNotNull()).alias("_keep"),
                    )
                )
                obs = Observation()
                marked = marked.observe(
                    obs,
                    F.sum((~F.col("_keep")).cast("long")).alias("trimmed"),
                    F.sum(F.col("_keep").cast("long")).alias("kept"),
                )
                marked = ckpt.checkpoint(
                    marked, outer * 100 + trim_round, name=f"trim_{outer}_{trim_round}"
                )
                row = obs.get
                n_trim, n_active = int(row["trimmed"] or 0), int(row["kept"] or 0)
                active = marked.where(F.col("_keep")).select("id")
                if n_trim == 0:
                    break
                assigned_parts.append(
                    marked.where(~F.col("_keep")).select("id", F.col("id").alias("comp"))
                )
            ckpt.log(outer, algorithm="scc_trim", rounds=trim_round, wall_s=time.time() - t0)

            if n_active == 0:
                break

            edges = (
                all_edges.join(active.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(active.withColumnRenamed("id", "dst"), "dst", "left_semi")
            )
            edges = ckpt.checkpoint(edges, outer, name="edges")

            # -- 2. color: forward max-id propagation to fixpoint -----------
            color = active.select("id", F.col("id").alias("color"))
            color = ckpt.checkpoint(color, outer * 100, name="color")
            it = 0
            while True:
                it += 1
                cand = (
                    color.join(edges, color["id"] == edges["src"])
                    .groupBy("dst")
                    .agg(F.max("color").alias("nbr_max"))
                )
                merged = color.join(cand, color["id"] == cand["dst"], "left").select(
                    color["id"],
                    F.greatest(
                        F.col("color"), F.coalesce("nbr_max", F.col("color"))
                    ).alias("color"),
                    (F.coalesce("nbr_max", F.col("color")) > F.col("color")).alias("_chg"),
                )
                obs = Observation()
                merged = merged.observe(obs, F.sum(F.col("_chg").cast("long")).alias("c"))
                color = ckpt.checkpoint(
                    merged.select("id", "color"), outer * 100 + it, name="color"
                )
                if int(obs.get["c"] or 0) == 0:
                    break
            ckpt.log(outer, algorithm="scc_color", rounds=it, wall_s=time.time() - t0)

            # -- 3. backward BFS from color roots inside each color class ---
            # (root, id) pair frontier over reversed same-color edges
            rev = (
                edges.join(
                    color.select(F.col("id").alias("src"), F.col("color").alias("c_src")), "src"
                )
                .join(
                    color.select(F.col("id").alias("dst"), F.col("color").alias("c_dst")), "dst"
                )
                .where(F.col("c_src") == F.col("c_dst"))
                .select(F.col("dst").alias("rsrc"), F.col("src").alias("rdst"))
            )
            rev = ckpt.checkpoint(rev, outer, name="rev")
            member = color.where(F.col("id") == F.col("color")).select(
                F.col("color").alias("root"), F.col("id")
            )
            member = ckpt.checkpoint(member, outer * 100, name="member")
            frontier = member
            it = 0
            while True:
                it += 1
                nxt = (
                    frontier.join(rev, frontier["id"] == rev["rsrc"])
                    .select("root", F.col("rdst").alias("id"))
                    .distinct()
                    .join(member, ["root", "id"], "left_anti")
                )
                # only expand within the same color class
                nxt = nxt.join(
                    color.withColumnRenamed("id", "id").withColumnRenamed("color", "root"),
                    ["id", "root"],
                    "left_semi",
                )
                obs = Observation()
                nxt = nxt.observe(obs, F.count(F.lit(1)).alias("c"))
                nxt = ckpt.checkpoint(nxt, outer * 100 + it, name="bfs")
                if int(obs.get["c"] or 0) == 0:
                    break
                member = ckpt.checkpoint(
                    member.unionByName(nxt), outer * 100 + it, name="member"
                )
                frontier = nxt
            ckpt.log(outer, algorithm="scc_backward", rounds=it, wall_s=time.time() - t0)

            # -- 4. extract SCCs, emit comp = min member id -----------------
            comp_min = member.groupBy("root").agg(F.min("id").alias("comp"))
            found = member.join(comp_min, "root").select("id", "comp")
            found = ckpt.checkpoint(found, outer, name=f"found_{outer}")
            assigned_parts.append(found)
            active = active.join(found.select("id"), "id", "left_anti")
            active = ckpt.checkpoint(active, outer * 100 + 99, name="active")

    all_edges.unpersist()
    if not assigned_parts:
        return SccResult(
            graph.nodes.select("id", F.col("id").alias("comp")), outer, ckpt.metrics
        )
    comps = assigned_parts[0]
    for part in assigned_parts[1:]:
        comps = comps.unionByName(part)
    return SccResult(comps, outer, ckpt.metrics)
