"""HITS hubs & authorities (gds.alpha.hits).

Reference: alpha/alpha-proc/src/main/java/org/neo4j/gds/pregel/Hits.java —
phased Pregel: auth(v) = Σ hub(u) over in-edges, then global L2 normalization
via masterCompute; hub(u) = Σ auth(v) over out-edges, normalized likewise.

Spark decomposition: two join+sum aggregations per iteration.  The global L2
norms are 1-row aggregate subplans broadcast back into the main plan
(crossJoin of a broadcast single-row aggregate — the masterCompute analog),
so a full iteration (both phases, both normalizations, and the convergence
delta via observe) executes as ONE Spark action: a single checkpoint write
per iteration instead of the naive 3 collects + 3 checkpoints.
"""

import time
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph
from graph_data_science_spark.plans.checkpoint import SuperstepCheckpointer
from graph_data_science_spark.session import no_aqe


@dataclass
class HitsConfig:
    hits_iterations: int = 20
    tolerance: float = 1e-8  # L2 delta of auth vector between iterations
    checkpoint_path: Optional[str] = None


@dataclass
class HitsResult:
    scores: DataFrame  # id, auth, hub
    ran_iterations: int
    did_converge: bool
    metrics: list = field(default_factory=list)


def _scalar(df: DataFrame, col, name: str) -> DataFrame:
    """1-row DataFrame holding a global aggregate, for broadcast crossJoin."""
    return F.broadcast(df.agg(col.alias(name)))


def hits(graph: LinkGraph, cfg: Optional[HitsConfig] = None) -> HitsResult:
    cfg = cfg or HitsConfig()
    spark = graph.nodes.sparkSession
    ckpt = SuperstepCheckpointer(spark, cfg.checkpoint_path)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))

    from graph_data_science_spark.plans.estimate import cost_report

    ckpt.log(0, estimate=cost_report("hits", graph.nodes, graph.edges, cfg.hits_iterations, state_cols=3))

    edges = graph.edges.select("src", "dst").distinct().repartition(n_part, "src").cache()
    state = graph.nodes.select("id", F.lit(1.0).alias("auth"), F.lit(1.0).alias("hub"))
    state = ckpt.checkpoint(state, 0)

    ran, converged = cfg.hits_iterations, False
    t0 = time.time()
    with no_aqe(spark):
        for t in range(1, cfg.hits_iterations + 1):
            # auth phase: auth(v) = Σ hub(u) for u->v, then L2 normalize
            hubs = state.select(F.col("id").alias("src"), "hub")
            auth_raw = (
                edges.join(hubs, "src").groupBy("dst").agg(F.sum("hub").alias("auth_raw"))
            )
            s1 = state.join(auth_raw, state["id"] == auth_raw["dst"], "left").select(
                state["id"],
                F.coalesce("auth_raw", F.lit(0.0)).alias("auth_new"),
                F.col("auth").alias("auth_prev"),
                "hub",
            )
            na = _scalar(s1, F.sqrt(F.sum(F.col("auth_new") ** 2)), "na")
            s1n = s1.crossJoin(na).select(
                "id",
                (F.col("auth_new") / F.when(F.col("na") > 0, F.col("na")).otherwise(1.0)).alias(
                    "auth_n"
                ),
                "auth_prev",
                "hub",
            )

            # hub phase: hub(u) = Σ auth(v) for u->v, then L2 normalize
            auths = s1n.select(F.col("id").alias("dst"), F.col("auth_n"))
            hub_raw = (
                edges.join(auths, "dst").groupBy("src").agg(F.sum("auth_n").alias("hub_raw"))
            )
            s2 = s1n.join(hub_raw, s1n["id"] == hub_raw["src"], "left").select(
                s1n["id"],
                F.col("auth_n").alias("auth"),
                "auth_prev",
                F.coalesce("hub_raw", F.lit(0.0)).alias("hub_new"),
            )
            nh = _scalar(s2, F.sqrt(F.sum(F.col("hub_new") ** 2)), "nh")
            final = s2.crossJoin(nh).select(
                "id",
                "auth",
                "auth_prev",
                (F.col("hub_new") / F.when(F.col("nh") > 0, F.col("nh")).otherwise(1.0)).alias(
                    "hub"
                ),
            )

            # convergence delta rides the checkpoint write — one action total
            obs = Observation()
            observed = final.observe(
                obs, F.sqrt(F.sum((F.col("auth") - F.col("auth_prev")) ** 2)).alias("delta")
            ).select("id", "auth", "hub")
            state = ckpt.checkpoint(observed, t)
            delta = float(obs.get["delta"] or 0.0)
            ckpt.log(t, algorithm="hits", l2_delta=delta, wall_s=time.time() - t0)
            if delta <= cfg.tolerance:
                ran, converged = t, True
                break

    edges.unpersist()
    return HitsResult(state.select("id", "auth", "hub"), ran, converged, ckpt.metrics)
