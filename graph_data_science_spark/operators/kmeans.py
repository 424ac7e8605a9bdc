"""KMeans over node property vectors (gds.kmeans.*).

Reference: algo/src/main/java/org/neo4j/gds/kmeans/Kmeans.java — Lloyd's
iterations over a node array property: assign each node to the nearest
centroid (Euclidean), recompute centroids as cluster means, stop when no
assignment changes or maxIterations.

Spark decomposition: centroids are tiny (k rows) -> broadcast; assignment is
a broadcast-joined argmin over k distance expressions (JVM higher-order
functions, no Python); centroid recompute is one groupBy over exploded
(cluster, dim, value) triples — a single shuffle bounded by k*dim groups.
Deterministic init: the k nodes with smallest ids seed the centroids
(the reference samples with a seeded RNG; any deterministic seed set
satisfies the contract — tests assert convergence + cluster quality, not a
specific seed sequence).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.plans.checkpoint import SuperstepCheckpointer


@dataclass
class KmeansConfig:
    k: int = 10
    max_iterations: int = 10
    checkpoint_path: Optional[str] = None


@dataclass
class KmeansResult:
    assignments: DataFrame  # id, cluster
    centroids: list  # list of k vectors
    ran_iterations: int
    did_converge: bool
    metrics: list = field(default_factory=list)


def kmeans(
    df: DataFrame,
    cfg: Optional[KmeansConfig] = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> KmeansResult:
    cfg = cfg or KmeansConfig()
    spark = df.sparkSession
    ckpt = SuperstepCheckpointer(spark, cfg.checkpoint_path)

    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).cache()

    # deterministic init: k smallest ids; fewer rows than k -> clamp k_eff
    init_rows = base.orderBy("id").limit(cfg.k).collect()
    centroids = [list(r["v"]) for r in init_rows]
    k_eff = len(centroids)

    def dist2(centroid: list):
        arr = F.array(*[F.lit(float(x)) for x in centroid])
        return F.aggregate(
            F.zip_with("v", arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    assign = None
    ran, converged = cfg.max_iterations, False
    t0 = time.time()
    from pyspark.sql import Observation

    for t in range(1, cfg.max_iterations + 1):
        # argmin over k broadcast centroid expressions (ties -> lower cluster)
        d_cols = [dist2(c).alias(f"d{j}") for j, c in enumerate(centroids)]
        scored = base.select("id", "v", *d_cols)
        best = F.lit(0)
        best_d = F.col("d0")
        for j in range(1, k_eff):
            is_better = F.col(f"d{j}") < best_d
            best = F.when(is_better, F.lit(j)).otherwise(best)
            best_d = F.when(is_better, F.col(f"d{j}")).otherwise(best_d)
        new_assign = scored.select(
            "id", "v", best.alias("cluster"), best_d.alias("d2")
        )
        # change-count rides the checkpoint write (observe) — one extra join
        # against the previous assignment, zero extra jobs
        if assign is not None:
            new_assign = new_assign.join(
                assign.select("id", F.col("cluster").alias("_old")), "id"
            )
            obs = Observation()
            new_assign = new_assign.observe(
                obs,
                F.sum((F.col("cluster") != F.col("_old")).cast("long")).alias("chg"),
                F.sum("d2").alias("sse"),
            ).select("id", "v", "cluster", "d2")
        else:
            obs = Observation()
            new_assign = new_assign.observe(obs, F.sum("d2").alias("sse")).select(
                "id", "v", "cluster", "d2"
            )
        new_assign = ckpt.checkpoint(new_assign, t)
        row = obs.get
        changed = int(row["chg"] or 0) if "chg" in row else -1
        assign = new_assign
        ckpt.log(
            t, algorithm="kmeans", changed=changed,
            sse=float(row["sse"] or 0.0), wall_s=time.time() - t0,
        )
        if changed == 0:
            ran, converged = t, True
            break
        if t == cfg.max_iterations:
            break  # keep `centroids` == the ones this assignment is argmin of

        # recompute centroids: explode to (cluster, dim, x), mean per cell
        exploded = assign.select(
            "cluster", F.posexplode("v").alias("dim", "x")
        )
        means = (
            exploded.groupBy("cluster", "dim")
            .agg(F.avg("x").alias("mu"))
            .groupBy("cluster")
            .agg(F.sort_array(F.collect_list(F.struct("dim", "mu"))).alias("cells"))
            .select("cluster", F.col("cells.mu").alias("centroid"))
            .collect()
        )
        by_cluster = {r["cluster"]: list(r["centroid"]) for r in means}
        centroids = [by_cluster.get(j, centroids[j]) for j in range(k_eff)]

    base.unpersist()
    return KmeansResult(
        assign.select("id", "cluster"), centroids, ran, converged, ckpt.metrics
    )
