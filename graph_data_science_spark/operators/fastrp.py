"""FastRP node embeddings (gds.fastRP.*).

Reference: algo/src/main/java/org/neo4j/gds/embeddings/fastrp/FastRP.java —
"Fast and Accurate Network Embeddings via Very Sparse Random Projection"
(Chen et al., 2019): seeded sparse random base vectors per node; iterative
neighbor averaging produces per-iteration embeddings; the final embedding is
the weighted sum of L2-normalized per-iteration embeddings
(`iterationWeights`, default [0.0, 1.0, 1.0]), embeddingDimension,
normalizationStrength s (degree^s scaling of base vectors).

Spark decomposition (all JVM-side array ops — no Python):
- base vectors: entry d of node v = {+sqrt(3), 0, -sqrt(3)} with prob
  {1/6, 2/3, 1/6}, decided by md5(v:d:seed) integer arithmetic —
  partition-stable, mirroring the reference's seeded per-node RNG
  (FastRP.java initRandomVectors), and exactly replayable in ANSI SQL
  (the correctness oracle recomputes the same base vectors in DuckDB).
- iteration contract matches FastRP.propagateEmbeddings: ONE propagation
  iteration per entry of `iteration_weights`; the L2-normalized base vector
  is only the iteration-0 INPUT and never enters the final sum; the final
  embedding is sum_t weights[t] * normalize(mean-over-neighbors^[t+1](base)).
- each iteration: mean over in/out neighbors (undirected: both) of the
  previous vector — one join + one groupBy with element-wise sums via
  posexplode (nodes*dim-bounded shuffle, map-side partial agg).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph
from graph_data_science_spark.session import cache_copartitioned
from graph_data_science_spark.plans.checkpoint import SuperstepCheckpointer

SQRT3 = math.sqrt(3.0)


@dataclass
class FastRPConfig:
    embedding_dimension: int = 64
    iteration_weights: tuple = (0.0, 1.0, 1.0)  # FastRPBaseConfig default
    normalization_strength: float = 0.0
    seed: int = 42
    checkpoint_path: Optional[str] = None


@dataclass
class FastRPResult:
    embeddings: DataFrame  # id, embedding array<double>
    ran_iterations: int
    metrics: list = field(default_factory=list)


def _l2_normalize(vec):
    norm = F.sqrt(
        F.aggregate(F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    safe = F.when(norm > 0, norm).otherwise(F.lit(1.0))
    return F.transform(vec, lambda x: x / safe)


def fastrp(graph: LinkGraph, cfg: Optional[FastRPConfig] = None) -> FastRPResult:
    cfg = cfg or FastRPConfig()
    spark = graph.nodes.sparkSession
    ckpt = SuperstepCheckpointer(spark, cfg.checkpoint_path)
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    dim = cfg.embedding_dimension

    e = graph.edges
    sym = (
        e.select("src", "dst")
        .unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = cache_copartitioned(sym, n_part, "dst")
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))

    # sparse seeded base vectors: P(+sqrt3)=1/6, P(0)=2/3, P(-sqrt3)=1/6,
    # scaled by deg^normalizationStrength.  The hash is md5-hex-prefix
    # arithmetic (not xxhash64) so the SQL correctness oracle replays it.
    dims = F.sequence(F.lit(0), F.lit(dim - 1))

    def base_entry(d):
        key = F.concat_ws(
            ":", F.col("id").cast("string"), d.cast("string"), F.lit(str(cfg.seed))
        )
        h = F.conv(F.substring(F.md5(key), 1, 6), 16, 10).cast("long") % 6
        return (
            F.when(h == 0, F.lit(SQRT3)).when(h == 1, F.lit(-SQRT3)).otherwise(F.lit(0.0))
        )

    nodes = graph.nodes.select("id").join(deg, "id", "left").select(
        "id", F.coalesce("deg", F.lit(0)).alias("deg")
    )
    scale = F.pow(
        F.when(F.col("deg") > 0, F.col("deg").cast("double")).otherwise(F.lit(1.0)),
        F.lit(cfg.normalization_strength),
    )
    state = nodes.select(
        "id",
        F.transform(dims, base_entry).alias("vec"),
        scale.alias("scale"),
    ).select("id", _l2_normalize(F.transform("vec", lambda x: x * F.col("scale"))).alias("vec"))
    state = ckpt.checkpoint(state, 0)

    # accumulate weighted sum of normalized per-iteration embeddings; the
    # base vector is the iteration-0 input only (FastRP.propagateEmbeddings
    # never includes it in the sum)
    acc = state.select("id", F.transform(dims, lambda d: F.lit(0.0)).alias("acc"))
    acc = ckpt.checkpoint(acc, 0, name="acc")

    t0 = time.time()
    n_iter = len(cfg.iteration_weights)
    for t in range(1, n_iter + 1):
        prev = state.select(F.col("id").alias("dst"), F.col("vec").alias("nbr_vec"))
        # mean over neighbors, element-wise via posexplode (shuffle bounded
        # by nodes*dim rows with map-side partial aggregation)
        summed = (
            sym.join(prev, "dst")
            .select("src", F.posexplode("nbr_vec").alias("dim", "x"))
            .groupBy("src", "dim")
            .agg(F.avg("x").alias("mu"))
            .groupBy("src")
            .agg(F.sort_array(F.collect_list(F.struct("dim", "mu"))).alias("cells"))
            .select(F.col("src").alias("id"), F.col("cells.mu").alias("raw"))
        )
        state = (
            graph.nodes.select("id")
            .join(summed, "id", "left")
            .select(
                "id",
                F.coalesce(
                    F.col("raw"), F.transform(dims, lambda d: F.lit(0.0))
                ).alias("raw"),
            )
            .select("id", _l2_normalize(F.col("raw")).alias("vec"))
        )
        state = ckpt.checkpoint(state, t)
        wgt = float(cfg.iteration_weights[t - 1])
        if wgt != 0.0:  # zero-weight iterations still propagate, never sum
            acc = (
                acc.join(state, "id")
                .select(
                    "id",
                    F.zip_with("acc", "vec", lambda a, v: a + v * F.lit(wgt)).alias("acc"),
                )
            )
            acc = ckpt.checkpoint(acc, t, name="acc")
        ckpt.log(t, algorithm="fastrp", wall_s=time.time() - t0)

    sym.unpersist()
    return FastRPResult(acc.select("id", F.col("acc").alias("embedding")), n_iter, ckpt.metrics)
