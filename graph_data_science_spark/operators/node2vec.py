"""node2vec embeddings (gds.beta.node2vec.*).

Reference: algo/src/main/java/org/neo4j/gds/embeddings/node2vec/
Node2Vec.java:40 — p/q-biased second-order random walks
(Node2VecRandomWalk / returnFactor, inOutFactor) followed by skip-gram
negative-sampling training (Node2VecModel.java).

Spark decomposition:
- biased walks: the walk frontier carries (cur, prev); each step joins the
  adjacency-array DF twice (neighbors of cur, neighbors of prev) and samples
  the next hop from the unnormalized weight vector
  w(x) = 1/p if x == prev, 1 if x in N(prev), 1/q otherwise
  — evaluated entirely with JVM higher-order array functions (zip_with +
  aggregate cumulative-sum sampling), seeded md5-arithmetic randomness, so
  walks are deterministic and partition-stable.
- training: Spark ML `Word2Vec` (skip-gram with hierarchical sampling) over
  the walk corpus — the distributed SGNS analog.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph
from graph_data_science_spark.plans.checkpoint import SuperstepCheckpointer


@dataclass
class Node2VecConfig:
    walks_per_node: int = 10
    walk_length: int = 80
    return_factor: float = 1.0  # p — likelihood of returning to prev
    in_out_factor: float = 1.0  # q — BFS (<1) vs DFS (>1) bias
    embedding_dimension: int = 128
    window_size: int = 10
    iterations: int = 1
    min_count: int = 0
    seed: int = 42
    checkpoint_path: Optional[str] = None


@dataclass
class Node2VecResult:
    embeddings: DataFrame  # id, embedding array<float>
    walks: DataFrame  # walk_id, start, path
    metrics: list = field(default_factory=list)


def _rnd6(*cols) -> F.Column:
    """Deterministic uniform in [0,1) from md5-hex-prefix arithmetic."""
    key = F.concat_ws(":", *[c.cast("string") for c in cols])
    return F.conv(F.substring(F.md5(key), 1, 6), 16, 10).cast("double") / float(16**6)


def biased_random_walks(
    graph: LinkGraph, cfg: Optional[Node2VecConfig] = None
) -> DataFrame:
    """walk_id, start, path — p/q-biased second-order walks."""
    cfg = cfg or Node2VecConfig()
    spark = graph.nodes.sparkSession
    ckpt = SuperstepCheckpointer(spark, cfg.checkpoint_path)

    adj = (
        graph.edges.select("src", "dst")
        .distinct()
        .groupBy("src")
        .agg(F.sort_array(F.collect_list("dst")).alias("nbrs"))
        .cache()
    )

    walks = graph.nodes.select("id").crossJoin(
        spark.range(cfg.walks_per_node).select(F.col("id").alias("walk_seq"))
    ).select(
        (F.col("id") * cfg.walks_per_node + F.col("walk_seq")).alias("walk_id"),
        F.col("id").alias("start"),
        F.array(F.col("id")).alias("path"),
        F.col("id").alias("cur"),
        F.lit(None).cast("long").alias("prev"),
        F.lit(False).alias("done"),
    )
    walks = ckpt.checkpoint(walks, 0, name="n2v_walks")

    inv_p = 1.0 / cfg.return_factor
    inv_q = 1.0 / cfg.in_out_factor

    for step in range(1, cfg.walk_length):
        j = walks.join(adj, walks["cur"] == adj["src"], "left").drop("src")
        j = j.join(
            adj.select(F.col("src").alias("prev"), F.col("nbrs").alias("pnbrs")),
            "prev",
            "left",
        )
        # unnormalized weight per candidate neighbor (node2vec eq. 2)
        wts = F.transform(
            "nbrs",
            lambda x: F.when(F.col("prev").isNull(), F.lit(1.0))
            .when(x == F.col("prev"), F.lit(inv_p))
            .when(
                F.array_contains(F.coalesce(F.col("pnbrs"), F.array()), x), F.lit(1.0)
            )
            .otherwise(F.lit(inv_q)),
        )
        total = F.aggregate(wts, F.lit(0.0), lambda a, x: a + x)
        r = _rnd6(F.col("walk_id"), F.lit(step), F.lit(cfg.seed)) * total
        # cumulative-sum sampling: first candidate whose prefix sum exceeds r
        zipped = F.zip_with(
            "nbrs", wts, lambda nb, wt: F.struct(nb.alias("nb"), wt.alias("wt"))
        )
        picked = F.aggregate(
            zipped,
            F.struct(F.lit(-1).cast("long").alias("pick"), r.alias("rem")),
            lambda acc, x: F.when(acc["pick"] >= 0, acc).otherwise(
                F.when(
                    acc["rem"] < x["wt"],
                    F.struct(x["nb"].alias("pick"), acc["rem"].alias("rem")),
                ).otherwise(
                    F.struct(
                        F.lit(-1).cast("long").alias("pick"),
                        (acc["rem"] - x["wt"]).alias("rem"),
                    )
                )
            ),
        )["pick"]
        # rounding guard: if the scan ran off the end, take the last neighbor
        picked = F.when(picked >= 0, picked).otherwise(F.element_at("nbrs", -1))
        pick = F.when(
            F.col("done") | F.col("nbrs").isNull() | (F.size("nbrs") == 0),
            F.lit(None).cast("long"),
        ).otherwise(picked)
        walks = j.select(
            "walk_id",
            "start",
            F.when(pick.isNull(), F.col("path"))
            .otherwise(F.concat("path", F.array(pick)))
            .alias("path"),
            F.coalesce(pick, F.col("cur")).alias("cur"),
            F.when(pick.isNull(), F.lit(None).cast("long"))
            .otherwise(F.col("cur"))
            .alias("prev"),
            (F.col("done") | pick.isNull()).alias("done"),
        )
        walks = ckpt.checkpoint(walks, step, name="n2v_walks")

    adj.unpersist()
    return walks.select("walk_id", "start", "path")


def node2vec(graph: LinkGraph, cfg: Optional[Node2VecConfig] = None) -> Node2VecResult:
    cfg = cfg or Node2VecConfig()
    walks = biased_random_walks(graph, cfg)
    corpus = walks.select(
        F.transform("path", lambda x: x.cast("string")).alias("sentence")
    )

    from pyspark.ml.feature import Word2Vec

    w2v = Word2Vec(
        vectorSize=cfg.embedding_dimension,
        windowSize=cfg.window_size,
        maxIter=cfg.iterations,
        minCount=cfg.min_count,
        seed=cfg.seed,
        inputCol="sentence",
        outputCol="vec",
    )
    model = w2v.fit(corpus)
    from pyspark.ml.functions import vector_to_array

    emb = model.getVectors().select(
        F.col("word").cast("long").alias("id"),
        vector_to_array(F.col("vector")).alias("embedding"),
    )
    return Node2VecResult(embeddings=emb, walks=walks)
