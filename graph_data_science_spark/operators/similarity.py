"""Node Similarity (gds.nodeSimilarity.*) — pairwise neighborhood similarity.

Reference: algo/src/main/java/org/neo4j/gds/similarity/nodesim/
NodeSimilarity.java (metrics in MetricSimilarityComputer.java:31-43): compares
*out-neighbor target sets*; JACCARD |A∩B| / |A∪B|, OVERLAP |A∩B| / min(|A|,|B|),
COSINE |A∩B| / sqrt(|A|*|B|); `degreeCutoff` lower bound on set size,
`similarityCutoff` minimum score, per-node `topK`, global `topN`.

Spark decomposition: the intersection for every candidate pair falls out of a
single co-neighbor self-join edges⋈edges on dst + groupBy(a,b).count — no
per-pair set materialization.  topK is a per-node window (bounded priority
queue analog, nodesim/TopKMap.java); ties broken by neighbor id for
determinism.  At scale: the self-join on dst is the skew point (mega in-degree
hubs create |in(d)|^2 pairs) — mitigated by the degree-cutoff prefilter and
AQE skew splitting; hub dst's can additionally be dropped via max_degree.
"""

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graph_data_science_spark.operators.graph import LinkGraph, Orientation

# the co-neighbor self-join creates |in(d)|^2 candidate pairs per shared
# target d — a single million-in-degree hub ("privacy policy" linked from
# every page) is 10^12 pairs before any cutoff can prune.  Above this
# in-degree the default refuses instead of silently scheduling that join
# (same guard discipline as ann.knn_properties / betweenness.guard_all_sources).
HUB_IN_DEGREE_LIMIT = 10_000
_AUTO = "auto"


def node_similarity(
    graph: LinkGraph,
    metric: str = "JACCARD",
    top_k: int = 10,
    top_n: Optional[int] = None,
    degree_cutoff: int = 1,
    similarity_cutoff: float = 1e-42,
    orientation: Orientation = Orientation.NATURAL,
    max_degree: "Optional[int] | str" = _AUTO,
) -> DataFrame:
    """Rows: node1, node2, similarity (node1's topK most similar neighbors).

    `max_degree` (hub protection for the co-neighbor self-join):
      - "auto" (default): probe the max target in-degree (one aggregate over
        the already-needed in-degree frame); refuse with guidance if any
        target exceeds HUB_IN_DEGREE_LIMIT — a hub d contributes |in(d)|^2
        pairs, so the default must not silently schedule a quadratic join.
      - int: drop targets with in-degree > max_degree (reference semantics
        allow bounding: nodesim's own topK bounds per-node output).
      - None: explicit opt-out, no probe, no cap (small/trusted graphs).
    """
    edges = graph.oriented_edges(orientation).select("src", "dst").distinct()

    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    deg = deg.where(F.col("deg") >= degree_cutoff)
    edges = edges.join(deg, "src")

    if max_degree == _AUTO:
        in_deg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("in_deg"))
        hub = in_deg.agg(F.max("in_deg").alias("m")).first()["m"]
        if hub is not None and hub > HUB_IN_DEGREE_LIMIT:
            raise ValueError(
                f"node_similarity: a target node has in-degree {hub} > "
                f"{HUB_IN_DEGREE_LIMIT}; the co-neighbor self-join would "
                f"materialize ~{hub}^2 pairs for it. Pass max_degree=<cap> "
                "to drop hub targets (bounded, recommended) or "
                "max_degree=None to run uncapped anyway."
            )
    elif max_degree is not None:
        in_deg = edges.groupBy("dst").agg(F.count(F.lit(1)).alias("in_deg"))
        edges = edges.join(
            in_deg.where(F.col("in_deg") <= max_degree).select("dst"), "dst", "left_semi"
        )

    a = edges.select(F.col("src").alias("node1"), "dst", F.col("deg").alias("deg1"))
    b = edges.select(F.col("src").alias("node2"), "dst", F.col("deg").alias("deg2"))
    inter = (
        a.join(b, "dst")
        .where(F.col("node1") != F.col("node2"))
        .groupBy("node1", "node2", "deg1", "deg2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )

    m = metric.upper()
    if m == "JACCARD":
        sim = F.col("inter") / (F.col("deg1") + F.col("deg2") - F.col("inter"))
    elif m == "OVERLAP":
        sim = F.col("inter") / F.least("deg1", "deg2")
    elif m == "COSINE":
        sim = F.col("inter") / F.sqrt(F.col("deg1") * F.col("deg2"))
    else:
        raise ValueError(metric)

    out = inter.select("node1", "node2", sim.alias("similarity")).where(
        F.col("similarity") >= similarity_cutoff
    )
    if top_k:
        w = Window.partitionBy("node1").orderBy(F.desc("similarity"), F.asc("node2"))
        out = out.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= top_k).drop("rn")
    if top_n:
        out = out.orderBy(F.desc("similarity"), F.asc("node1"), F.asc("node2")).limit(top_n)
    return out
