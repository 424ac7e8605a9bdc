"""Community result-layer operators: conductance, community statistics,
modularity.

References:
- Conductance (gds.alpha.conductance.stream,
  alpha/alpha-algo/src/main/java/org/neo4j/gds/impl/conductance/
  Conductance.java:251): per community C over *directed out-edges* of its
  members, conductance = external / (external + internal) with edge weight 1
  unless weighted.
- CommunityStatistics (algo-common/src/main/java/org/neo4j/gds/result/
  CommunityStatistics.java:84-189): component count, size histogram
  percentiles for the stats execution mode.
- Modularity as used by Louvain/ModularityOptimization
  (algo/.../beta/modularity/ModularityOptimization.java): standard directed
  modularity Q = Σ_C [ e_C/m − (vol_out_C * vol_in_C)/m² ].
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph


def conductance(
    graph: LinkGraph, communities: DataFrame, weighted: bool = False
) -> DataFrame:
    """communities: (id, community).  Rows: community, conductance.

    Communities with zero incident edges are omitted (reference leaves them
    NaN and filters them from the stream, Conductance.java Result).
    """
    w = F.col("weight") if weighted else F.lit(1.0)
    cs = communities.select(F.col("id").alias("src"), F.col("community").alias("c_src"))
    cd = communities.select(F.col("id").alias("dst"), F.col("community").alias("c_dst"))
    e = graph.edges.join(cs, "src").join(cd, "dst")
    agg = e.groupBy(F.col("c_src").alias("community")).agg(
        F.sum(F.when(F.col("c_src") == F.col("c_dst"), w).otherwise(0.0)).alias("internal"),
        F.sum(F.when(F.col("c_src") != F.col("c_dst"), w).otherwise(0.0)).alias("external"),
    )
    return agg.where((F.col("internal") + F.col("external")) > 0).select(
        "community",
        (F.col("external") / (F.col("external") + F.col("internal"))).alias("conductance"),
    )


def community_sizes(communities: DataFrame, community_col: str = "comp") -> DataFrame:
    return communities.groupBy(F.col(community_col).alias("community")).agg(
        F.count(F.lit(1)).alias("size")
    )


def community_stats(communities: DataFrame, community_col: str = "comp") -> dict:
    """Stats-mode summary row (CommunityStatistics.java:123-189)."""
    sizes = community_sizes(communities, community_col)
    row = sizes.agg(
        F.count(F.lit(1)).alias("communityCount"),
        F.min("size").alias("min"),
        F.max("size").alias("max"),
        F.avg("size").alias("mean"),
        F.expr(
            "percentile_approx(size, array(0.01, 0.05, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999), 10000)"
        ).alias("p"),
    ).collect()[0]
    p = row["p"]
    keys = ["p1", "p5", "p25", "p50", "p75", "p90", "p95", "p99", "p999"]
    return {
        "communityCount": row["communityCount"],
        "min": row["min"],
        "max": row["max"],
        "mean": row["mean"],
        **dict(zip(keys, p)),
    }


def modularity(graph: LinkGraph, communities: DataFrame, weighted: bool = False) -> float:
    """Directed modularity of a given partition."""
    w = F.col("weight") if weighted else F.lit(1.0)
    cs = communities.select(F.col("id").alias("src"), F.col("community").alias("c_src"))
    cd = communities.select(F.col("id").alias("dst"), F.col("community").alias("c_dst"))
    e = graph.edges.join(cs, "src").join(cd, "dst").select("c_src", "c_dst", w.alias("w"))
    m = e.agg(F.sum("w")).collect()[0][0]
    if not m:
        return 0.0
    internal = (
        e.where(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias("c"))
        .agg(F.sum("w").alias("e_c"))
    )
    vol_out = e.groupBy(F.col("c_src").alias("c")).agg(F.sum("w").alias("vout"))
    vol_in = e.groupBy(F.col("c_dst").alias("c")).agg(F.sum("w").alias("vin"))
    joined = (
        vol_out.join(vol_in, "c", "full")
        .select(
            "c",
            F.coalesce("vout", F.lit(0.0)).alias("vout"),
            F.coalesce("vin", F.lit(0.0)).alias("vin"),
        )
        .join(internal, "c", "left")
        .select("c", "vout", "vin", F.coalesce("e_c", F.lit(0.0)).alias("e_c"))
    )
    q = joined.agg(
        F.sum(F.col("e_c") / F.lit(m) - (F.col("vout") * F.col("vin")) / F.lit(float(m) ** 2))
    ).collect()[0][0]
    return float(q or 0.0)
