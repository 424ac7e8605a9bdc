"""Degree centrality (gds.degree.*).

Reference: algo/src/main/java/org/neo4j/gds/degree/DegreeCentrality.java:65-140
— orientation-aware (NATURAL=out, REVERSE=in, UNDIRECTED=both), weighted mode
sums only positive weights.  Pure groupBy aggregation: map-side partial
combine makes this a single cheap shuffle at any scale.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph, Orientation


def degree_centrality(
    graph: LinkGraph,
    orientation: Orientation = Orientation.NATURAL,
    weighted: bool = False,
) -> DataFrame:
    """id, score (double; counts for unweighted, positive-weight sums else)."""
    return graph.degrees(orientation=orientation, weighted=weighted).select(
        "id", F.col("degree").alias("score")
    )


def degree_histogram(
    graph: LinkGraph, orientation: Orientation = Orientation.NATURAL
) -> DataFrame:
    """Exact (degree, node_count) rows — the full distribution behind the
    percentile summary below (HistogramUtils.similaritySummary analog for
    degrees; gds.graph.list's degreeDistribution field,
    core/.../loading/GraphStoreCatalog.java:185-193 caches exactly this).
    Two map-side-combined aggregations; output is at most max-degree rows,
    so it broadcasts anywhere downstream at any corpus scale."""
    return (
        graph.degrees(orientation=orientation)
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("node_count"))
    )


def degree_distribution(graph: LinkGraph, orientation: Orientation = Orientation.NATURAL) -> dict:
    """Percentile summary cached by the catalog for gds.graph.list
    (core/.../loading/GraphStoreCatalog.java:185-193)."""
    deg = graph.degrees(orientation=orientation)
    row = deg.agg(
        F.min("degree").alias("min"),
        F.max("degree").alias("max"),
        F.avg("degree").alias("mean"),
        F.expr(
            "percentile_approx(degree, array(0.5, 0.75, 0.9, 0.95, 0.99, 0.999), 10000)"
        ).alias("p"),
    ).collect()[0]
    p = row["p"]
    return {
        "min": row["min"],
        "max": row["max"],
        "mean": row["mean"],
        "p50": p[0],
        "p75": p[1],
        "p90": p[2],
        "p95": p[3],
        "p99": p[4],
        "p999": p[5],
    }
