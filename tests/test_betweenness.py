"""Brandes betweenness fixture tests (hand-computed dependency sums)."""

from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph
from graph_data_science_spark.operators.betweenness import betweenness_centrality


def test_directed_path(spark):
    g = LinkGraph.from_edges(spark, [(0, 1), (1, 2), (2, 3)])
    s = {r["id"]: r["score"] for r in betweenness_centrality(g).collect()}
    # pairs through v1: (0,2),(0,3); through v2: (0,3),(1,3)
    assert s == {0: 0.0, 1: 2.0, 2: 2.0, 3: 0.0}


def test_star_symmetrized(spark):
    # undirected star as a symmetrized digraph: every ordered leaf pair's
    # shortest path crosses the center -> bc(center) = 3*2 = 6
    edges = []
    for leaf in (1, 2, 3):
        edges += [(0, leaf), (leaf, 0)]
    g = LinkGraph.from_edges(spark, edges)
    s = {r["id"]: r["score"] for r in betweenness_centrality(g).collect()}
    assert s[0] == 6.0
    assert s[1] == s[2] == s[3] == 0.0


def test_two_shortest_paths_split(spark):
    # 0->1->3, 0->2->3: sigma(3)=2, delta splits 0.5/0.5
    g = LinkGraph.from_edges(spark, [(0, 1), (0, 2), (1, 3), (2, 3)])
    s = {r["id"]: r["score"] for r in betweenness_centrality(g).collect()}
    assert abs(s[1] - 0.5) < 1e-12
    assert abs(s[2] - 0.5) < 1e-12
    assert s[0] == 0.0 and s[3] == 0.0


def test_sampled_sources_subset(spark):
    g = LinkGraph.from_edges(spark, [(0, 1), (1, 2), (2, 3)])
    srcs = g.nodes.where(F.col("id") == 0)
    s = {r["id"]: r["score"] for r in betweenness_centrality(g, sources=srcs).collect()}
    # only source 0's dependencies: delta(1)=2, delta(2)=1
    assert s == {0: 0.0, 1: 2.0, 2: 1.0, 3: 0.0}
