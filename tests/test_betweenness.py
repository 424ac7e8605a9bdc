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


def test_all_sources_guardrail(spark):
    """VERDICT r2 #5: exact all-sources mode must be an explicit opt-in past
    the node-count threshold — the library default may not silently schedule
    O(n*reachable) pair materialization on a web-scale graph."""
    import pytest

    from graph_data_science_spark.operators.betweenness import (
        EXACT_ALL_SOURCES_LIMIT,
        select_sources_random_degree,
    )
    from graph_data_science_spark.operators.closeness import hop_distances

    n = EXACT_ALL_SOURCES_LIMIT + 10
    nodes = spark.range(n).withColumnRenamed("id", "id")
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    g = LinkGraph(nodes=nodes, edges=edges.withColumn("weight", F.lit(1.0)))

    with pytest.raises(ValueError, match="sources="):
        betweenness_centrality(g)
    with pytest.raises(ValueError, match="sources="):
        hop_distances(g)

    # explicit sampling and explicit exact=True both pass the guard
    srcs = select_sources_random_degree(g, k=3)
    assert srcs.count() == 3
    assert betweenness_centrality(g, sources=srcs).count() == n
    small = LinkGraph.from_edges(spark, [(0, 1), (1, 2)])
    assert betweenness_centrality(small, exact=True).count() == 3


def test_select_sources_random_degree_bias(spark):
    """Degree-weighted selection: a 200x-degree hub is (deterministically,
    via the seeded exponential keys) always in a small sample."""
    from graph_data_science_spark.operators.betweenness import (
        select_sources_random_degree,
    )

    hub_edges = [(0, i) for i in range(1, 201)] + [(i, i + 1000) for i in range(1, 51)]
    g = LinkGraph.from_edges(spark, hub_edges)
    s1 = {r["id"] for r in select_sources_random_degree(g, k=5, seed=7).collect()}
    s2 = {r["id"] for r in select_sources_random_degree(g, k=5, seed=7).collect()}
    assert s1 == s2  # deterministic
    assert 0 in s1  # the hub dominates the weighted keys
