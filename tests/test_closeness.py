"""Closeness + harmonic centrality fixture tests (semantics per
ClosenessCentrality.java / HarmonicCentrality.java — see closeness.py)."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph
from graph_data_science_spark.operators.closeness import (
    closeness_centrality,
    harmonic_centrality,
    hop_distances,
)

PATH = [(0, 1), (1, 2), (2, 3)]  # directed path 0 -> 1 -> 2 -> 3


def test_hop_distances(spark):
    g = LinkGraph.from_edges(spark, PATH)
    d = {(r["root"], r["id"]): r["dist"] for r in hop_distances(g).collect()}
    assert d == {
        (0, 1): 1, (0, 2): 2, (0, 3): 3,
        (1, 2): 1, (1, 3): 2,
        (2, 3): 1,
    }


def test_closeness_path(spark):
    g = LinkGraph.from_edges(spark, PATH)
    s = {r["id"]: r["score"] for r in closeness_centrality(g).collect()}
    # farness aggregated at the REACHED node over reaching sources:
    # node3: dists {3,2,1} -> 3/6; node2: {2,1} -> 2/3; node1: {1} -> 1; node0: 0
    assert s[0] == 0.0
    assert abs(s[1] - 1.0) < 1e-12
    assert abs(s[2] - 2 / 3) < 1e-12
    assert abs(s[3] - 0.5) < 1e-12


def test_closeness_wasserman_faust(spark):
    g = LinkGraph.from_edges(spark, PATH)
    s = {r["id"]: r["score"] for r in closeness_centrality(g, wasserman_faust=True).collect()}
    # multiply by componentSize/(n-1), n=4
    assert abs(s[3] - 0.5 * (3 / 3)) < 1e-12
    assert abs(s[2] - (2 / 3) * (2 / 3)) < 1e-12
    assert abs(s[1] - 1.0 * (1 / 3)) < 1e-12


def test_harmonic_path(spark):
    g = LinkGraph.from_edges(spark, PATH)
    s = {r["id"]: r["score"] for r in harmonic_centrality(g).collect()}
    assert s[0] == 0.0
    assert abs(s[3] - (1 / 3 + 1 / 2 + 1) / 3) < 1e-12
    assert abs(s[2] - (1 / 2 + 1) / 3) < 1e-12


def test_harmonic_undirected_clique(spark):
    edges = [(a, b) for a in range(4) for b in range(4) if a != b]
    g = LinkGraph.from_edges(spark, edges)
    s = {r["id"]: r["score"] for r in harmonic_centrality(g).collect()}
    for v in s.values():
        assert abs(v - 1.0) < 1e-12  # all pairwise distances are 1


def test_sampled_sources(spark):
    g = LinkGraph.from_edges(spark, PATH)
    srcs = g.nodes.where(F.col("id") == 0)
    s = {r["id"]: r["score"] for r in harmonic_centrality(g, sources=srcs).collect()}
    # only node 0's contributions
    assert abs(s[3] - (1 / 3) / 3) < 1e-12
    assert s[0] == 0.0
