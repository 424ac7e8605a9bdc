"""Round-5: the 4-mode surface covers EVERY registered algorithm.

Reference: each proc ships Stream/Stats/Mutate/Write twins
(proc/centrality/.../PageRank{Stream,Stats,Mutate,Write}Proc.java etc.);
round 4 registered only 14 algorithms — kmeans, k1coloring, node_similarity,
knn, fastrp, node2vec, graphsage, sssp, bfs were direct-call only, so the
README's `LinkGraph.run` surface could not reach them.
"""

import math

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators import modes
from graph_data_science_spark.operators.graph import LinkGraph

NEW_ALGOS = {
    # algo -> config for a tiny smoke graph
    "kmeans": {"k": 2, "max_iterations": 3},
    "k1coloring": {"max_iterations": 5},
    "node_similarity": {"top_k": 3},
    "knn": {"k": 2, "rounds": 1},
    "fastrp": {"embedding_dimension": 8},
    "node2vec": {
        "walks_per_node": 2, "walk_length": 4, "embedding_dimension": 8,
        "window_size": 2,
    },
    "graphsage": {
        "embedding_dimension": 4, "sample_sizes": (3,), "batch_size": 8,
        "max_train_nodes": 8, "max_iterations": 2, "epochs": 1,
    },
    "sssp": {"source": 0, "weighted": False},
    "bfs": {"source": 0},
    "dijkstra": {"source": 0, "target": 3, "weighted": False},
}


@pytest.fixture(scope="module")
def prop_graph(spark):
    """16-node ring + chords; nodes carry `embedding` and `features`."""
    n = 16
    edges = [(i, (i + 1) % n) for i in range(n)] + [(i, (i + 5) % n) for i in range(n)]
    e = spark.createDataFrame(edges, "src long, dst long")
    nodes = spark.range(n).select(
        F.col("id"),
        F.array(
            *[
                ((F.col("id") * (j + 1) % 7).cast("double") + 1.0) / 7.0
                for j in range(4)
            ]
        ).alias("embedding"),
        F.array(
            *[((F.col("id") + j) % 3).cast("double") for j in range(3)]
        ).alias("features"),
    )
    g = LinkGraph.from_edges(spark, e)
    return LinkGraph(nodes=g.nodes.join(nodes, "id"), edges=g.edges,
                     orientation=g.orientation)


def test_registry_is_complete():
    # every algorithm SURVEY §2 implements as a node/embedding/similarity
    # operator is reachable through the one-call surface
    for a in [
        "pagerank", "articlerank", "eigenvector", "wcc", "labelprop",
        "triangles", "degree", "louvain", "scc", "hits", "closeness",
        "harmonic", "betweenness", "maxkcut", "kmeans", "k1coloring",
        "node_similarity", "knn", "fastrp", "node2vec", "graphsage",
        "sssp", "bfs", "dijkstra",
    ]:
        assert a in modes._ALGOS, a


@pytest.mark.parametrize("algo", sorted(NEW_ALGOS))
def test_new_algos_stream_and_stats(spark, prop_graph, algo):
    cfg = dict(NEW_ALGOS[algo])
    df, meta = modes.run(prop_graph, algo, mode="stream", **cfg)
    assert df.count() > 0
    assert meta["algorithm"] == algo and "estimate" in meta

    stats = modes.run(prop_graph, algo, mode="stats", **dict(NEW_ALGOS[algo]))
    spec = modes._ALGOS[algo]()
    if spec.kind == "embedding":
        assert stats["nodeCount"] > 0 and stats["embeddingDimension"] > 0
    elif spec.kind == "relationship":
        assert stats["relationshipCount"] > 0
        assert not math.isnan(stats["mean"])
    else:
        count_key = "communityCount" if spec.kind == "community" else "nodeCount"
        assert stats[count_key] > 0


@pytest.mark.parametrize("algo", ["kmeans", "node_similarity", "fastrp", "sssp"])
def test_new_algos_mutate_and_write(spark, prop_graph, algo, tmp_path):
    cfg = dict(NEW_ALGOS[algo])
    spec = modes._ALGOS[algo]()
    mutated, _ = modes.run(prop_graph, algo, mode="mutate", **cfg)
    if spec.kind == "relationship":
        # mutateRelationshipType analog: similarity pairs become the edges
        assert {"src", "dst", "weight"} <= set(mutated.edges.columns)
        assert mutated.edges.count() > 0
    else:
        assert spec.value_col in mutated.nodes.columns

    path, _ = modes.run(
        prop_graph, algo, mode="write",
        write_path=str(tmp_path / f"{algo}_out"), **dict(NEW_ALGOS[algo]),
    )
    assert spark.read.parquet(path).count() > 0
