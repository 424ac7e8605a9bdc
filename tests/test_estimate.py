"""Round-5: per-algorithm `.estimate` twins (Pregel.memoryEstimation analog,
pregel/src/main/java/org/neo4j/gds/beta/pregel/Pregel.java:78-95;
executor/.../MemoryUsageValidator.java gates every reference run on one)."""

import os

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators import modes
from graph_data_science_spark.operators.graph import LinkGraph
from graph_data_science_spark.plans.estimate import algorithm_estimate


@pytest.fixture(scope="module")
def small_graph(spark):
    e = spark.range(400).select(
        (F.col("id") * 7 % 97).alias("src"), (F.col("id") * 13 % 97).alias("dst")
    ).where("src <> dst")
    return LinkGraph.from_edges(spark, e)


@pytest.mark.parametrize("algo", ["pagerank", "wcc", "labelprop", "triangles"])
def test_north_rule_estimate_rows(small_graph, algo):
    est = modes.run(small_graph, algo, mode="estimate")
    assert est["algorithm"] == algo
    assert est["node_count"] == small_graph.node_count()
    assert est["relationship_count"] == small_graph.relationship_count()
    assert est["state_bytes_per_row"] >= 12
    assert est["est_checkpoint_bytes_per_superstep"] == (
        est["node_count"] * est["state_bytes_per_row"]
    )
    assert est["est_message_bytes_per_superstep"] > 0
    assert est["est_total_shuffle_bytes"] >= est["est_message_bytes_per_superstep"]
    assert est["est_peak_bytes"] > est["est_state_bytes"]


def test_estimate_runs_no_algorithm(small_graph):
    # the twin must forecast without executing: pagerank at max_iterations
    # 10^6 returns instantly with the iteration count echoed
    est = modes.run(small_graph, "pagerank", mode="estimate",
                    max_iterations=1_000_000)
    assert est["planned_iterations"] == 1_000_000


def test_estimate_within_2x_of_observed_checkpoint(spark, tmp_path):
    """The checkpoint-bytes forecast is the real sizing signal: a PageRank
    state parquet (id, rank, delta) at 50k rows must land within 2x."""
    n = 50_000
    state = spark.range(n).select(
        "id",
        (F.rand(7) * 0.5 + 0.15).alias("rank"),
        (F.rand(11) * 1e-3).alias("delta"),
    ).repartition(4)
    p = str(tmp_path / "state")
    state.write.mode("overwrite").parquet(p)
    observed = sum(
        os.path.getsize(os.path.join(p, f))
        for f in os.listdir(p)
        if f.startswith("part-")
    )
    est = algorithm_estimate("pagerank", n, 0)
    forecast = est["est_checkpoint_bytes_per_superstep"]
    assert forecast / 2 <= observed <= forecast * 2, (forecast, observed)


def test_embedding_estimate_scales_with_dimension(small_graph):
    lo = modes.run(small_graph, "fastrp", mode="estimate", embedding_dimension=32)
    hi = modes.run(small_graph, "fastrp", mode="estimate", embedding_dimension=256)
    assert hi["est_state_bytes"] > 7 * lo["est_state_bytes"]
