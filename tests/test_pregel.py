"""Generic Pregel driver tests: built-ins re-expressed as user computations
must match the dedicated operators; plus custom computation examples."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph
from graph_data_science_spark.operators.pregel import (
    PregelComputation,
    PregelConfig,
    run_pregel,
)
from graph_data_science_spark.operators.pagerank import PageRankConfig, page_rank

EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (4, 2), (4, 0),
    (5, 2), (6, 2), (6, 5), (7, 2), (7, 5),
]


def test_pregel_pagerank_matches_builtin(spark):
    g = LinkGraph.from_edges(spark, EDGES)
    damping, tol = 0.85, 1e-7

    deg = g.degrees().withColumnRenamed("id", "_did")

    comp = PregelComputation(
        init=lambda nodes: nodes.join(deg, nodes["id"] == deg["_did"], "left").select(
            "id",
            F.lit(1 - damping).alias("rank"),
            F.lit(1 - damping).alias("delta"),
            F.coalesce("degree", F.lit(0.0)).alias("degree"),
        ),
        message=lambda se: F.col("delta") / F.col("degree"),
        update=lambda st, msg: [
            F.col("rank") + F.lit(damping) * msg,
            F.lit(damping) * msg,
            F.col("degree"),
        ],
        reducer="sum",
        send_when=lambda st: (F.col("delta") > tol) & (F.col("degree") > 0),
    )

    res = run_pregel(g, comp, PregelConfig(max_iterations=20))
    builtin = page_rank(g, PageRankConfig(tolerance=tol, max_iterations=21))

    a = {r["id"]: r["rank"] for r in res.state.collect()}
    b = {r["id"]: r["score"] for r in builtin.scores.collect()}
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) < 1e-6, (k, a[k], b[k])
    assert res.did_converge == builtin.did_converge


def test_pregel_min_distance(spark):
    """Custom computation: min-hop distance from node 0 (SSSP, reducer=min).
    The `changed` state column gates sending — the propagate-style pattern."""
    g = LinkGraph.from_edges(spark, [(0, 1), (1, 2), (2, 3), (0, 3), (3, 4)])
    INF = float("inf")

    comp = PregelComputation(
        init=lambda nodes: nodes.select(
            "id",
            F.when(F.col("id") == 0, 0.0).otherwise(F.lit(INF)).alias("dist"),
            (F.col("id") == 0).alias("changed"),
        ),
        message=lambda se: F.col("dist") + 1.0,
        update=lambda st, msg: [
            F.least(F.col("dist"), msg),
            msg < F.col("dist"),
        ],
        reducer="min",
        send_when=lambda st: F.col("changed") & (F.col("dist") < INF),
    )
    res = run_pregel(g, comp, PregelConfig(max_iterations=10))
    assert res.did_converge
    dist = {r["id"]: r["dist"] for r in res.state.collect()}
    assert dist == {0: 0.0, 1: 1.0, 2: 2.0, 3: 1.0, 4: 2.0}


def test_pregel_max_propagation(spark):
    """Custom computation: every node learns the max id reaching it."""
    g = LinkGraph.from_edges(spark, [(0, 1), (1, 0), (1, 2), (2, 1), (4, 5), (5, 4)])
    comp = PregelComputation(
        init=lambda nodes: nodes.select(
            "id", F.col("id").alias("best"), F.lit(True).alias("changed")
        ),
        message=lambda se: F.col("best"),
        update=lambda st, msg: [
            F.greatest(F.col("best"), msg),
            msg > F.col("best"),
        ],
        reducer="max",
        send_when=lambda st: F.col("changed"),
    )
    res = run_pregel(g, comp, PregelConfig(max_iterations=10))
    assert res.did_converge
    best = {r["id"]: r["best"] for r in res.state.collect()}
    assert best[0] == best[1] == best[2] == 2
    assert best[4] == best[5] == 5


def test_pregel_durable_resume_exact_trajectory(spark, tmp_path):
    """A named user computation resumes from the latest committed superstep
    and lands on EXACTLY the uninterrupted run's state; a different
    computation_id at the same path must cold-start."""
    # min-distance propagation over a long chain (many supersteps)
    chain = [(i, i + 1) for i in range(15)]
    g = LinkGraph.from_edges(spark, chain, nodes=range(16))
    INF = float("inf")

    def make_comp():
        return PregelComputation(
            init=lambda nodes: nodes.select(
                "id",
                F.when(F.col("id") == 0, 0.0).otherwise(F.lit(INF)).alias("dist"),
            ),
            message=lambda se: F.col("dist") + F.lit(1.0),
            update=lambda st, msg: [F.least(F.col("dist"), msg)],
            reducer="min",
            send_when=lambda st: F.col("dist") < F.lit(INF),
        )

    ck = str(tmp_path / "pregel_ck")
    gold = run_pregel(g, make_comp(), PregelConfig(max_iterations=30))
    assert gold.did_converge

    partial = run_pregel(
        g,
        make_comp(),
        PregelConfig(max_iterations=4, checkpoint_path=ck, computation_id="sssp1"),
    )
    assert not partial.did_converge
    res = run_pregel(
        g,
        make_comp(),
        PregelConfig(max_iterations=30, checkpoint_path=ck, computation_id="sssp1"),
    )
    assert any(m.get("resumed_from") == 4 for m in res.metrics)
    assert res.did_converge
    a = {r["id"]: r["dist"] for r in res.state.collect()}
    b = {r["id"]: r["dist"] for r in gold.state.collect()}
    assert a == b
    assert a[15] == 15.0

    # different computation_id, same path -> fingerprint mismatch -> cold start
    res2 = run_pregel(
        g,
        make_comp(),
        PregelConfig(max_iterations=30, checkpoint_path=ck, computation_id="other"),
    )
    assert not any("resumed_from" in m for m in res2.metrics)
    assert {r["id"]: r["dist"] for r in res2.state.collect()} == b

    # no computation_id -> resume disabled even with committed state present
    res3 = run_pregel(
        g, make_comp(), PregelConfig(max_iterations=30, checkpoint_path=ck)
    )
    assert not any("resumed_from" in m for m in res3.metrics)
