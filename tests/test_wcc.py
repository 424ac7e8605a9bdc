"""WCC golden fixtures (algo/src/test/java/org/neo4j/gds/wcc/WccTest.java,
FIXTURES.md §B5): component id = min dense node id, identical under all
orientations; threshold unions only edges with weight > threshold."""

from graph_data_science_spark.operators.graph import LinkGraph, Orientation
from graph_data_science_spark.operators.wcc import WccConfig, consecutive_ids, wcc
from tests.conftest import edges_from


def comp_map(result):
    return {r["id"]: r["comp"] for r in result.components.collect()}


class TestWcc:
    def test_three_components_fixture(self, spark):
        # WccTest.java:349-380: {a,b,c,d}->0, {e,f,g}->4, {h,i}->7, {j}->9
        edges = edges_from("abcdefghij", "a->b, b->c, c->d, d->a, e->f, f->g, g->e, i->h, h->i")
        expected = {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 4, 7: 7, 8: 7, 9: 9}
        for orientation in Orientation:
            g = LinkGraph.from_edges(spark, edges, nodes=range(10), orientation=orientation)
            res = wcc(g)
            assert comp_map(res) == expected, orientation
            assert res.did_converge

    def test_sixteen_chains(self, spark):
        # WccTest.java:64-119: 16 disjoint 10-node chains -> 16 components
        edges = []
        for c in range(16):
            base = c * 10
            edges += [(base + i, base + i + 1) for i in range(9)]
        g = LinkGraph.from_edges(spark, edges, nodes=range(160))
        res = wcc(g)
        comps = comp_map(res)
        assert len(set(comps.values())) == 16
        for c in range(16):
            base = c * 10
            assert {comps[base + i] for i in range(10)} == {base}

    def test_threshold(self, spark):
        # WccThresholdTest semantics: union only edges with weight > threshold
        edges = [(0, 1, 5.0), (1, 2, 0.5), (3, 4, 2.0)]
        g = LinkGraph.from_edges(spark, edges, nodes=range(5))
        res = wcc(g, WccConfig(threshold=1.0))
        assert comp_map(res) == {0: 0, 1: 0, 2: 2, 3: 3, 4: 3}
        res_all = wcc(g)
        assert comp_map(res_all) == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3}

    def test_long_chain_logarithmic_rounds(self, spark):
        # pointer jumping keeps rounds ~log(diameter): 200-node path
        edges = [(i, i + 1) for i in range(199)]
        g = LinkGraph.from_edges(spark, edges, nodes=range(200))
        res = wcc(g, WccConfig(max_rounds=30))
        assert res.did_converge
        assert res.rounds <= 15
        assert set(comp_map(res).values()) == {0}

    def test_consecutive_ids(self, spark):
        edges = edges_from("abcdefghij", "a->b, b->c, c->d, d->a, e->f, f->g, g->e, i->h, h->i")
        g = LinkGraph.from_edges(spark, edges, nodes=range(10))
        res = wcc(g, WccConfig(consecutive_ids=True))
        assert comp_map(res) == {0: 0, 1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1, 7: 2, 8: 2, 9: 3}


def test_wcc_seeded_incremental(spark):
    from pyspark.sql import functions as F

    # two components {0,1,2} and {5,6}; seeds: node 1 -> 100, node 6 -> 7
    g = LinkGraph.from_edges(spark, [(0, 1), (1, 2), (5, 6)])
    nodes = g.nodes.withColumn(
        "seed",
        F.when(F.col("id") == 1, 100).when(F.col("id") == 6, 7).cast("long"),
    )
    g2 = LinkGraph(nodes=nodes, edges=g.edges)
    res = wcc(g2, WccConfig(seed_property="seed"))
    comp = {r["id"]: r["comp"] for r in res.components.collect()}
    # component ids = min(seed, maxSeed + unseeded_id + 1): seeds win
    assert comp[0] == comp[1] == comp[2] == 100
    assert comp[5] == comp[6] == 7


def test_wcc_seeded_seed_collides_with_node_id(spark):
    """A seed value equal to an unrelated node's id must NOT merge components.

    Regression: pointer jumping indexed the comp table by label assuming
    labels were node ids; with seed labels, seed(10)=20 pulled node 20's
    component label into {10,11}.
    """
    from pyspark.sql import functions as F

    g = LinkGraph.from_edges(spark, [(10, 11), (20, 21)])
    nodes = g.nodes.withColumn(
        "seed",
        F.when(F.col("id") == 10, 20).when(F.col("id") == 21, 3).cast("long"),
    )
    g2 = LinkGraph(nodes=nodes, edges=g.edges)
    res = wcc(g2, WccConfig(seed_property="seed"))
    comp = {r["id"]: r["comp"] for r in res.components.collect()}
    assert comp == {10: 20, 11: 20, 20: 3, 21: 3}


def test_wcc_resume_from_durable_checkpoint(spark, tmp_path):
    """North rule: runs resume mid-iteration from committed state, converging
    to the same components as an uninterrupted run."""
    from graph_data_science_spark.operators.wcc import WccConfig, wcc

    # long path graph so convergence takes several rounds
    edges = [(i, i + 1) for i in range(30)]
    g = LinkGraph.from_edges(spark, edges)
    ck = str(tmp_path / "wcc_ck")

    gold = wcc(g)
    gold_m = {r["id"]: r["comp"] for r in gold.components.collect()}

    partial = wcc(g, WccConfig(max_rounds=2, checkpoint_path=ck))
    assert not partial.did_converge
    res = wcc(g, WccConfig(checkpoint_path=ck))
    assert any(m.get("resumed_from") == 2 for m in res.metrics)
    assert res.did_converge
    got = {r["id"]: r["comp"] for r in res.components.collect()}
    assert got == gold_m


def test_wcc_resume_ignores_stale_checkpoint_of_different_graph(spark, tmp_path):
    """Reusing a checkpoint path after the graph changed (the incremental
    use case) must NOT resume the old run's state: the committed manifests
    carry a (graph, config) fingerprint and latest_superstep() skips
    mismatches, so the new nodes get correct components."""
    from graph_data_science_spark.operators.wcc import WccConfig, wcc

    ck = str(tmp_path / "wcc_ck")
    g1 = LinkGraph.from_edges(spark, [(i, i + 1) for i in range(30)])
    partial = wcc(g1, WccConfig(max_rounds=2, checkpoint_path=ck))
    assert not partial.did_converge

    # updated graph: one extra node bridging two ends + a brand-new chain
    g2 = LinkGraph.from_edges(
        spark, [(i, i + 1) for i in range(30)] + [(100, 101), (101, 102)]
    )
    res = wcc(g2, WccConfig(checkpoint_path=ck))
    assert not any("resumed_from" in m for m in res.metrics)
    got = {r["id"]: r["comp"] for r in res.components.collect()}
    assert got[100] == got[101] == got[102]
    assert len({got[i] for i in range(31)}) == 1

    # same graph + same config -> the fingerprint matches and resume works
    # (the path already holds the full run's committed supersteps, so the
    # rerun resumes from the LATEST matching superstep, whatever it is)
    res2 = wcc(g2, WccConfig(checkpoint_path=ck))
    assert any("resumed_from" in m for m in res2.metrics)
    assert {r["id"]: r["comp"] for r in res2.components.collect()} == got
