"""Label propagation fixtures (LabelPropagationTest.java:65-133, FIXTURES.md
§B6).  The async concurrency-1 ordering is matched exactly by the pandas
oracle; the scalable sync engine is validated on fixtures where both
semantics converge (documented divergence, SURVEY.md §7.3)."""

from graph_data_science_spark.operators.graph import LinkGraph
from graph_data_science_spark.operators.labelprop import (
    LabelPropagationConfig,
    label_propagation,
    label_propagation_async_oracle,
)

# Alice=0, Bridget=1, Charles=2, Doug=3, Mark=4, Michael=5
FOLLOW = [
    (0, 1), (0, 2), (4, 3), (1, 5), (3, 4),
    (5, 0), (0, 5), (1, 0), (5, 1), (2, 3),
]
SEEDS = [2, 3, 4, 3, 4, 2]


class TestAsyncOracle:
    def test_unseeded_one_iteration(self):
        # LabelPropagationTest.java:88-110 -> [1, 1, 3, 4, 4, 1]
        assert label_propagation_async_oracle(FOLLOW, 6, max_iterations=1) == [1, 1, 3, 4, 4, 1]

    def test_seeded_one_iteration(self):
        # LabelPropagationTest.java:115-133 -> [2, 2, 3, 4, 4, 2]
        labels = label_propagation_async_oracle(FOLLOW, 6, max_iterations=1, seeds=SEEDS)
        assert labels == [2, 2, 3, 4, 4, 2]


def label_map(result):
    return {r["id"]: r["label"] for r in result.labels.collect()}


class TestSyncEngine:
    def test_two_cliques_converge_to_min_label(self, spark):
        # disjoint triangles (undirected): majority/min-tie vote converges to
        # the min id of each clique
        edges = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)]
        g = LinkGraph.from_edges(spark, edges, nodes=[0, 1, 2, 10, 11, 12])
        from graph_data_science_spark.operators.graph import Orientation

        res = label_propagation(
            g, LabelPropagationConfig(max_iterations=10, orientation=Orientation.UNDIRECTED)
        )
        assert res.did_converge
        labels = label_map(res)
        assert labels[0] == labels[1] == labels[2] == 0
        assert labels[10] == labels[11] == labels[12] == 10

    def test_seed_and_missing_seed_rule(self, spark):
        # missing seeds -> maxSeedLabel + id + 1 (InitStep.java:73-75)
        import pyspark.sql.functions as F

        edges = [(0, 1)]
        g = LinkGraph.from_edges(spark, edges, nodes=range(3))
        nodes = g.nodes.withColumn(
            "seed", F.when(F.col("id") == 0, F.lit(7)).otherwise(F.lit(None).cast("long"))
        )
        g.nodes = nodes
        res = label_propagation(g, LabelPropagationConfig(max_iterations=0, seed_property="seed"))
        labels = label_map(res)
        assert labels == {0: 7, 1: 7 + 1 + 1, 2: 7 + 2 + 1}

    def test_weighted_votes(self, spark):
        # node 0 gathers from 1 (label 1, weight 10) and 2 (label 2, weight 1):
        # heavier vote wins even though label 2... label 1 wins by weight
        edges = [(0, 1, 10.0), (0, 2, 1.0)]
        g = LinkGraph.from_edges(spark, edges, nodes=range(3))
        res = label_propagation(g, LabelPropagationConfig(max_iterations=1, weighted=True))
        assert label_map(res)[0] == 1
        # unweighted: tie between labels 1 and 2 -> min label 1
        res2 = label_propagation(g, LabelPropagationConfig(max_iterations=1))
        assert label_map(res2)[0] == 1

    def test_node_weight_votes(self, spark):
        import pyspark.sql.functions as F

        edges = [(0, 1), (0, 2)]
        g = LinkGraph.from_edges(spark, edges, nodes=range(3))
        g.nodes = g.nodes.withColumn(
            "nw", F.when(F.col("id") == 2, F.lit(5.0)).otherwise(F.lit(1.0))
        )
        res = label_propagation(
            g, LabelPropagationConfig(max_iterations=1, node_weight_property="nw")
        )
        # neighbor 2 has node weight 5 -> label 2 wins over label 1
        assert label_map(res)[0] == 2

    def test_sync_matches_async_oracle_on_convergent_graph(self, spark):
        # ring of two communities joined weakly; both semantics converge to the
        # same partition here
        edges = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)]
        g = LinkGraph.from_edges(spark, edges, nodes=range(3))
        res = label_propagation(g, LabelPropagationConfig(max_iterations=10))
        oracle = label_propagation_async_oracle(edges, 3, max_iterations=10)
        # same partition structure (label values may differ between semantics)
        assert len(set(label_map(res).values())) == 1
        assert len(set(oracle)) == 1


class TestDurableResume:
    def test_resume_replays_exact_trajectory(self, spark, tmp_path):
        """Sync LP is a deterministic function of the previous state, so a
        resumed run must land on EXACTLY the labels an uninterrupted run
        produces (not merely the same partition)."""
        # two chains merging into a ring: takes several iterations to settle
        edges = (
            [(i, i + 1) for i in range(12)]
            + [(i + 1, i) for i in range(12)]
            + [(12, 0), (0, 12)]
        )
        g = LinkGraph.from_edges(spark, edges, nodes=range(13))
        ck = str(tmp_path / "lp_ck")

        gold = label_propagation(g, LabelPropagationConfig(max_iterations=10))

        partial = label_propagation(
            g, LabelPropagationConfig(max_iterations=3, checkpoint_path=ck)
        )
        assert not partial.did_converge
        res = label_propagation(
            g, LabelPropagationConfig(max_iterations=10, checkpoint_path=ck)
        )
        assert any(m.get("resumed_from") == 3 for m in res.metrics)
        assert label_map(res) == label_map(gold)
        assert res.did_converge == gold.did_converge

    def test_resume_refuses_stale_state_of_different_config(self, spark, tmp_path):
        """Same path, different config (weighted) -> fingerprint mismatch ->
        cold start, not silent stale resume."""
        import pyspark.sql.functions as F

        edges = [(i, i + 1) for i in range(8)] + [(i + 1, i) for i in range(8)]
        g = LinkGraph.from_edges(spark, edges, nodes=range(9))
        ck = str(tmp_path / "lp_ck2")
        label_propagation(
            g, LabelPropagationConfig(max_iterations=2, checkpoint_path=ck)
        )
        res = label_propagation(
            g,
            LabelPropagationConfig(
                max_iterations=4, weighted=True, checkpoint_path=ck
            ),
        )
        assert not any("resumed_from" in m for m in res.metrics)
