"""Bucketed graph storage: roundtrip parity + the exchange-elimination
contract (edge side of src-keyed ops never reshuffles)."""

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph
from graph_data_science_spark.operators.pagerank import PageRankConfig, page_rank
from graph_data_science_spark.sources.bucketed import (
    drop_bucketed,
    load_bucketed,
    save_bucketed,
)


@pytest.fixture
def bucketed_graph(spark):
    e = spark.range(20000).select(
        (F.col("id") % 499).alias("src"), (F.col("id") % 83 + 1).alias("dst")
    ).where("src <> dst")
    g = LinkGraph.from_edges(spark, e)
    save_bucketed(g, "t_bg", buckets=8)
    yield g, load_bucketed(spark, "t_bg")
    drop_bucketed(spark, "t_bg")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_roundtrip_pagerank_parity(spark, bucketed_graph):
    g, bg = bucketed_graph
    cfg = PageRankConfig(tolerance=0, max_iterations=8)
    a = {r.id: r.score for r in page_rank(g, cfg).scores.collect()}
    b = {r.id: r.score for r in page_rank(bg, cfg).scores.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-9)


def test_probe_join_shuffles_only_probe_side(spark, bucketed_graph):
    _, bg = bucketed_graph
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        probe = spark.range(499).select("id")
        j = probe.hint("shuffle_hash").join(bg.edges, probe["id"] == bg.edges["src"])
        plan = _plan(j)
        assert plan.count("Exchange") == 1  # probe only
        assert "Bucketed: true" in plan
        # the identical join against plain parquet needs both sides exchanged
        bg.edges.write.mode("overwrite").parquet("/tmp/t_bg_plain")
        pe = spark.read.parquet("/tmp/t_bg_plain")
        j2 = probe.hint("shuffle_hash").join(pe, probe["id"] == pe["src"])
        assert _plan(j2).count("Exchange") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_src_grouped_degree_needs_no_exchange(spark, bucketed_graph):
    _, bg = bucketed_graph
    deg = bg.edges.groupBy("src").agg(F.count("*").alias("degree"))
    assert "Exchange" not in _plan(deg)
    want = bg.edges.count()
    assert deg.agg(F.sum("degree")).first()[0] == want
