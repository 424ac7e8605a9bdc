"""Uniform execution-mode surface: stream / stats / mutate / write.

Reference: executor/src/main/java/org/neo4j/gds/executor/ExecutionMode.java:
22-30 — every algorithm is exposed in four modes: STREAM (rows to caller),
STATS (summary row with histograms), MUTATE (add the result as an in-memory
node property), WRITE (persist).  Here one `run()` entry wraps every major
operator with the same contract:

- stream -> the result DataFrame
- stats  -> a dict: run metadata + CommunityStatistics/CentralityStatistics
            style histogram fields
- mutate -> a NEW LinkGraph whose nodes carry the result column
            (GraphStore.addNodeProperty analog; graphs stay immutable —
            mutation returns a new projection)
- write  -> result written to parquet at `write_path` (the Iceberg
            MERGE INTO analog on a cluster), returns the path

A cheap cost report (plans/estimate.py) is logged into the returned
metadata before execution — the `.estimate` twin.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph
from graph_data_science_spark.plans.estimate import cost_report


@dataclass
class AlgoSpec:
    run: Callable[[LinkGraph, dict], Any]  # -> result object or DataFrame
    result_df: Callable[[Any], DataFrame]  # extract (id, <value_col>) DF
    value_col: str
    kind: str  # 'community' | 'centrality'
    # which config key carries the planned iteration count for the cost
    # report, and its algorithm default (each wrapped algorithm names its
    # loop bound differently: max_iterations / max_rounds / hits_iterations /
    # max_levels / max_outer_rounds; non-iterative algorithms use (None, 1))
    iter_key: str | None = "max_iterations"
    default_iters: int = 20


def _pagerank(variant: str):
    from graph_data_science_spark.operators import pagerank as pr

    fn = {"pagerank": pr.page_rank, "articlerank": pr.article_rank,
          "eigenvector": pr.eigenvector}[variant]

    def run(g, cfg):
        return fn(g, pr.PageRankConfig(**cfg))

    return AlgoSpec(run, lambda r: r.scores, "score", "centrality")


def _wcc():
    from graph_data_science_spark.operators import wcc as w

    return AlgoSpec(
        lambda g, cfg: w.wcc(g, w.WccConfig(**cfg) if cfg else None),
        lambda r: r.components.withColumnRenamed("comp", "component"),
        "component",
        "community",
        iter_key="max_rounds",
        default_iters=200,
    )


def _labelprop():
    from graph_data_science_spark.operators import labelprop as lp

    return AlgoSpec(
        lambda g, cfg: lp.label_propagation(g, lp.LabelPropagationConfig(**cfg)),
        lambda r: r.labels,
        "label",
        "community",
        default_iters=10,
    )


def _triangles():
    from graph_data_science_spark.operators import triangles as tri

    return AlgoSpec(
        lambda g, cfg: tri.triangle_count(g, tri.TriangleCountConfig(**cfg) if cfg else None),
        lambda r: r.local_triangles.withColumnRenamed("triangles", "triangleCount"),
        "triangleCount",
        "centrality",
        iter_key=None,
        default_iters=1,
    )


def _degree():
    from graph_data_science_spark.operators import degree as deg

    class _R:
        def __init__(self, df):
            self.df = df
            self.metrics = []

    return AlgoSpec(
        lambda g, cfg: _R(deg.degree_centrality(g, **cfg)),
        lambda r: r.df,
        "score",
        "centrality",
        iter_key=None,
        default_iters=1,
    )


def _louvain():
    from graph_data_science_spark.operators import louvain as lv

    return AlgoSpec(
        lambda g, cfg: lv.louvain(g, lv.LouvainConfig(**cfg)),
        lambda r: r.communities,
        "community",
        "community",
        iter_key="max_levels",
        default_iters=10,
    )


def _scc():
    from graph_data_science_spark.operators import scc as s

    return AlgoSpec(
        lambda g, cfg: s.scc(g, **cfg),
        lambda r: r.components.withColumnRenamed("comp", "component"),
        "component",
        "community",
        iter_key="max_outer_rounds",
        default_iters=50,
    )


def _hits():
    from graph_data_science_spark.operators import hits as h

    return AlgoSpec(
        lambda g, cfg: h.hits(g, h.HitsConfig(**cfg) if cfg else None),
        lambda r: r.scores.select("id", F.col("auth").alias("score"), "hub"),
        "score",
        "centrality",
        iter_key="hits_iterations",
    )


def _closeness(harmonic: bool):
    from graph_data_science_spark.operators import closeness as cl

    class _R:
        def __init__(self, df):
            self.df = df
            self.metrics = []

    fn = cl.harmonic_centrality if harmonic else cl.closeness_centrality

    return AlgoSpec(
        lambda g, cfg: _R(fn(g, **cfg)),
        lambda r: r.df,
        "score",
        "centrality",
        iter_key="max_depth",
        default_iters=32,
    )


def _betweenness():
    from graph_data_science_spark.operators import betweenness as bt

    class _R:
        def __init__(self, df):
            self.df = df
            self.metrics = []

    return AlgoSpec(
        lambda g, cfg: _R(bt.betweenness_centrality(g, **cfg)),
        lambda r: r.df,
        "score",
        "centrality",
        iter_key="max_depth",
        default_iters=32,
    )


def _maxkcut():
    from graph_data_science_spark.operators import maxkcut as kc

    return AlgoSpec(
        lambda g, cfg: kc.approx_max_k_cut(g, **cfg),
        lambda r: r.assignment,
        "partition",
        "community",
        default_iters=10,
    )


_ALGOS: dict[str, Callable[[], AlgoSpec]] = {
    "pagerank": lambda: _pagerank("pagerank"),
    "articlerank": lambda: _pagerank("articlerank"),
    "eigenvector": lambda: _pagerank("eigenvector"),
    "wcc": _wcc,
    "labelprop": _labelprop,
    "triangles": _triangles,
    "degree": _degree,
    "louvain": _louvain,
    "scc": _scc,
    "hits": _hits,
    "closeness": lambda: _closeness(False),
    "harmonic": lambda: _closeness(True),
    "betweenness": _betweenness,
    "maxkcut": _maxkcut,
}

MODES = ("stream", "stats", "mutate", "write")


def _stats_row(df: DataFrame, value_col: str, kind: str) -> dict:
    if kind == "community":
        from graph_data_science_spark.operators.community import community_stats

        return community_stats(df.withColumnRenamed(value_col, "comp"))
    # centrality histogram (CentralityStatistics.java analog)
    row = df.agg(
        F.count(F.lit(1)).alias("nodeCount"),
        F.min(value_col).alias("min"),
        F.max(value_col).alias("max"),
        F.avg(value_col).alias("mean"),
        F.expr(
            f"percentile_approx({value_col}, "
            "array(0.01, 0.05, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999), 10000)"
        ).alias("p"),
    ).collect()[0]
    keys = ["p1", "p5", "p25", "p50", "p75", "p90", "p95", "p99", "p999"]
    return {
        "nodeCount": row["nodeCount"],
        "min": row["min"],
        "max": row["max"],
        "mean": row["mean"],
        **dict(zip(keys, row["p"])),
    }


def run(
    graph: LinkGraph,
    algorithm: str,
    mode: str = "stream",
    write_path: Optional[str] = None,
    mutate_property: Optional[str] = None,
    **config: Any,
):
    """One entry, four modes (ExecutionMode.java:22-30).  See module doc."""
    if algorithm not in _ALGOS:
        raise ValueError(f"unknown algorithm {algorithm!r}; have {sorted(_ALGOS)}")
    if mode not in MODES:
        raise ValueError(f"unknown mode {mode!r}; have {MODES}")
    spec = _ALGOS[algorithm]()

    planned = (
        int(config.get(spec.iter_key, spec.default_iters))
        if spec.iter_key
        else spec.default_iters
    )
    est = cost_report(algorithm, graph.nodes, graph.edges, planned)
    result = spec.run(graph, config)
    df = spec.result_df(result)
    meta = {
        "algorithm": algorithm,
        "mode": mode,
        "estimate": est,
        "ran_iterations": getattr(result, "ran_iterations", None),
        "did_converge": getattr(result, "did_converge", None),
    }

    if mode == "stream":
        return df, meta
    if mode == "stats":
        return {**meta, **_stats_row(df, spec.value_col, spec.kind)}
    if mode == "mutate":
        prop = mutate_property or spec.value_col
        mutated = LinkGraph(
            nodes=graph.nodes.join(
                df.select("id", F.col(spec.value_col).alias(prop)), "id", "left"
            ),
            edges=graph.edges,
            orientation=graph.orientation,
        )
        return mutated, meta
    # write — atomic snapshot publish (NativeNodePropertyExporter's
    # transactional commit analog; see sources/atomic.py)
    if not write_path:
        raise ValueError("write mode requires write_path")
    from graph_data_science_spark.sources.atomic import atomic_parquet_overwrite

    atomic_parquet_overwrite(df, write_path)
    return write_path, meta
