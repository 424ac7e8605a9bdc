"""LinkGraph — the projected-graph analog (DataFrames instead of CSR).

Reference data model (SURVEY.md §1): GDS projects the database into an
immutable in-memory CSR snapshot (core/src/main/java/org/neo4j/gds/core/huge/
HugeGraph.java:57-88) with a dense IdMap (api/IdMap.java:31), per-type
orientation (graph-projection-api/.../Orientation.java:29-31) and parallel-edge
aggregation (graph-projection-api/.../core/Aggregation.java:31-85).

Spark mapping: nodes/edges are columnar DataFrames; CSR becomes a blocked
sorted-adjacency DataFrame (hub rows split across blocks — the skew analog of
GDS degree partitioning, PartitionUtils.degreePartition); orientation and
aggregation are edge-set transforms done once at build.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class Orientation(str, Enum):
    NATURAL = "NATURAL"
    REVERSE = "REVERSE"
    UNDIRECTED = "UNDIRECTED"


class Aggregation(str, Enum):
    """Parallel-edge aggregation at projection time.

    Mirrors graph-projection-api/src/main/java/org/neo4j/gds/core/
    Aggregation.java:31-85 (NONE keeps parallel edges, SINGLE keeps an
    arbitrary one — here deterministically `first` after sort — SUM/MIN/MAX/
    COUNT aggregate the weight).
    """

    NONE = "NONE"
    SINGLE = "SINGLE"
    SUM = "SUM"
    MIN = "MIN"
    MAX = "MAX"
    COUNT = "COUNT"


EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("weight", T.DoubleType(), True),
    ]
)


@dataclass
class LinkGraph:
    """Immutable projected graph: a node DataFrame + an edge DataFrame.

    ``nodes``: ``id BIGINT`` (dense-ish, but any distinct longs work) plus
    optional property columns (e.g. ``url`` original id, ``seed`` …).
    ``edges``: ``src BIGINT, dst BIGINT[, weight DOUBLE]`` in NATURAL
    orientation (stored once; REVERSE/UNDIRECTED are derived views).
    """

    nodes: DataFrame
    edges: DataFrame
    orientation: Orientation = Orientation.NATURAL
    _cached: list = field(default_factory=list, repr=False)

    # -- construction ---------------------------------------------------------
    @staticmethod
    def from_edges(
        spark: SparkSession,
        edges: DataFrame | Sequence[tuple],
        nodes: DataFrame | Iterable[int] | None = None,
        orientation: Orientation = Orientation.NATURAL,
        aggregation: Aggregation = Aggregation.SINGLE,
        weighted: bool = False,
    ) -> "LinkGraph":
        if not isinstance(edges, DataFrame):
            rows = [
                (int(e[0]), int(e[1]), float(e[2]) if len(e) > 2 else 1.0)
                for e in edges
            ]
            edges = spark.createDataFrame(rows, schema=EDGE_SCHEMA)
        if "weight" not in edges.columns:
            edges = edges.withColumn("weight", F.lit(1.0))
        edges = edges.select(
            F.col("src").cast("long"),
            F.col("dst").cast("long"),
            F.col("weight").cast("double"),
        )

        edges = _aggregate_parallel(edges, aggregation)

        if nodes is None:
            nodes = (
                edges.select(F.col("src").alias("id"))
                .unionByName(edges.select(F.col("dst").alias("id")))
                .distinct()
            )
        elif not isinstance(nodes, DataFrame):
            nodes = spark.createDataFrame(
                [(int(n),) for n in nodes],
                schema=T.StructType([T.StructField("id", T.LongType(), False)]),
            )
        return LinkGraph(nodes=nodes, edges=edges, orientation=orientation)

    # -- orientation views (SURVEY.md §1.3) ------------------------------------
    def oriented_edges(self, orientation: Orientation | None = None) -> DataFrame:
        """Edges under the requested orientation.

        UNDIRECTED materializes both directions (GDS stores each undirected
        edge in both adjacency lists, Orientation.java:31) with canonical
        parallel-dedup applied first so one logical undirected edge yields
        exactly two directed rows.
        """
        o = orientation or self.orientation
        e = self.edges
        if o == Orientation.NATURAL:
            return e
        if o == Orientation.REVERSE:
            return e.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        # UNDIRECTED: dedup logical edges on canonical (min,max), keep self-loops once
        canon = (
            e.select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
                "weight",
            )
            .groupBy("a", "b")
            .agg(F.first("weight").alias("weight"))
        )
        fwd = canon.select(F.col("a").alias("src"), F.col("b").alias("dst"), "weight")
        bwd = canon.where(F.col("a") != F.col("b")).select(
            F.col("b").alias("src"), F.col("a").alias("dst"), "weight"
        )
        return fwd.unionByName(bwd)

    # -- degrees (Degrees interface; algo/.../degree/DegreeCentrality.java) ----
    def degrees(
        self,
        orientation: Orientation | None = None,
        weighted: bool = False,
    ) -> DataFrame:
        """Per-node degree: ``id, degree``; every node present (0 for isolated).

        Weighted degree sums only positive weights
        (DegreeCentrality.java:108-140).
        """
        e = self.oriented_edges(orientation)
        agg = (
            F.sum(F.when(F.col("weight") > 0, F.col("weight")).otherwise(0.0))
            if weighted
            else F.count(F.lit(1)).cast("double")
        )
        d = e.groupBy(F.col("src").alias("id")).agg(agg.alias("degree"))
        return (
            self.nodes.select("id")
            .join(d, "id", "left")
            .select("id", F.coalesce("degree", F.lit(0.0)).alias("degree"))
        )

    # -- CSR-blocked adjacency --------------------------------------------------
    def adjacency(
        self,
        orientation: Orientation | None = None,
        block_size: int = 4096,
        weighted: bool = False,
    ) -> DataFrame:
        """Sorted adjacency arrays, hub rows split into blocks.

        CSR analog (HugeGraph.java:57-88): `src, block, dsts ARRAY<BIGINT>`
        sorted ascending within the full list (AdjacencyCompression.java:52-67
        sorts at build; sortedness is load-bearing for merge intersection).
        Rows with degree > block_size are split into multiple blocks so a
        single hub never lands in one task (degree partitioning analog).
        """
        e = self.oriented_edges(orientation)
        ranked = e.select(
            "src",
            "dst",
            "weight",
            ((F.row_number().over(_w_src())) - 1).alias("rn"),
        ).withColumn("block", (F.col("rn") / F.lit(block_size)).cast("long"))
        aggs = [F.sort_array(F.collect_list(F.struct("dst", "weight"))).alias("pairs")]
        out = ranked.groupBy("src", "block").agg(*aggs)
        cols = [
            "src",
            "block",
            F.col("pairs.dst").alias("dsts"),
        ]
        if weighted:
            cols.append(F.col("pairs.weight").alias("weights"))
        return out.select(*cols)

    # -- filters (SURVEY.md §2.2) -----------------------------------------------
    def filter_weight(self, threshold: float) -> "LinkGraph":
        """Keep only edges with weight > threshold (Wcc.java:290-311)."""
        return LinkGraph(
            nodes=self.nodes,
            edges=self.edges.where(F.col("weight") > F.lit(threshold)),
            orientation=self.orientation,
        )

    def subgraph(self, node_predicate: str | None = None, edge_predicate: str | None = None) -> "LinkGraph":
        """Predicate subgraph (subgraph-filtering/.../GraphStoreFilter.java):
        node/edge expressions evaluated by Catalyst; edges are semi-joined so
        both endpoints survive."""
        nodes = self.nodes
        if node_predicate:
            nodes = nodes.where(F.expr(node_predicate))
        edges = self.edges
        if edge_predicate:
            edges = edges.where(F.expr(edge_predicate))
        if node_predicate:
            ids = nodes.select("id")
            edges = (
                edges.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
                .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .select("src", "dst", "weight")
            )
        return LinkGraph(nodes=nodes, edges=edges, orientation=self.orientation)

    # -- property streaming / removal (proc/catalog analogs) ---------------------
    def stream_node_properties(self, *props: str) -> DataFrame:
        """gds.graph.streamNodeProperties analog: (id, prop...) rows."""
        missing = [p for p in props if p not in self.nodes.columns]
        if missing:
            raise ValueError(f"unknown node properties: {missing}")
        return self.nodes.select("id", *props)

    def stream_relationship_properties(self) -> DataFrame:
        """gds.graph.streamRelationshipProperties analog."""
        return self.edges.select("src", "dst", "weight")

    def remove_node_properties(self, *props: str) -> "LinkGraph":
        """gds.graph.removeNodeProperties analog (immutable: new projection)."""
        keep = [c for c in self.nodes.columns if c not in set(props)]
        if "id" not in keep:
            raise ValueError("cannot remove the id column")
        return LinkGraph(
            nodes=self.nodes.select(*keep), edges=self.edges,
            orientation=self.orientation,
        )

    def delete_relationships(self, predicate: str) -> "LinkGraph":
        """gds.graph.deleteRelationships analog: drop edges MATCHING the
        Catalyst predicate expression (immutable: new projection)."""
        return LinkGraph(
            nodes=self.nodes,
            edges=self.edges.where(~F.expr(predicate)),
            orientation=self.orientation,
        )

    # -- stats -------------------------------------------------------------------
    def node_count(self) -> int:
        return self.nodes.count()

    def relationship_count(self) -> int:
        return self.edges.count()

    def cache(self) -> "LinkGraph":
        self.nodes = self.nodes.cache()
        self.edges = self.edges.cache()
        return self

    # -- algorithm convenience (gds.<algo>.<mode> call-surface analog,
    #    reference proc/catalog/*Proc.java single-call entry points) -----------
    def run(self, algorithm: str, mode: str = "stream", **config):
        """``g.run("pagerank", tolerance=1e-6)`` — one-call execution of any
        registered algorithm under stream/stats/mutate/write semantics.
        Delegates to :func:`operators.modes.run`; see that module for the
        algorithm registry and per-mode return shapes."""
        from graph_data_science_spark.operators.modes import run as _run

        return _run(self, algorithm, mode, **config)


def _w_src():
    from pyspark.sql.window import Window

    return Window.partitionBy("src").orderBy("dst")


def _aggregate_parallel(edges: DataFrame, aggregation: Aggregation) -> DataFrame:
    if aggregation == Aggregation.NONE:
        return edges
    g = edges.groupBy("src", "dst")
    if aggregation == Aggregation.SINGLE:
        return g.agg(F.first("weight").alias("weight"))
    if aggregation == Aggregation.SUM:
        return g.agg(F.sum("weight").alias("weight"))
    if aggregation == Aggregation.MIN:
        return g.agg(F.min("weight").alias("weight"))
    if aggregation == Aggregation.MAX:
        return g.agg(F.max("weight").alias("weight"))
    if aggregation == Aggregation.COUNT:
        return g.agg(F.count(F.lit(1)).cast("double").alias("weight"))
    raise ValueError(aggregation)
