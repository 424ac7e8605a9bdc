"""graph_data_science_spark — a from-scratch PySpark-native link-graph
analytics engine with the core capabilities of the Neo4j Graph Data Science
library (reference: frank-zsy/graph-data-science, surveyed in SURVEY.md).

This is NOT a port: algorithms are expressed as iterative DataFrame
join/groupBy transforms and vectorized Arrow UDFs, letting Catalyst/AQE pick
physical strategies.  The reference's shared-memory CSR engine is replaced by
columnar DataFrames; its Pregel framework by a superstep driver with
checkpointed state (plans/checkpoint.py).
"""

from graph_data_science_spark.session import get_spark
from graph_data_science_spark.operators.graph import Aggregation, LinkGraph, Orientation

__all__ = ["get_spark", "LinkGraph", "Orientation", "Aggregation", "run"]


def run(graph, algorithm, mode="stream", **config):
    """Uniform execution-mode entry (stream/stats/mutate/write) — see
    operators/modes.py."""
    from graph_data_science_spark.operators.modes import run as _run

    return _run(graph, algorithm, mode, **config)

__version__ = "0.1.0"
