"""Cheap pre-execution cost report — the memory-estimation analog.

Reference: every GDS procedure has an `.estimate` twin and a memory gate
before running (executor/.../MemoryUsageValidator;
pregel/src/main/java/org/neo4j/gds/beta/pregel/Pregel.java:78-95 sizes the
node-value arrays + message queues from counts).  Spark spills instead of
failing, so no hard gate is needed — but the north rule asks for a cheap
cost report in job logs: planned iterations x per-superstep shuffle volume.

Sizes come from Catalyst plan statistics (`optimizedPlan().stats()`), NOT
from count() actions — the report is free: zero Spark jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's sizeInBytes estimate for a DataFrame — no job is run."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return -1


def cost_report(
    algorithm: str,
    nodes: DataFrame,
    edges: DataFrame,
    max_iterations: int,
    state_cols: int = 2,
) -> dict:
    """Pregel.memoryEstimation analog: estimated bytes of per-superstep state
    (node rows x state columns) and message traffic (edge rows), times the
    planned iteration count.  All figures are Catalyst statistics estimates.
    """
    node_b = plan_size_bytes(nodes)
    edge_b = plan_size_bytes(edges)
    per_superstep = (edge_b if edge_b > 0 else 0) + (
        node_b * state_cols if node_b > 0 else 0
    )
    return {
        "algorithm": algorithm,
        "est_node_bytes": node_b,
        "est_edge_bytes": edge_b,
        "planned_iterations": max_iterations,
        "est_shuffle_bytes_per_superstep": per_superstep,
        "est_total_shuffle_bytes": per_superstep * max(max_iterations, 1),
    }
