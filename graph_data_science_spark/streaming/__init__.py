"""Structured Streaming surface: continuous crawl-edge ingest into the
atomic link-graph snapshot, plus event-time windowed degree analytics."""

from graph_data_science_spark.streaming.ingest import (  # noqa: F401
    EDGE_EVENT_SCHEMA,
    compact_snapshot,
    ingest_edge_stream,
    read_edge_stream,
    windowed_degree,
)
