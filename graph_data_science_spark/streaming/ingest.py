"""Continuous link-graph ingest over Structured Streaming.

The reference builds its graph once per `gds.graph.project` call from a
store scan (SURVEY.md §3.1); a web-scale crawl never stops producing edges,
so the Spark-first analog is a streaming ingest that keeps a queryable
snapshot fresh:

  crawl edge events (src, dst, ts)
    -> readStream (schema-pinned file source; Kafka drops in unchanged)
    -> watermark + dropDuplicatesWithinWatermark  (in-flight dedup)
    -> foreachBatch: APPEND delta parquet, one dir per micro-batch id
    -> compact_snapshot(): deltas + previous snapshot -> dedup
       -> atomic symlink-swap publish (sources/atomic.py)

Scale notes (the parts that must survive 100 TB):
  * foreachBatch APPENDS — it never rewrites the snapshot per batch.  Each
    batch writes only its own rows to `deltas/batch=<id>`; overwriting that
    one dir on replay makes the sink idempotent (exactly-once per batch id,
    the standard idempotent-foreachBatch pattern), so a restart after a
    crash between commit and checkpoint cannot duplicate edges.
  * Cross-batch duplicates older than the watermark are NOT the stream's
    problem: `compact_snapshot` dedups (src, dst) globally with one hash
    aggregation, so the snapshot is exact regardless of watermark sizing.
  * Compaction reads deltas + snapshot and republishes via the same staged
    atomic commit every writer here uses — readers of the snapshot path
    never observe a half-compacted graph.  On a cluster the pointer flip is
    the Iceberg/Hive metadata swap; the dataflow is identical.
  * State stores stay bounded: the only stateful operator is the
    within-watermark dedup (keyed by (src, dst), expired by event time).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graph_data_science_spark.sources.atomic import atomic_parquet_overwrite

__all__ = [
    "EDGE_EVENT_SCHEMA",
    "read_edge_stream",
    "ingest_edge_stream",
    "compact_snapshot",
    "windowed_degree",
]

# One crawl observation: a link src -> dst seen at event time ts.  src/dst
# are the dense node ids of the batch pipeline (sources/edges.py build_id_map)
# or raw urls upstream of it — the ingest is agnostic.
EDGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def read_edge_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EDGE_EVENT_SCHEMA,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source edge-event stream (schema must be pinned for streams)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def _delta_batch_writer(deltas_path: str):
    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Idempotent per-batch sink: replaying batch N after a crash rewrites
        # the same dir instead of appending a duplicate copy.
        (
            batch_df.select("src", "dst")
            .write.mode("overwrite")
            .parquet(os.path.join(deltas_path, f"batch={batch_id}"))
        )

    return write_batch


def ingest_edge_stream(
    stream: DataFrame,
    deltas_path: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
    dedup_within_watermark: bool = True,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Run the ingest; returns the StreamingQuery (already started).

    available_now=True drains everything currently in the source then stops
    (deterministic — used by tests and the driver query); pass
    available_now=False with a processing_time trigger for a long-running
    crawl tail.
    """
    s = stream.withWatermark("ts", watermark)
    if dedup_within_watermark:
        s = s.dropDuplicatesWithinWatermark(["src", "dst"])
    writer = (
        s.writeStream.foreachBatch(_delta_batch_writer(deltas_path))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time is not None:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def compact_snapshot(
    spark: SparkSession,
    deltas_path: str,
    snapshot_path: str,
    clear_deltas: bool = True,
) -> DataFrame:
    """Fold accumulated deltas into the published snapshot (one hash dedup +
    one atomic publish); returns the new snapshot DataFrame.

    Safe to call while the stream keeps appending: batch dirs written after
    the read started are simply picked up by the next compaction (parquet
    file listing is a point-in-time view), and `clear_deltas` removes only
    the dirs this compaction actually read.
    """
    delta_dirs = (
        sorted(
            d
            for d in os.listdir(deltas_path)
            if d.startswith("batch=")
            and os.path.isdir(os.path.join(deltas_path, d))
        )
        if os.path.isdir(deltas_path)
        else []
    )
    parts = [os.path.join(deltas_path, d) for d in delta_dirs]
    # empty micro-batches write a dir with no parquet part files; skip them
    parts = [p for p in parts if any(f.endswith(".parquet") for f in os.listdir(p))]
    schema = "src long, dst long"
    if parts:
        delta = spark.read.schema(schema).parquet(*parts)
    else:
        delta = spark.createDataFrame([], schema)
    if os.path.exists(snapshot_path):
        prev = spark.read.schema(schema).parquet(snapshot_path)
        delta = delta.unionByName(prev)
    snap = delta.dropDuplicates(["src", "dst"])
    atomic_parquet_overwrite(snap, snapshot_path)
    if clear_deltas:
        for p in parts:
            shutil.rmtree(p, ignore_errors=True)
    return spark.read.schema(schema).parquet(snapshot_path)


def windowed_degree(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "10 minutes",
    direction: str = "in",
) -> DataFrame:
    """Event-time windowed degree: edges-per-node per tumbling (or sliding)
    window — the streaming analog of degree centrality over a crawl tail.
    Returns an unstarted aggregated streaming DataFrame; attach a sink with
    outputMode 'update' (or 'complete' for small result sets).
    """
    key = "dst" if direction == "in" else "src"
    w = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(w.alias("window"), F.col(key).alias("id"))
        .agg(F.count("*").alias("degree"))
        .select(
            F.col("window.start").alias("window_start"),
            "id",
            "degree",
        )
    )
