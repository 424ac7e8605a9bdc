"""Superstep state checkpointing + per-partition lineage metrics.

Iterative DataFrame algorithms grow their logical plan every superstep; left
unchecked, Catalyst analysis time explodes (SURVEY.md §4 "iteration plan
management").  The reference keeps state in dense in-memory arrays
(pregel/src/main/java/org/neo4j/gds/beta/pregel/NodeValue.java); our analog is
a per-superstep materialization that truncates lineage and — when a durable
path is configured — makes any superstep resumable (north rule: "resumable
from checkpoint with per-partition lineage + metrics").

Two modes:
- ephemeral (default): ``df.localCheckpoint(eager=True)`` — executor-memory
  snapshot, zero I/O, used for tests/bench.
- durable: write state to ``<path>/state/superstep=N/`` (parquet here; the
  table format is pluggable — on a cluster this is an Iceberg table and the
  atomic snapshot commit is the transactional analog of the reference's
  write-back tx, SURVEY.md §3.3) and read back.  Metrics rows (one per
  superstep, with per-partition row counts = the lineage record) append to
  ``<path>/metrics``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SuperstepCheckpointer:
    def __init__(self, spark: SparkSession, path: str | None = None, run_id: str = "run"):
        self.spark = spark
        self.path = path
        self.run_id = run_id
        self._metrics: list[dict[str, Any]] = []
        if path:
            os.makedirs(os.path.join(path, "state"), exist_ok=True)
            os.makedirs(os.path.join(path, "metrics"), exist_ok=True)

    # -- state ---------------------------------------------------------------
    def checkpoint(self, df: DataFrame, superstep: int, name: str = "state") -> DataFrame:
        """Materialize superstep state, truncating lineage."""
        if self.path is None:
            return df.localCheckpoint(eager=True)
        p = self._state_path(superstep, name)
        df.write.mode("overwrite").parquet(p)
        return self.spark.read.parquet(p)

    def _state_path(self, superstep: int, name: str = "state") -> str:
        return os.path.join(self.path, "state", f"{name}_superstep={superstep:05d}")

    def latest_superstep(self, name: str = "state") -> int | None:
        """Highest superstep with committed durable state (for resume)."""
        if self.path is None:
            return None
        base = os.path.join(self.path, "state")
        steps = []
        for d in os.listdir(base):
            if d.startswith(f"{name}_superstep=") and os.path.exists(
                os.path.join(base, d, "_SUCCESS")
            ):
                steps.append(int(d.split("=")[1]))
        return max(steps) if steps else None

    def load(self, superstep: int, name: str = "state") -> DataFrame:
        return self.spark.read.parquet(self._state_path(superstep, name))

    # -- metrics / lineage -----------------------------------------------------
    def partition_lineage(self, df: DataFrame) -> list[dict[str, int]]:
        """Per-partition row counts — the lineage record for one superstep."""
        rows = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .count()
            .collect()
        )
        return [{"partition_id": r["partition_id"], "rows": r["count"]} for r in rows]

    def log(self, superstep: int, **kw: Any) -> None:
        rec = {"run_id": self.run_id, "superstep": superstep, "ts": time.time(), **kw}
        self._metrics.append(rec)
        if self.path:
            fp = os.path.join(self.path, "metrics", f"superstep_{superstep:05d}.json")
            with open(fp, "w") as f:
                json.dump(rec, f, default=str)

    @property
    def metrics(self) -> list[dict[str, Any]]:
        return list(self._metrics)
