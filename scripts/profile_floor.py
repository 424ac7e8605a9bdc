"""Decompose the per-superstep serial floor of the PageRank loop.

Monkeypatches SuperstepCheckpointer.checkpoint into timed segments (parquet
write job / footer-lineage read / manifest / read-back DF creation) and times
the driver-side gap between window boundaries.  Run:

    python scripts/profile_floor.py <cpus> <checkpoint_every> [replicate]
"""

import sys
import time

sys.path.insert(0, ".")

from graph_data_science_spark.session import get_spark
from pyspark.sql import functions as F
from graph_data_science_spark.operators.graph import LinkGraph, Aggregation
from graph_data_science_spark.operators import pagerank as pr_ops
from graph_data_science_spark.plans import checkpoint as ckpt_mod

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
REP = int(sys.argv[3]) if len(sys.argv) > 3 else 48
N = 99991

SEGS: list[dict] = []

_orig = ckpt_mod.SuperstepCheckpointer.checkpoint


def timed_checkpoint(self, df, superstep, name="state"):
    import os, json, shutil

    seg = {"superstep": superstep, "name": name}
    t0 = time.time()
    schema = df.schema
    if self._ephemeral:
        p = os.path.join(self._tmp, f"{name}_superstep={superstep:05d}")
        df.write.mode("overwrite").parquet(p)
        seg["write_job_s"] = time.time() - t0
        t1 = time.time()
        hist = self._history.setdefault(name, [])
        hist.append(p)
        while len(hist) > self.EPHEMERAL_KEEP:
            shutil.rmtree(hist.pop(0), ignore_errors=True)
        seg["evict_s"] = time.time() - t1
        t2 = time.time()
        out = self.spark.read.schema(schema).parquet(p)
        seg["readback_s"] = time.time() - t2
    else:
        out = _orig(self, df, superstep, name)
        seg["write_job_s"] = time.time() - t0
    SEGS.append(seg)
    return out


ckpt_mod.SuperstepCheckpointer.checkpoint = timed_checkpoint

spark = get_spark("floor", master=f"local[{cpus}]", shuffle_partitions=cpus)
li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
e = li.select(
    (F.col("l_orderkey") % N).alias("src"), (F.col("l_partkey") % N).alias("dst")
).where("src <> dst")
if REP > 1:
    copies = spark.range(REP).select(F.col("id").alias("copy"))
    e = e.crossJoin(copies).select(
        (F.col("src") + F.col("copy") * N).alias("src"),
        (F.col("dst") + F.col("copy") * N).alias("dst"),
    )
g = LinkGraph.from_edges(spark, e, aggregation=Aggregation.SINGLE).cache()
ne = g.relationship_count()

t0 = time.time()
res = pr_ops.page_rank(
    g, pr_ops.PageRankConfig(tolerance=1e-6, max_iterations=17, checkpoint_every=K)
)
res.scores.agg(F.sum("score")).collect()
wall = time.time() - t0

boundaries = [s for s in SEGS if s["name"] == "state" and s["superstep"] > 0]
print(f"\nRESULT cpus={cpus} K={K} rep={REP} edges={ne} wall={wall:.1f}s "
      f"per_superstep={wall/16:.2f}s")
for s in boundaries:
    print("  window@t=%2d  write_job=%.2fs  evict=%.3fs  readback=%.3fs"
          % (s["superstep"], s.get("write_job_s", 0), s.get("evict_s", 0),
             s.get("readback_s", 0)))
tot_w = sum(s.get("write_job_s", 0) for s in boundaries)
tot_rb = sum(s.get("evict_s", 0) + s.get("readback_s", 0) for s in boundaries)
print(f"  windows={len(boundaries)}  sum write_job={tot_w:.1f}s  "
      f"sum evict+readback={tot_rb:.2f}s  "
      f"outside-checkpoint wall={wall - tot_w - tot_rb:.1f}s")
spark.stop()
