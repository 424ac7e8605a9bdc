"""Profile PageRank superstep throughput at a given core count.

Usage: python scripts/profile_superstep.py <cpus> <checkpoint_every> [replicate]
"""

import sys
import time

sys.path.insert(0, ".")

from graph_data_science_spark.session import get_spark
from pyspark.sql import functions as F
from graph_data_science_spark.operators.graph import LinkGraph, Aggregation
from graph_data_science_spark.operators import pagerank as pr_ops

cpus = int(sys.argv[1])
K = int(sys.argv[2])
REP = int(sys.argv[3]) if len(sys.argv) > 3 else 8
N = 99991

nobc = len(sys.argv) > 4 and sys.argv[4] == "nobc"
extra = (
    {"spark.sql.autoBroadcastJoinThreshold": "-1",
     "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1"}
    if nobc else {}
)
if len(sys.argv) > 5 and sys.argv[5] == "noaqe":
    extra["spark.sql.adaptive.enabled"] = "false"
if len(sys.argv) > 4 and sys.argv[4] == "shm":
    extra["spark.local.dir"] = "/dev/shm/spark-local"
    import tempfile as _tf
    _tf.tempdir = "/dev/shm"
spark = get_spark("prof", master=f"local[{cpus}]", shuffle_partitions=cpus,
                  extra_conf=extra)
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
dt = time.time() - t0
print(
    f"RESULT cpus={cpus} K={K} rep={REP} nobc={nobc} edges={ne} supersteps=16 "
    f"wall={dt:.1f}s per_superstep={dt/16:.2f}s eps={ne*16/dt:,.0f}"
)
spark.stop()
