"""Pure serial-floor measurement: PageRank on a near-empty graph.

With ~1k nodes / ~4k edges the per-superstep compute is microseconds, so the
measured wall IS the engine's serial floor: Catalyst planning of the window
chain, DAGScheduler stage scheduling, the checkpoint parquet write+commit,
and the Python driver loop.  Run at several checkpoint windows K to see how
the floor amortizes:

    python scripts/profile_floor_null.py <cpus> <K> [K2 K3 ...]
"""

import sys
import time

sys.path.insert(0, ".")

from graph_data_science_spark.session import get_spark
from pyspark.sql import functions as F
from graph_data_science_spark.operators.graph import LinkGraph, Aggregation
from graph_data_science_spark.operators import pagerank as pr_ops

cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
Ks = [int(a) for a in sys.argv[2:]] or [1, 4, 8, 16]
ITERS = 33  # 32 measured supersteps

spark = get_spark("floor0", master=f"local[{cpus}]", shuffle_partitions=cpus)
e = (
    spark.range(4000)
    .select(
        (F.col("id") * 37 % 997).alias("src"), (F.col("id") * 101 % 997).alias("dst")
    )
    .where("src <> dst")
)
g = LinkGraph.from_edges(spark, e, aggregation=Aggregation.SINGLE).cache()
g.relationship_count()

# warmup (JIT, codegen cache, shuffle service)
pr_ops.page_rank(g, pr_ops.PageRankConfig(tolerance=0.0, max_iterations=9,
                                          checkpoint_every=4))

for K in Ks:
    t0 = time.time()
    res = pr_ops.page_rank(
        g,
        pr_ops.PageRankConfig(tolerance=1e-12, max_iterations=ITERS,
                              checkpoint_every=K),
    )
    res.scores.agg(F.sum("score")).collect()
    dt = time.time() - t0
    n = ITERS - 1
    print(f"FLOOR cpus={cpus} K={K} supersteps={n} wall={dt:.2f}s "
          f"per_superstep={dt/n*1000:.0f}ms")
spark.stop()
