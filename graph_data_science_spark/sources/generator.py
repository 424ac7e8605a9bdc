"""Seeded random graph generator — the `gds.beta.graph.generate` analog.

Reference behavior (what, not how): RandomGraphGenerator
(core/src/main/java/org/neo4j/gds/beta/generator/RandomGraphGenerator.java:58,96-108)
produces nodeCount nodes whose out-degrees follow a configured
RelationshipDistribution (UNIFORM / RANDOM / POWER_LAW,
core/.../beta/generator/RelationshipDistribution.java) with uniformly random
targets, plus optional seeded relationship property producers (fixed value or
uniform-random in a range).

Spark-first re-expression: one `spark.range(node_count)` plus pure column
algebra.  Every random quantity is a deterministic function of
(node id, slot k, seed) via md5-hex-prefix arithmetic (the `_hex6` RNG shared
with sources/corpus.py), never of partitioning or scheduling — so generation
is partition-stable at any parallelism AND an ANSI-SQL oracle replays the
exact edge list (CORRECTNESS `graph_generate`).  At 100 TB scale the
generator is embarrassingly parallel: `spark.range` splits the id space
across executors and no shuffle happens until the caller aggregates.

Degree distributions (out-degree per node, mean = average_degree for all
three — the reference's contract):
- UNIFORM:   exactly `average_degree` links per node (the reference's
             constant-degree mode);
- RANDOM:    uniform integer in [0, 2*average_degree] (mean average_degree,
             per-node variance — the reference's random mode);
- POWER_LAW: inverse-CDF floor((avg/2) * u^(-1/2)) clamped to
             [1, max_degree_cap] — same tail shape as
             RelationshipDistribution.POWER_LAW:59-72 and sources/corpus.py.
"""

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_M6 = float(16**6)

DISTRIBUTIONS = ("UNIFORM", "RANDOM", "POWER_LAW")


@dataclass(frozen=True)
class RelationshipProperty:
    """A seeded relationship property producer (PropertyProducer analog:
    core/.../beta/generator/PropertyProducer.java — fixed[value] or
    randomDouble[lo, hi])."""

    name: str
    kind: str  # "fixed" | "random"
    value: float = 0.0  # fixed value
    lo: float = 0.0  # random range lower bound (inclusive)
    hi: float = 1.0  # random range upper bound (exclusive)


def fixed_property(name: str, value: float) -> RelationshipProperty:
    return RelationshipProperty(name=name, kind="fixed", value=value)


def random_property(name: str, lo: float, hi: float) -> RelationshipProperty:
    return RelationshipProperty(name=name, kind="random", lo=lo, hi=hi)


def _hex6(key) -> "F.Column":
    """First-6-hex-chars of md5(key) as a long in [0, 16^6) — exact-integer
    seeded RNG an ANSI-SQL oracle replays (conv/strpos arithmetic)."""
    return F.conv(F.substring(F.md5(key), 1, 6), 16, 10).cast("long")


def generate_graph(
    spark: SparkSession,
    node_count: int,
    average_degree: int,
    distribution: str = "UNIFORM",
    seed: int = 42,
    properties: "tuple[RelationshipProperty, ...] | list[RelationshipProperty]" = (),
    max_degree_cap: int = 4096,
    allow_self_loops: bool = True,
) -> DataFrame:
    """Edge list (src long, dst long, <property columns...>) of a seeded
    random graph.  Nodes are ids [0, node_count); isolated nodes (possible
    under RANDOM's degree-0 draws) simply emit no rows — pass
    `nodes=spark.range(node_count)` to LinkGraph.from_edges to keep them.

    Determinism contract: the same (node_count, average_degree,
    distribution, seed, properties) produce the byte-identical edge list at
    any partitioning/parallelism — every value derives from md5 of
    "<id>:<k>:<tag>:<seed>" strings only.
    """
    dist = distribution.upper()
    if dist not in DISTRIBUTIONS:
        raise ValueError(
            f"unknown distribution {distribution!r}; one of {DISTRIBUTIONS}"
        )
    if average_degree < 1:
        raise ValueError("average_degree must be >= 1")

    df = spark.range(node_count).select(F.col("id").alias("src"))
    sid = F.col("src").cast("string")

    if dist == "UNIFORM":
        deg = F.lit(int(average_degree))
    elif dist == "RANDOM":
        # uniform integer in [0, 2*avg]: (2*avg + 1) equiprobable values,
        # mean exactly avg
        h = _hex6(F.concat_ws(":", sid, F.lit("deg"), F.lit(str(seed))))
        deg = F.pmod(h, F.lit(2 * int(average_degree) + 1))
    else:  # POWER_LAW
        u = _hex6(F.concat_ws(":", sid, F.lit("deg"), F.lit(str(seed)))) / _M6
        deg = F.greatest(
            F.lit(1),
            F.least(
                F.lit(int(max_degree_cap)),
                F.floor(
                    F.lit(average_degree / 2.0) * F.pow(u + F.lit(1e-9), F.lit(-0.5))
                ),
            ),
        )
    df = df.withColumn("_deg", deg.cast("int"))

    ks = F.sequence(F.lit(0), F.col("_deg") - 1)

    def target(k):
        h = _hex6(
            F.concat_ws(":", sid, k.cast("string"), F.lit("tgt"), F.lit(str(seed)))
        )
        t = F.pmod(h, F.lit(int(node_count)))
        if not allow_self_loops:
            # deterministic re-aim: shift by 1 (mod n) when the draw self-loops
            t = F.when(t == F.col("src"), F.pmod(t + 1, F.lit(int(node_count)))).otherwise(t)
        return t

    edges = df.where(F.col("_deg") > 0).select(
        "src", F.explode(F.transform(ks, lambda k: F.struct(k.alias("k"), target(k).alias("dst")))).alias("_e")
    ).select("src", F.col("_e.k").alias("_k"), F.col("_e.dst").alias("dst"))

    cols = [F.col("src"), F.col("dst")]
    for p in properties:
        if p.kind == "fixed":
            cols.append(F.lit(float(p.value)).alias(p.name))
        elif p.kind == "random":
            u = (
                _hex6(
                    F.concat_ws(
                        ":",
                        sid,
                        F.col("_k").cast("string"),
                        F.lit(p.name),
                        F.lit(str(seed)),
                    )
                )
                / _M6
            )
            cols.append((F.lit(float(p.lo)) + u * F.lit(float(p.hi - p.lo))).alias(p.name))
        else:
            raise ValueError(f"unknown property kind {p.kind!r}")
    return edges.select(*cols)
