"""Scalar scalers (gds.alpha.scaleProperties, and PageRank's `scaler` option).

Reference formulas (algo-common/src/main/java/org/neo4j/gds/scaling/):
- NONE      x
- MAX       x / absMax                        (Max.java)
- MINMAX    (x - min) / (max - min)           (MinMax.java)
- MEAN      (x - avg) / (max - min)           (Mean.java)
- LOG       ln(x)                             (LogTransformer.java)
- STDSCORE  (x - avg) / populationStd         (StdScore.java)
- L1NORM    x / Σ|x|                          (L1Norm.java)
- L2NORM    x / sqrt(Σ x²)                    (L2Norm.java)
Degenerate statistics (|denominator| < 1e-15, CLOSE_TO_ZERO) scale everything
to 0 — each *.java `initialize` returns the ZERO scaler then.

One global aggregate + one projection; the aggregate row is broadcast into
the select, so this is a single pass at any scale.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CLOSE_TO_ZERO = 1e-15

VARIANTS = ("NONE", "MAX", "MINMAX", "MEAN", "LOG", "STDSCORE", "L1NORM", "L2NORM")


def exact_fixed_point_stats(df: DataFrame, col: str, decimals: int = 2) -> dict:
    """Deterministic scaler statistics for fixed-point-valued doubles.

    Float `sum`/`avg` aggregates depend on partition/merge order, so scale
    factors can move in the last ulp between runs and flip a downstream
    ROUND on a boundary value.  When the column holds values exact at
    `decimals` decimal places (money columns), aggregate over exact BIGINT
    units instead — integer sums are order-independent — then derive the
    double statistics from the exact integers with a fixed expression shape
    (must be mirrored verbatim by any SQL oracle replaying these stats).
    """
    import math

    q = 10 ** decimals
    u = F.round(F.col(col).cast("double") * q).cast("long")
    r = df.agg(
        F.min(u).alias("mn_u"),
        F.max(u).alias("mx_u"),
        F.count(u).alias("n"),
        F.sum(u).alias("s_u"),
        F.sum(u * u).alias("s2_u"),
        F.max(F.abs(u)).alias("amax_u"),
        F.sum(F.abs(u)).alias("l1_u"),
    ).collect()[0]
    n = r["n"]
    return {
        "mn": r["mn_u"] / q,
        "mx": r["mx_u"] / q,
        "range": (r["mx_u"] - r["mn_u"]) / q,
        "avg": (r["s_u"] / n) / q,
        "std": math.sqrt(r["s2_u"] / n - (r["s_u"] / n) * (r["s_u"] / n)) / q,
        "absmax": r["amax_u"] / q,
        "l1": r["l1_u"] / q,
        "l2": math.sqrt(r["s2_u"]) / q,
    }


def scale_property(
    df: DataFrame,
    col: str,
    variant: str,
    out_col: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    v = variant.upper()
    out_col = out_col or col
    x = F.col(col).cast("double")
    if v == "NONE":
        return df.withColumn(out_col, x)
    if v == "LOG":
        return df.withColumn(out_col, F.log(x))

    if stats is None:
        stats = df.agg(
            F.min(x).alias("mn"),
            F.max(x).alias("mx"),
            F.avg(x).alias("avg"),
            F.max(F.abs(x)).alias("absmax"),
            F.sum(F.abs(x)).alias("l1"),
            F.sqrt(F.sum(x * x)).alias("l2"),
            F.sqrt(F.avg(x * x) - F.avg(x) * F.avg(x)).alias("std"),  # population std
        ).collect()[0]
        stats = {k: stats[k] for k in ("mn", "mx", "avg", "absmax", "l1", "l2", "std")}
        stats["range"] = (stats["mx"] or 0) - (stats["mn"] or 0)

    def guarded(num, den):
        if den is None or abs(den) < CLOSE_TO_ZERO:
            return F.lit(0.0)
        return num / F.lit(float(den))

    if v == "MAX":
        expr = guarded(x, stats["absmax"])
    elif v == "MINMAX":
        expr = guarded(x - F.lit(stats["mn"]), stats["range"])
    elif v == "MEAN":
        expr = guarded(x - F.lit(stats["avg"]), stats["range"])
    elif v == "STDSCORE":
        expr = guarded(x - F.lit(stats["avg"]), stats["std"])
    elif v == "L1NORM":
        expr = guarded(x, stats["l1"])
    elif v == "L2NORM":
        expr = guarded(x, stats["l2"])
    else:
        raise ValueError(variant)
    return df.withColumn(out_col, expr)
