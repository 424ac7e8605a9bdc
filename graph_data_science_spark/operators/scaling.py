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


def scale_property(df: DataFrame, col: str, variant: str, out_col: str | None = None) -> DataFrame:
    v = variant.upper()
    out_col = out_col or col
    x = F.col(col).cast("double")
    if v == "NONE":
        return df.withColumn(out_col, x)
    if v == "LOG":
        return df.withColumn(out_col, F.log(x))

    stats = df.agg(
        F.min(x).alias("mn"),
        F.max(x).alias("mx"),
        F.avg(x).alias("avg"),
        F.max(F.abs(x)).alias("absmax"),
        F.sum(F.abs(x)).alias("l1"),
        F.sqrt(F.sum(x * x)).alias("l2"),
        F.sqrt(F.avg(x * x) - F.avg(x) * F.avg(x)).alias("std"),  # population std
    ).collect()[0]

    def guarded(num, den):
        if den is None or abs(den) < CLOSE_TO_ZERO:
            return F.lit(0.0)
        return num / F.lit(float(den))

    if v == "MAX":
        expr = guarded(x, stats["absmax"])
    elif v == "MINMAX":
        expr = guarded(x - F.lit(stats["mn"]), (stats["mx"] or 0) - (stats["mn"] or 0))
    elif v == "MEAN":
        expr = guarded(x - F.lit(stats["avg"]), (stats["mx"] or 0) - (stats["mn"] or 0))
    elif v == "STDSCORE":
        expr = guarded(x - F.lit(stats["avg"]), stats["std"])
    elif v == "L1NORM":
        expr = guarded(x, stats["l1"])
    elif v == "L2NORM":
        expr = guarded(x, stats["l2"])
    else:
        raise ValueError(variant)
    return df.withColumn(out_col, expr)
