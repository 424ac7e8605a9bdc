"""User-callable similarity scalar functions — the gds.similarity.* analog.

Reference: algo/src/main/java/org/neo4j/gds/similarity/SimilaritiesFunc.java
registers gds.similarity.{cosine, euclidean, euclideanDistance, jaccard,
overlap, pearson} as user-callable scalar functions over arbitrary number
lists.  Two surfaces here, both pure JVM (no Python UDFs anywhere):

* Column functions (`cosine(colA, colB)`, ...) built from Spark higher-order
  functions — usable in any DataFrame expression and fully codegen'd.
* SQL registration via `register_similarity_functions(spark)`: Spark 4 SQL
  scalar UDFs (`CREATE TEMPORARY FUNCTION ... RETURNS DOUBLE RETURN <expr>`),
  so `SELECT gds_similarity_jaccard(a, b) FROM t` works verbatim and the
  body inlines into the caller's plan (WholeStageCodegen, not a UDF call).

Semantics follow the reference (SimilaritiesFunc.java):
  jaccard/overlap treat lists as SETS of distinct values;
  euclidean = 1 / (1 + distance) similarity, euclideanDistance = raw L2;
  cosine/pearson require equal-length vectors (zip_with truncates to the
  shorter input, matching the reference's index-bounded loops);
  pearson is the population correlation (the reference divides by n).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _sum(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a, b) -> Column:
    """gds.similarity.cosine — dot(a,b) / (|a| * |b|)."""
    a, b = _c(a), _c(b)
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def euclidean_distance(a, b) -> Column:
    """gds.similarity.euclideanDistance — raw L2 distance."""
    a, b = _c(a), _c(b)
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def euclidean(a, b) -> Column:
    """gds.similarity.euclidean — 1 / (1 + L2 distance) similarity."""
    return F.lit(1.0) / (F.lit(1.0) + euclidean_distance(a, b))


def jaccard(a, b) -> Column:
    """gds.similarity.jaccard — |A ∩ B| / |A ∪ B| over distinct values."""
    a, b = _c(a), _c(b)
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def overlap(a, b) -> Column:
    """gds.similarity.overlap — |A ∩ B| / min(|A|, |B|) over distinct values."""
    a, b = _c(a), _c(b)
    inter = F.size(F.array_intersect(a, b)).cast("double")
    mn = F.least(F.size(F.array_distinct(a)), F.size(F.array_distinct(b))).cast(
        "double"
    )
    return F.when(mn > 0, inter / mn).otherwise(F.lit(0.0))


def pearson(a, b) -> Column:
    """gds.similarity.pearson — population Pearson correlation."""
    a, b = _c(a), _c(b)
    n = F.size(a).cast("double")
    ma = _sum(a) / n
    mb = _sum(b) / n
    cov = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - ma) * (y - mb)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    va = F.aggregate(
        F.transform(a, lambda x: (x - ma) * (x - ma)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vb = F.aggregate(
        F.transform(b, lambda x: (x - mb) * (x - mb)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return cov / (F.sqrt(va) * F.sqrt(vb))


# -- SQL surface ---------------------------------------------------------------

_SQL_BODIES = {
    "cosine": (
        "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, x) -> s + x)"
        " / (sqrt(aggregate(a, 0D, (s, x) -> s + x * x))"
        " * sqrt(aggregate(b, 0D, (s, x) -> s + x * x)))"
    ),
    "euclideanDistance": (
        "sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0D,"
        " (s, x) -> s + x))"
    ),
    "euclidean": (
        "1D / (1D + sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),"
        " 0D, (s, x) -> s + x)))"
    ),
    "jaccard": (
        "CASE WHEN size(array_union(a, b)) > 0 THEN"
        " CAST(size(array_intersect(a, b)) AS DOUBLE)"
        " / size(array_union(a, b)) ELSE 0D END"
    ),
    "overlap": (
        "CASE WHEN least(size(array_distinct(a)), size(array_distinct(b))) > 0"
        " THEN CAST(size(array_intersect(a, b)) AS DOUBLE)"
        " / least(size(array_distinct(a)), size(array_distinct(b)))"
        " ELSE 0D END"
    ),
    "pearson": (
        "(aggregate(zip_with(a, b, (x, y) ->"
        " (x - aggregate(a, 0D, (s, v) -> s + v) / size(a))"
        " * (y - aggregate(b, 0D, (s, v) -> s + v) / size(b))), 0D,"
        " (s, x) -> s + x))"
        " / (sqrt(aggregate(a, 0D, (s, v) ->"
        " s + (v - aggregate(a, 0D, (t, w) -> t + w) / size(a))"
        " * (v - aggregate(a, 0D, (t, w) -> t + w) / size(a))))"
        " * sqrt(aggregate(b, 0D, (s, v) ->"
        " s + (v - aggregate(b, 0D, (t, w) -> t + w) / size(b))"
        " * (v - aggregate(b, 0D, (t, w) -> t + w) / size(b)))))"
    ),
}


def register_similarity_functions(
    spark: SparkSession, prefix: str = "gds_similarity_"
) -> list[str]:
    """Register every gds.similarity.* analog as a SQL scalar function
    (`gds_similarity_cosine(a, b)`, ... — dots aren't legal in Spark SQL
    function names, so the namespace becomes a prefix).  Returns the
    registered names.  SQL UDF bodies are inlined by the analyzer, so calls
    stay inside whole-stage codegen — this is NOT a Python UDF path."""
    names = []
    for fname, body in _SQL_BODIES.items():
        qname = f"{prefix}{fname}"
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {qname}"
            f"(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE RETURN {body}"
        )
        names.append(qname)
    return names
