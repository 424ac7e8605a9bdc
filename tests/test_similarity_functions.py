"""gds.similarity.* scalar functions (SimilaritiesFunc.java analog): Column
surface + SQL registration, checked against the reference's documented
examples and numpy."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark import functions as gfn


@pytest.fixture()
def pairs(spark):
    return spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
            (2, [3.0, 8.0, 7.0, 5.0, 2.0, 9.0], [10.0, 8.0, 6.0, 6.0, 4.0, 5.0]),
            (3, [1.0, 2.0], [4.0, 6.0]),
            (4, [1.0, 2.0, 3.0], [1.0, 2.0, 4.0, 5.0]),
            (5, [1.0, 2.0, 3.0], [3.0, 2.0, 1.0]),
        ],
        "pid int, a array<double>, b array<double>",
    )


def _one(df, pid, col):
    return df.where(F.col("pid") == pid).select(col).first()[0]


def test_column_functions_match_reference_examples(spark, pairs):
    df = pairs.select(
        "pid",
        gfn.cosine("a", "b").alias("cos"),
        gfn.euclidean_distance("a", "b").alias("dist"),
        gfn.euclidean("a", "b").alias("euc"),
        gfn.jaccard("a", "b").alias("jac"),
        gfn.overlap("a", "b").alias("ovl"),
        gfn.pearson("a", "b").alias("prs"),
    )
    # identical vectors
    assert abs(_one(df, 1, "cos") - 1.0) < 1e-12
    assert abs(_one(df, 1, "prs") - 1.0) < 1e-12
    assert _one(df, 1, "dist") == 0.0
    # the gds.similarity.cosine docs example vectors
    a = np.array([3.0, 8, 7, 5, 2, 9])
    b = np.array([10.0, 8, 6, 6, 4, 5])
    assert abs(_one(df, 2, "cos") - a.dot(b) / (np.linalg.norm(a) * np.linalg.norm(b))) < 1e-12
    assert abs(_one(df, 2, "prs") - np.corrcoef(a, b)[0, 1]) < 1e-12
    # euclideanDistance([1,2],[4,6]) = 5; euclidean = 1/6
    assert abs(_one(df, 3, "dist") - 5.0) < 1e-12
    assert abs(_one(df, 3, "euc") - 1.0 / 6.0) < 1e-12
    # jaccard([1,2,3],[1,2,4,5]) = 2/5; overlap = 2/min(3,4) = 2/3
    assert abs(_one(df, 4, "jac") - 0.4) < 1e-12
    assert abs(_one(df, 4, "ovl") - 2.0 / 3.0) < 1e-12
    # perfectly anti-correlated
    assert abs(_one(df, 5, "prs") + 1.0) < 1e-12


def test_sql_registration_matches_column_surface(spark, pairs):
    names = gfn.register_similarity_functions(spark)
    assert set(names) == {
        "gds_similarity_cosine",
        "gds_similarity_euclidean",
        "gds_similarity_euclideanDistance",
        "gds_similarity_jaccard",
        "gds_similarity_overlap",
        "gds_similarity_pearson",
    }
    pairs.createOrReplaceTempView("simpairs")
    got = spark.sql(
        """SELECT pid,
                  gds_similarity_cosine(a, b) AS cos,
                  gds_similarity_euclideanDistance(a, b) AS dist,
                  gds_similarity_euclidean(a, b) AS euc,
                  gds_similarity_jaccard(a, b) AS jac,
                  gds_similarity_overlap(a, b) AS ovl,
                  gds_similarity_pearson(a, b) AS prs
           FROM simpairs"""
    ).toPandas().set_index("pid")
    want = pairs.select(
        "pid",
        gfn.cosine("a", "b").alias("cos"),
        gfn.euclidean_distance("a", "b").alias("dist"),
        gfn.euclidean("a", "b").alias("euc"),
        gfn.jaccard("a", "b").alias("jac"),
        gfn.overlap("a", "b").alias("ovl"),
        gfn.pearson("a", "b").alias("prs"),
    ).toPandas().set_index("pid")
    for c in want.columns:
        np.testing.assert_allclose(got[c], want[c], rtol=1e-12)


def test_random_vectors_match_numpy(spark):
    rng = np.random.RandomState(11)
    rows = [
        (i, [float(x) for x in rng.uniform(-3, 3, 12)], [float(x) for x in rng.uniform(-3, 3, 12)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "pid int, a array<double>, b array<double>")
    got = df.select(
        "pid", gfn.cosine("a", "b").alias("cos"), gfn.pearson("a", "b").alias("prs"),
        gfn.euclidean_distance("a", "b").alias("dist"),
    ).toPandas().set_index("pid").sort_index()
    for i, a, b in rows:
        a, b = np.array(a), np.array(b)
        assert abs(got.loc[i, "cos"] - a.dot(b) / (np.linalg.norm(a) * np.linalg.norm(b))) < 1e-12
        assert abs(got.loc[i, "prs"] - np.corrcoef(a, b)[0, 1]) < 1e-10
        assert abs(got.loc[i, "dist"] - np.linalg.norm(a - b)) < 1e-12
