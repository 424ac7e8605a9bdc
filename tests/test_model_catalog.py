"""ModelCatalog: named save/load/list/exists/drop for trained models with
save -> load -> predict parity (reference: open-model-catalog/src/main/java/
org/neo4j/gds/core/model/OpenModelCatalog.java, gds.model.store)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph
from graph_data_science_spark.sources.models import ModelCatalog


def _ring_graph(spark, n=40):
    edges = [(i, (i + 1) % n) for i in range(n)] + [(i, (i + 7) % n) for i in range(n)]
    return LinkGraph.from_edges(spark, edges)


def test_graphsage_save_load_predict_parity(spark, tmp_path):
    from graph_data_science_spark.operators.graphsage import (
        GraphSageConfig,
        degree_features,
        graphsage_embeddings,
        graphsage_train,
    )

    g = _ring_graph(spark)
    feats = degree_features(g, dim=4)
    res = graphsage_train(
        g,
        feats,
        GraphSageConfig(
            embedding_dimension=8, sample_sizes=(3,), epochs=1, max_train_nodes=16
        ),
    )
    cat = ModelCatalog(spark, str(tmp_path / "models"))
    cat.save("sage1", model=res.model, config={"dim": 8})

    loaded = cat.load("sage1")
    assert loaded.kind == "graphsage"
    assert loaded.model.sample_sizes == res.model.sample_sizes
    np.testing.assert_allclose(
        loaded.model.weight_arrays()[0], res.model.weight_arrays()[0]
    )
    # predict parity: embeddings from the loaded model == from the live model
    a = {
        r["id"]: list(r["embedding"])
        for r in graphsage_embeddings(g, feats, res.model).collect()
    }
    b = {
        r["id"]: list(r["embedding"])
        for r in graphsage_embeddings(g, feats, loaded.model).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-12)


def test_spark_ml_model_save_load_transform_parity(spark, tmp_path):
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors

    df = spark.createDataFrame(
        [(Vectors.dense([float(i), float(i % 3)]), float(i % 2)) for i in range(40)],
        ["features", "label"],
    )
    model = LogisticRegression(maxIter=5).fit(df)
    cat = ModelCatalog(spark, str(tmp_path / "models"))
    mf = cat.save("lr1", model=model, config={"maxIter": 5})
    assert mf["kind"] == "spark_ml" and "LogisticRegressionModel" in mf["ml_class"]

    loaded = cat.load("lr1")
    # Spark 4.1 hazard: transform() on the freshly-FIT model serializes its
    # trainingSummary -> SparkSession -> ObservationManager into the task
    # closure, which blows up once any observe() has run in the session
    # (production paths strip the summary via pipelines._strip_summary).
    # Parity is therefore checked as: catalog-loaded model's distributed
    # predictions == driver-side closed-form scoring from the in-memory
    # model's coefficients.
    w = np.asarray(model.coefficients)
    b0 = float(model.intercept)
    x = np.array([[float(i), float(i % 3)] for i in range(40)])
    want = (1.0 / (1.0 + np.exp(-(x @ w + b0))) > 0.5).astype(float).tolist()
    got = [
        r["prediction"]
        for r in loaded.model.transform(df).select("prediction").collect()
    ]
    assert got == want
    np.testing.assert_allclose(w, np.asarray(loaded.model.coefficients))
    np.testing.assert_allclose(b0, float(loaded.model.intercept))


def test_embeddings_only_entry_roundtrip(spark, tmp_path):
    from graph_data_science_spark.operators.fastrp import FastRPConfig, fastrp

    g = _ring_graph(spark)
    emb = fastrp(g, FastRPConfig(embedding_dimension=8, iteration_weights=[1.0]))
    cat = ModelCatalog(spark, str(tmp_path / "models"))
    cat.save("frp", embeddings=emb.embeddings, config={"dim": 8})

    loaded = cat.load("frp")
    assert loaded.kind == "embeddings" and loaded.model is None
    a = {r["id"]: list(r["embedding"]) for r in emb.embeddings.collect()}
    b = {r["id"]: list(r["embedding"]) for r in loaded.embeddings.collect()}
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(a[k], b[k])


def test_list_exists_drop_and_overwrite(spark, tmp_path):
    cat = ModelCatalog(spark, str(tmp_path / "models"))
    assert not cat.exists("m")
    with pytest.raises(KeyError):
        cat.load("m")
    cat.save("m", model={"w": [1, 2, 3]})
    cat.save("m2", model={"w": [9]})
    assert cat.exists("m") and {e["name"] for e in cat.list_models()} == {"m", "m2"}
    # overwrite is an atomic snapshot swap: new payload fully replaces old
    cat.save("m", model={"w": [4, 5]})
    assert cat.load("m").model == {"w": [4, 5]}
    assert cat.drop("m") and not cat.exists("m")
    assert not cat.drop("m")
    assert {e["name"] for e in cat.list_models()} == {"m2"}


def test_rejects_unsupported_payload(spark, tmp_path):
    cat = ModelCatalog(spark, str(tmp_path / "models"))
    with pytest.raises(ValueError):
        cat.save("empty")
    with pytest.raises(TypeError):
        cat.save("bad", model=object())
