"""ML pipelines: link prediction and node classification
(gds.beta.pipeline.linkPrediction / .nodeClassification).

Reference: pipeline/ + proc/machine-learning/ — multi-stage train/predict
pipelines (node-property steps -> feature assembly -> model train with a
model catalog).  SURVEY.md notes Spark ML already provides the ML layer; the
Spark-native pipeline is therefore a thin deterministic composition of this
repo's operators with `pyspark.ml`:

link prediction:
  1. split_relationships        (deterministic md5 holdout + negatives)
  2. node embeddings on TRAIN   (FastRP by default — no test leakage)
  3. pair features              (hadamard / l2 / concat of endpoint vectors,
                                 LinkFeatureStep analogs)
  4. LogisticRegression         (Spark ML), evaluated with areaUnderROC

node classification:
  1. node property steps        (any (id, features array) DataFrame)
  2. train/test split by md5 bucket (replayable)
  3. LogisticRegression one-vs-rest, accuracy on holdout
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graph_data_science_spark.operators.graph import LinkGraph


@dataclass
class LinkPredictionResult:
    model: object  # pyspark.ml LogisticRegressionModel
    test_auc: float
    train_rows: int
    test_rows: int
    metrics: list = field(default_factory=list)


def _strip_summary(model):
    """Round-trip the fitted model through ML persistence to drop its
    trainingSummary: the summary holds a SparkSession reference, and
    model.transform serializes the model into task closures — in a session
    that has ever run a DataFrame Observation, that SparkSession graph
    reaches the non-serializable ObservationManager and every downstream
    action dies with Task-not-serializable (PySpark 4.1 interaction).
    The persisted form is also the model-catalog analog of the reference's
    pipeline (models are stored, not held by reference)."""
    import atexit
    import shutil
    import tempfile

    from pyspark.ml.classification import LogisticRegressionModel

    d = tempfile.mkdtemp(prefix="gds-lr-model-")
    model.write().overwrite().save(d)
    loaded = LogisticRegressionModel.load(d)
    # the loaded model holds its coefficients in memory; the directory is no
    # longer needed, but executor tasks may still lazily read it during this
    # process's lifetime — clean at exit (mirrors SuperstepCheckpointer)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return loaded


def _pair_features(edges: DataFrame, emb: DataFrame, combiner: str) -> DataFrame:
    """(src, dst, label) x embeddings -> (features vector, label)."""
    e1 = emb.select(F.col("id").alias("src"), F.col("embedding").alias("v1"))
    e2 = emb.select(F.col("id").alias("dst"), F.col("embedding").alias("v2"))
    j = edges.join(e1, "src").join(e2, "dst")
    if combiner == "hadamard":
        feat = F.zip_with("v1", "v2", lambda a, b: a * b)
    elif combiner == "l2":
        feat = F.zip_with("v1", "v2", lambda a, b: (a - b) * (a - b))
    elif combiner == "concat":
        feat = F.concat("v1", "v2")
    else:
        raise ValueError(combiner)
    out = j.select("src", "dst", "label", feat.alias("farr"))
    from pyspark.ml.functions import array_to_vector

    return out.select(
        "src", "dst", F.col("label").cast("double").alias("label"),
        array_to_vector(F.col("farr").cast("array<double>")).alias("features"),
    )


def link_prediction_pipeline(
    graph: LinkGraph,
    holdout_fraction: float = 0.2,
    embedding_dimension: int = 64,
    combiner: str = "hadamard",
    seed: int = 42,
    embeddings: Optional[DataFrame] = None,
    degree_features: bool = False,
) -> LinkPredictionResult:
    """Train/test link prediction over the graph's edge structure.

    Embeddings are computed on the TRAIN graph only (the reference pipeline's
    node-property steps likewise run on the train split — no leakage).
    """
    from graph_data_science_spark.operators.walks import SplitConfig, split_relationships

    split = split_relationships(
        graph, SplitConfig(holdout_fraction=holdout_fraction, seed=seed)
    )
    train_g = LinkGraph(nodes=graph.nodes, edges=split["train"].withColumn("weight", F.lit(1.0)))

    if embeddings is None:
        from graph_data_science_spark.operators.fastrp import FastRPConfig, fastrp

        embeddings = fastrp(
            train_g, FastRPConfig(embedding_dimension=embedding_dimension, seed=seed)
        ).embeddings
    if degree_features:
        # node-property step analog (gds degree centrality as a pipeline
        # feature): append log1p in/out degree of the TRAIN graph — the
        # normalized random-projection embedding deliberately discards scale,
        # but degree is the dominant link signal in power-law graphs.
        # Computed on the train split only (no test leakage).
        outd = (
            train_g.edges.groupBy("src").agg(F.count(F.lit(1)).alias("_od"))
            .withColumnRenamed("src", "id")
        )
        ind = (
            train_g.edges.groupBy("dst").agg(F.count(F.lit(1)).alias("_id"))
            .withColumnRenamed("dst", "id")
        )
        embeddings = (
            embeddings.join(outd, "id", "left")
            .join(ind, "id", "left")
            .select(
                "id",
                F.concat(
                    F.col("embedding").cast("array<double>"),
                    F.array(
                        F.log1p(F.coalesce(F.col("_od"), F.lit(0)).cast("double")),
                        F.log1p(F.coalesce(F.col("_id"), F.lit(0)).cast("double")),
                    ),
                ).alias("embedding"),
            )
        )
    emb = embeddings.cache()

    # train pairs: train positives + an equal-sized negative sample disjoint
    # from ALL true edges; test pairs: held-out positives + test negatives
    train_pos = split["train"].select("src", "dst").withColumn("label", F.lit(1))
    test_pos = split["test_pos"].select("src", "dst").withColumn("label", F.lit(1))
    test_neg = split["test_neg"].select("src", "dst").withColumn("label", F.lit(0))
    # negatives for training: reuse the seeded sampler with a shifted seed
    from graph_data_science_spark.operators.walks import split_relationships as _sr
    from graph_data_science_spark.operators.walks import SplitConfig as _SC

    neg2 = _sr(graph, _SC(holdout_fraction=holdout_fraction, seed=seed + 1))["test_neg"]
    # the shifted-seed sampler draws from the same non-edge space as the
    # evaluation negatives — exclude any pair that appears in the test set
    # (either side), else train rows leak into evaluation and inflate AUC
    train_neg = (
        neg2.select("src", "dst")
        .join(test_neg.select("src", "dst"), ["src", "dst"], "left_anti")
        .join(test_pos.select("src", "dst"), ["src", "dst"], "left_anti")
        .withColumn("label", F.lit(0))
    )

    train = _pair_features(train_pos.unionByName(train_neg), emb, combiner)
    test = _pair_features(test_pos.unionByName(test_neg), emb, combiner)

    from pyspark.ml.classification import LogisticRegression

    lr = LogisticRegression(maxIter=30, featuresCol="features", labelCol="label")
    model = _strip_summary(lr.fit(train))
    scored = model.transform(test)
    auc = _auc(scored)
    res = LinkPredictionResult(
        model=model,
        test_auc=float(auc),
        train_rows=train.count(),
        test_rows=test.count(),
    )
    emb.unpersist()
    return res


def _auc(scored: DataFrame) -> float:
    """Area under ROC via the Mann-Whitney rank-sum identity, computed with
    DataFrame ops (mid-ranks for ties).  Exact and fully distributed: a
    global rank is assembled as range-partition by score + per-partition
    row_number + a broadcast of the K per-partition counts as offsets —
    never a single-partition global Window, so a web-scale holdout ranks in
    parallel.  Range partitioning places equal scores in one partition and
    orders partitions by score, so offset ranks form a valid global
    permutation and per-score rank averages are exact mid-ranks.  Avoids the
    RDD-based BinaryClassificationEvaluator, whose task closures can trip
    over live session state (ObservationManager) when Observation-heavy jobs
    ran earlier in the same session."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.sql.window import Window

    spark = scored.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    s = scored.select(
        vector_to_array(F.col("probability"))[1].alias("p"),
        F.col("label").cast("double").alias("label"),
    )
    part = (
        s.repartitionByRange(n_part, "p")
        .withColumn("_pid", F.spark_partition_id())
        .cache()
    )
    # K partition counts -> cumulative offsets (K is tiny; driver-side scan)
    cnts = {
        r["_pid"]: r["count"]
        for r in part.groupBy("_pid").count().collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(cnts):
        offsets[pid] = acc
        acc += cnts[pid]
    off_df = F.broadcast(
        spark.createDataFrame(
            [(pid, off) for pid, off in offsets.items()], "_pid int, _off long"
        )
    )
    w = Window.partitionBy("_pid").orderBy("p")
    ranked = (
        part.withColumn("_rn", F.row_number().over(w))
        .join(off_df, "_pid")
        .withColumn("grn", F.col("_rn") + F.col("_off"))
    )
    grp = ranked.groupBy("p").agg(
        F.avg("grn").alias("mr"),
        F.sum((F.col("label") == 1.0).cast("long")).alias("pos"),
        F.count(F.lit(1)).alias("c"),
    )
    row = grp.agg(
        F.sum(F.col("pos") * F.col("mr")).alias("rpos"),
        F.sum("pos").alias("npos"),
        F.sum(F.col("c") - F.col("pos")).alias("nneg"),
    ).collect()[0]
    part.unpersist()
    npos, nneg = int(row["npos"] or 0), int(row["nneg"] or 0)
    if npos == 0 or nneg == 0:
        return 0.5
    return (float(row["rpos"]) - npos * (npos + 1) / 2.0) / (npos * nneg)


@dataclass
class NodeClassificationResult:
    model: object
    test_accuracy: float
    train_rows: int
    test_rows: int


def node_classification_pipeline(
    features: DataFrame,
    id_col: str = "id",
    features_col: str = "features",
    label_col: str = "label",
    holdout_fraction: float = 0.2,
    seed: int = 42,
) -> NodeClassificationResult:
    """features: (id, features array<numeric>, label).  Deterministic
    md5-bucket holdout, LogisticRegression, holdout accuracy."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    df = features.select(
        F.col(id_col).alias("id"),
        array_to_vector(F.col(features_col).cast("array<double>")).alias("features"),
        F.col(label_col).cast("double").alias("label"),
    )
    bucket = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col("id"), F.lit(str(seed)))), 1, 6), 16, 10
    ).cast("long")
    cut = int(holdout_fraction * 16**6)
    test = df.where(bucket < cut).cache()
    train = df.where(bucket >= cut).cache()

    lr = LogisticRegression(maxIter=30)
    model = _strip_summary(lr.fit(train))
    pred = model.transform(test)
    row = pred.agg(
        F.avg((F.col("prediction") == F.col("label")).cast("double")).alias("acc")
    ).collect()[0]
    acc = float(row["acc"] or 0.0)
    out = NodeClassificationResult(
        model=model,
        test_accuracy=float(acc),
        train_rows=train.count(),
        test_rows=test.count(),
    )
    train.unpersist()
    test.unpersist()
    return out
