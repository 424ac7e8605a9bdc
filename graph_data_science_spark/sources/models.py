"""ModelCatalog — named, durable trained-model storage (the model catalog
analog).

Reference: model-catalog-api/src/main/java/org/neo4j/gds/core/model/Model.java
and open-model-catalog/src/main/java/org/neo4j/gds/core/model/
OpenModelCatalog.java keep trained models (GraphSAGE weights, pipeline
models) in a named process-global catalog with get/set/exists/drop/list and
publish them for reuse; gds.model.store persists them to disk.  Here the unit
of persistence is a model namespace directory holding:

  manifest.json   — name, kind, config, creation time, schema hints
  model.json      — plain-data payloads (GraphSageModel weights, any dict)
  ml_model/       — pyspark.ml writable models via their own ML persistence
  embeddings/     — an optional parquet table (FastRP / node2vec / GraphSAGE
                    output embeddings published alongside the model)

Every save is an atomic snapshot commit via sources/atomic.py (staged version
dir + symlink swap), so a crash mid-save leaves the previous model readable —
the same durability story as GraphCatalog.save.  On a cluster the staging dir
lives on object storage and the pointer flip is the table catalog's metadata
swap; nothing here assumes a local disk beyond POSIX rename.
"""

from __future__ import annotations

import dataclasses
import importlib
import json
import os
import shutil
import time
from dataclasses import dataclass
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "manifest.json"
MODEL_JSON = "model.json"
ML_DIR = "ml_model"
EMB_DIR = "embeddings"


@dataclass
class LoadedModel:
    name: str
    kind: str  # "graphsage" | "spark_ml" | "data" | "embeddings"
    model: Any  # GraphSageModel | pyspark.ml model | dict | None
    embeddings: Optional[DataFrame]
    manifest: dict


def _is_graphsage(model: Any) -> bool:
    return type(model).__name__ == "GraphSageModel"


def _is_spark_ml(model: Any) -> bool:
    return hasattr(model, "write") and hasattr(type(model), "load")


class ModelCatalog:
    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base_path = base_path
        os.makedirs(base_path, exist_ok=True)

    def _ns(self, name: str) -> str:
        return os.path.join(self.base_path, name)

    # -- ModelCatalog.set / gds.model.store -----------------------------------
    def save(
        self,
        name: str,
        model: Any = None,
        embeddings: Optional[DataFrame] = None,
        config: Optional[dict] = None,
    ) -> dict:
        """Store a trained model (and/or its embedding table) under `name`.

        Accepted model payloads:
          * GraphSageModel — plain-data dataclass, stored as JSON
          * any pyspark.ml model with write()/load() — stored via ML
            persistence, class path recorded for load
          * any JSON-serializable dict — stored verbatim ("data" kind)
          * None with embeddings — an embeddings-only entry (FastRP/node2vec)
        """
        if model is None and embeddings is None:
            raise ValueError("save needs a model, embeddings, or both")
        if _is_graphsage(model):
            kind = "graphsage"
        elif model is None:
            kind = "embeddings"
        elif _is_spark_ml(model):
            kind = "spark_ml"
        elif isinstance(model, dict):
            kind = "data"
        else:
            raise TypeError(
                f"unsupported model payload {type(model).__name__}: expected "
                "GraphSageModel, a pyspark.ml model, a dict, or embeddings only"
            )

        manifest = {
            "name": name,
            "kind": kind,
            "config": config or {},
            "created_at": time.time(),
            "has_embeddings": embeddings is not None,
            "embedding_columns": embeddings.columns if embeddings is not None else None,
        }
        if kind == "spark_ml":
            cls = type(model)
            manifest["ml_class"] = f"{cls.__module__}.{cls.__name__}"

        def populate(staged: str) -> None:
            if kind == "graphsage":
                with open(os.path.join(staged, MODEL_JSON), "w") as f:
                    json.dump(dataclasses.asdict(model), f)
            elif kind == "data":
                with open(os.path.join(staged, MODEL_JSON), "w") as f:
                    json.dump(model, f)
            elif kind == "spark_ml":
                model.write().overwrite().save(os.path.join(staged, ML_DIR))
            if embeddings is not None:
                embeddings.write.mode("overwrite").parquet(
                    os.path.join(staged, EMB_DIR)
                )
            with open(os.path.join(staged, MANIFEST), "w") as f:
                json.dump(manifest, f)

        from graph_data_science_spark.sources.atomic import atomic_publish_dir

        atomic_publish_dir(self._ns(name), populate)
        return manifest

    # -- ModelCatalog.get ------------------------------------------------------
    def load(self, name: str) -> LoadedModel:
        ns = self._ns(name)
        if not self.exists(name):
            raise KeyError(f"model {name!r} not in catalog at {self.base_path}")
        with open(os.path.join(ns, MANIFEST)) as f:
            manifest = json.load(f)
        kind = manifest["kind"]
        model: Any = None
        if kind == "graphsage":
            from graph_data_science_spark.operators.graphsage import GraphSageModel

            with open(os.path.join(ns, MODEL_JSON)) as f:
                payload = json.load(f)
            payload["sample_sizes"] = tuple(payload["sample_sizes"])
            model = GraphSageModel(**payload)
        elif kind == "data":
            with open(os.path.join(ns, MODEL_JSON)) as f:
                model = json.load(f)
        elif kind == "spark_ml":
            mod, _, cls_name = manifest["ml_class"].rpartition(".")
            cls = getattr(importlib.import_module(mod), cls_name)
            # ml persistence resolves paths through the Hadoop FS layer,
            # which does not follow the published symlink the way the local
            # fs does — hand it the real version dir
            model = cls.load(os.path.realpath(os.path.join(ns, ML_DIR)))
        emb = None
        if manifest.get("has_embeddings"):
            emb = self.spark.read.parquet(os.path.join(ns, EMB_DIR))
        return LoadedModel(name=name, kind=kind, model=model, embeddings=emb, manifest=manifest)

    # -- ModelCatalog.list / exists / drop --------------------------------------
    def list_models(self) -> list[dict]:
        out = []
        for d in sorted(os.listdir(self.base_path)):
            mf = os.path.join(self.base_path, d, MANIFEST)
            if os.path.exists(mf):
                with open(mf) as f:
                    out.append(json.load(f))
        return out

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self._ns(name), MANIFEST))

    def drop(self, name: str) -> bool:
        ns = self._ns(name)
        if not self.exists(name):
            return False
        from graph_data_science_spark.sources.atomic import versions_root

        if os.path.islink(ns):
            os.unlink(ns)
        else:
            shutil.rmtree(ns, ignore_errors=True)
        shutil.rmtree(versions_root(ns), ignore_errors=True)
        return True
