"""Persisted IVF-Flat vector index: the similarity-search sink/source.

The in-memory ANN ops (embed.py) rebuild their inverted lists per query;
a pipeline that serves many queries builds the index ONCE and stores it
as a table. `IvfIndex` is that artifact:

    path/_index.json           {n_centroids, dim, n_vectors, trained}
    path/centroids/            (centroid_id, _cent)       one small file
    path/lists/centroid_id=N/  (id, vec)     parquet, partition per list

Scale design: the lists relation is PARTITIONED BY centroid_id, so a
probe query reads only its nprobe lists — with Spark's dynamic
partition pruning the broadcast of (probe × centroid_id) prunes the
scan at runtime to nprobe/n_centroids of the data, the disk analog of
FAISS's IVF list seek. Search reuses `embed.search_ivf_lists`, so a
persisted index answers bit-identically to the in-memory build (one
shared DuckDB oracle covers both).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsdb_spark.pipeline import embed as E


class IvfIndex:
    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta

    # ---------------- build / open ----------------

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        embeddings: DataFrame,
        path: str,
        n_centroids: int = 16,
        kmeans_iters: int = 0,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfIndex":
        """Train (optional) + assign + persist. `kmeans_iters=0` uses the
        deterministic lowest-id quantizer; >0 runs the integer-grid Lloyd
        iterations (kmeans_centroids) — both oracle-reproducible."""
        if kmeans_iters > 0:
            cent = E.kmeans_centroids(
                embeddings, n_centroids, kmeans_iters, id_col, vec_col
            )
        else:
            cent = E._default_centroids(embeddings, n_centroids, id_col, vec_col)
        cent.repartition(1).write.mode("overwrite").parquet(f"{path}/centroids")
        lists = E.ivf_assign(embeddings, n_centroids, id_col, vec_col, cent)
        (
            lists.repartition("centroid_id")
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(f"{path}/lists")
        )
        first = embeddings.select(F.size(F.col(vec_col)).alias("d")).first()
        meta = {
            "n_centroids": n_centroids,
            "trained": kmeans_iters > 0,
            "dim": 0 if first is None else int(first["d"]),
            "n_vectors": lists.count(),
        }
        with open(os.path.join(path, "_index.json"), "w") as f:
            json.dump(meta, f)
        return cls(spark, path, meta)

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "IvfIndex":
        with open(os.path.join(path, "_index.json")) as f:
            return cls(spark, path, json.load(f))

    # ---------------- read surface ----------------

    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/centroids")

    def lists(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/lists")

    def search(
        self,
        probes: DataFrame,
        k: int = 3,
        nprobe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Top-k over the persisted lists: (probe_id, neighbor_id, rank,
        cos_bp) — the equi-join on centroid_id over the partitioned scan
        is what dynamic partition pruning narrows to nprobe lists."""
        return E.search_ivf_lists(
            self.lists(), self.centroids(), probes, k, nprobe, id_col, vec_col
        )
