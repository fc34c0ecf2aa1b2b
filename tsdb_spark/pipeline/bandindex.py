"""Persisted MinHash band index: the cross-corpus dedup sink/source.

`docs_cross_dedup` (pipeline/queries.py) banding the EXISTING corpus per
incoming batch recomputes the whole old-side sketch every time; a
steady-state ingest pipeline builds the old side ONCE and stores it.
`BandIndex` is that artifact:

    path/_index.json          {n_bands, rows_per_band, k, n_docs,
                               max_doc_id}
    path/bands/band_id=N/     (band_key, doc_id) parquet, one
                              partition per band, band_key-sorted files

Scale design: the bands relation is PARTITIONED BY band_id and sorted
by band_key inside each partition, so a probe — the (band_id, band_key)
equi-join of an incoming batch's bands against the index — reads
band-partition-local data with Spark's dynamic partition pruning
carrying a band_id filter into the scan (asserted in
tests/test_plans.py), and row-group min/max stats prune on band_key.
The old side is NEVER re-sketched: a batch costs bands(batch) join
index + candidate-only re-shingle, and `append` folds the batch's own
bands in afterward (incremental, partition-aligned appends — no
rewrite). This is the 100 TB shape the cross-dedup docstring promises:
the quadratic is bounded by bucket collisions, the index amortizes the
sketch cost, and freshness is explicit (`n_docs`/`max_doc_id` in the
meta, bumped per append).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsdb_spark.pipeline import dedup as D

__all__ = ["BandIndex"]


class BandIndex:
    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self.spark = spark
        self.path = path
        self.meta = meta

    # ---------------- build / open ----------------

    @classmethod
    def build(
        cls,
        spark: SparkSession,
        corpus: DataFrame,
        path: str,
        n_bands: int = D.N_BANDS,
        rows_per_band: int = D.ROWS_PER_BAND,
        k: int = 3,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> "BandIndex":
        """Sketch the corpus once (lean signatures — no shingle carry)
        and persist its band rows partitioned by band_id."""
        sigs = D.minhash_signatures(
            corpus,
            n_hashes=n_bands * rows_per_band,
            k=k,
            text_col=text_col,
            id_col=id_col,
            keep_shingles=False,
        )
        bands = D.band_rows(sigs, n_bands, rows_per_band).withColumnRenamed(
            "id", "doc_id"
        )
        (
            bands.repartition("band_id")
            .sortWithinPartitions("band_id", "band_key")
            .write.mode("overwrite")
            .partitionBy("band_id")
            .parquet(f"{path}/bands")
        )
        stats = corpus.agg(
            F.count("*").alias("n"), F.max(id_col).alias("mx")
        ).first()
        meta = {
            "n_bands": n_bands,
            "rows_per_band": rows_per_band,
            "k": k,
            "n_docs": int(stats["n"]),
            "max_doc_id": int(stats["mx"]) if stats["mx"] is not None else -1,
        }
        with open(os.path.join(path, "_index.json"), "w") as f:
            json.dump(meta, f)
        return cls(spark, path, meta)

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "BandIndex":
        with open(os.path.join(path, "_index.json")) as f:
            return cls(spark, path, json.load(f))

    # ---------------- read surface ----------------

    def bands(self) -> DataFrame:
        """(doc_id, band_key, band_id) over the partitioned table."""
        return self.spark.read.schema(
            "band_key LONG, doc_id LONG, band_id INT"
        ).parquet(f"{self.path}/bands")

    def _new_bands(self, new_corpus: DataFrame, text_col: str, id_col: str):
        sigs = D.minhash_signatures(
            new_corpus,
            n_hashes=self.meta["n_bands"] * self.meta["rows_per_band"],
            k=self.meta["k"],
            text_col=text_col,
            id_col=id_col,
            keep_shingles=False,
        )
        return D.band_rows(
            sigs, self.meta["n_bands"], self.meta["rows_per_band"]
        ).withColumnRenamed("id", "doc_id")

    #: batch band-row ceiling for the broadcast probe plan: above this
    #: the batch side is too big to ship to every executor (row ≈ 16 B
    #: payload + struct overhead; 4M rows ≈ low hundreds of MB
    #: materialized) and the probe falls back to a shuffle equi-join
    BROADCAST_ROW_LIMIT = 4_000_000

    def probe(
        self,
        new_corpus: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
        max_bucket: int | None = None,
        broadcast_row_limit: int | None = None,
        batch_rows: int | None = None,
    ) -> DataFrame:
        """Candidate pairs (new_id, old_id) of an incoming batch
        against the indexed corpus: sketch ONLY the batch and equi-join
        its band rows on (band_id, band_key) — the partition column
        leads the join so dynamic partition pruning pushes a band_id
        filter into the index scan. Batches whose band-row count
        (docs × n_bands, counted before sketching) fits
        `broadcast_row_limit` broadcast; larger ingests fall back to a
        plain shuffle equi-join on the same keys (both plans asserted
        in tests/test_plans.py). Callers that already know the batch
        size pass `batch_rows` and the plan choice costs nothing; when
        it must be counted, the incoming corpus is persisted first so
        the count and the join share one materialization of the
        batch's upstream lineage (an expensive incoming pipeline would
        otherwise run twice; persisting the CORPUS rather than the
        sketched band frame keeps the broadcast side a plain plan, so
        dynamic partition pruning still inserts — DPP will not build
        its pruning subquery over an InMemoryRelation build side). DPP is a broadcast-path optimization
        by design: Spark only reuses a broadcast for pruning
        (reuseBroadcastOnly), and a batch big enough to overflow the
        broadcast ceiling populates every band anyway, so there is
        nothing left to prune — the shuffle plan reads each band
        partition exactly once. `max_bucket` drops degenerate index
        buckets before the join (the same skew guard as
        lsh_candidate_pairs)."""
        limit = (
            self.BROADCAST_ROW_LIMIT
            if broadcast_row_limit is None
            else broadcast_row_limit
        )
        if batch_rows is None:
            from pyspark.storagelevel import StorageLevel

            new_corpus = new_corpus.persist(StorageLevel.MEMORY_AND_DISK)
            batch_rows = new_corpus.count()
        batch_band_rows = batch_rows * self.meta["n_bands"]
        new_b = self._new_bands(new_corpus, text_col, id_col)
        old_b = self.bands()
        if max_bucket is not None:
            from pyspark.sql import Window

            w = Window.partitionBy("band_id", "band_key")
            old_b = (
                old_b.withColumn("_c", F.count("*").over(w))
                .filter(F.col("_c") <= max_bucket)
                .drop("_c")
            )
        left = new_b.withColumnRenamed("doc_id", "new_id")
        if batch_band_rows <= limit:
            left = F.broadcast(left)
        return (
            left.join(
                old_b.withColumnRenamed("doc_id", "old_id"),
                ["band_id", "band_key"],
            )
            .select("new_id", "old_id")
            .distinct()
        )

    # ---------------- incremental append ----------------

    def append(
        self,
        new_corpus: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> None:
        """Fold an ingested batch's bands into the index: partition-
        aligned parquet appends (no rewrite of existing band files) +
        a meta bump so freshness is observable."""
        bands = self._new_bands(new_corpus, text_col, id_col)
        (
            bands.repartition("band_id")
            .sortWithinPartitions("band_id", "band_key")
            .write.mode("append")
            .partitionBy("band_id")
            .parquet(f"{self.path}/bands")
        )
        stats = new_corpus.agg(
            F.count("*").alias("n"), F.max(id_col).alias("mx")
        ).first()
        self.meta["n_docs"] += int(stats["n"])
        if stats["mx"] is not None:
            self.meta["max_doc_id"] = max(
                self.meta["max_doc_id"], int(stats["mx"])
            )
        with open(os.path.join(self.path, "_index.json"), "w") as f:
            json.dump(self.meta, f)
