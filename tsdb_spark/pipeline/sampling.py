"""Corpus selection operators: deterministic stratified sampling and
benchmark decontamination.

Both are staples of a training-data pipeline that the dedup/quality
modules don't cover:

- stratified_sample: mix a corpus by source with per-stratum rates,
  decided by a keyed hash of the document id — deterministic, stateless,
  and embarrassingly parallel (a map-only filter; re-running on any
  subset of the data selects the same documents, which is what makes
  hash-sampling the standard over rand()-sampling at scale).
- decontaminate: flag corpus documents that share a k-token shingle with
  a benchmark/probe set (test-set leakage detection). The probe side is
  tiny and broadcasts; the corpus side explodes to (doc, shingle-hash)
  rows and the overlap is one equi-join — never a quadratic scan.

Integer-only arithmetic throughout (hash keys, basis-point rates,
counts) so a SQL oracle reproduces every row bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tsdb_spark.pipeline.common import hash64
from tsdb_spark.pipeline.dedup import shingles_of_tokens
from tsdb_spark.pipeline.text import tokens_expr


def sample_key_expr(id_col: Column, seed: str = "strat") -> Column:
    """Uniform sampling key in [0, 10000) from a keyed hash of the id.

    pmod of the 60-bit hash is uniform to ~1e-14 (2^60 % 10000 bias);
    the key is reproducible anywhere — an engine, a SQL oracle, a
    different cluster — which is the point of hash sampling."""
    return F.pmod(hash64(id_col.cast("string"), seed), F.lit(10000)).cast("long")


def stratified_sample(
    docs: DataFrame,
    rate_bp: Column,
    id_col: str = "doc_id",
    seed: str = "strat",
) -> DataFrame:
    """Keep each document iff its hash key falls under its stratum's
    rate (basis points). `rate_bp` is any integer Column — typically a
    function of the stratum column or a broadcast-joined rate table.

    Map-only: no shuffle, no state, linear in the corpus; the sample is
    a deterministic function of (id, seed, rate), so incremental reruns
    and backfills agree with the original pass.
    """
    return (
        docs.withColumn("samp_key", sample_key_expr(F.col(id_col), seed))
        .withColumn("rate_bp", rate_bp.cast("long"))
        .filter(F.col("samp_key") < F.col("rate_bp"))
    )


def decontaminate(
    docs: DataFrame,
    probes: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document benchmark-overlap report: how many distinct k-token
    shingles of the document appear in ANY probe document, and how many
    probe documents it collides with.

    Returns (doc_id, n_shared, n_probe_docs) for contaminated documents
    only. Scale shape: the probe shingle set is distinct-collapsed and
    broadcast (benchmarks are small by definition); the corpus explodes
    to (id, shingle-hash) and the overlap is one broadcast equi-join +
    one groupBy on the document id.
    """
    def sh(frame: DataFrame) -> DataFrame:
        return (
            frame.withColumn("_toks", tokens_expr(text_col))
            .filter(F.size("_toks") >= k)
            .select(
                F.col(id_col).alias("id"),
                F.explode(
                    shingles_of_tokens(F.col("_toks"), k)
                ).alias("shingle"),
            )
            .select("id", hash64(F.col("shingle"), "decon").alias("sh"))
        )

    probe_sh = sh(probes).withColumnRenamed("id", "probe_id").distinct()
    corpus_sh = sh(docs)
    hits = corpus_sh.join(F.broadcast(probe_sh), "sh")
    return (
        hits.groupBy(F.col("id").alias(id_col))
        .agg(
            F.countDistinct("sh").alias("n_shared"),
            F.countDistinct("probe_id").alias("n_probe_docs"),
        )
    )
