"""Similarity search over embedding columns.

Two paths:
- `cosine_topk` — brute-force exact top-k for a (small, broadcast)
  probe set against the full corpus: probes × corpus is a broadcast
  nested-loop join whose cost is linear in the corpus, the correctness
  baseline at any scale;
- `ann_lsh_topk` — the scale path: random-hyperplane LSH (sign-bit
  bucket codes) buckets the corpus once, probes only scan their own
  bucket. Bucket assignment is a map-only expression; the probe-bucket
  join is an equi-join on the code.

All arithmetic is double-precision sequential folds (zip_with +
aggregate), which is bit-identical to DuckDB's DOUBLE[] list functions —
verified, so oracles can compare at full precision (we still round to
basis points via integer floor for hash stability).

Embeddings are `array<float>` on disk; cast to `array<double>` before
any arithmetic (float ops differ across engines, double ops don't).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tsdb_spark.pipeline.common import hash64

N_PLANES = 6  # 2^6 = 64 LSH buckets


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (matches SQL engines' list fold order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_expr(a: Column | str, b: Column | str) -> Column:
    a, b = _as_double(a), _as_double(b)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot_expr(a, b) / (na * nb)


def cosine_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each probe over the corpus.

    probes is expected to be small — it is explicitly broadcast, so the
    corpus side streams through one map stage and the only shuffle is
    the per-probe top-k (a partial_sort-combinable window). Ties break
    on neighbor id for determinism."""
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("_pv")
    )
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        c.join(F.broadcast(p), F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_expr("_pv", "_cv"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id",
            "neighbor_id",
            "rank",
            F.floor(F.lit(100000) * F.col("cos")).cast("long").alias("cos_bp"),
        )
    )


def lsh_bucket_expr(vec_col: Column | str, n_planes: int = N_PLANES) -> Column:
    """Random-hyperplane bucket code: plane p is a pseudo-random ±1
    vector (sign of hash64(p, dim)); bit p of the code = sign of the
    projection. Deterministic, data-independent, reproducible in SQL."""
    v = _as_double(vec_col)

    def sign_vec(p: int):
        # closure factory: a default-param lambda would receive transform's
        # optional second (index) Column instead of the plane number
        return lambda d: (
            hash64(d.cast("string"), f"plane{p}").bitwiseAND(F.lit(1)) * 2 - 1
        ).cast("double")

    code = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.transform(F.sequence(F.lit(0), F.size(v) - 1), sign_vec(p)),
                lambda x, s: x * s,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        code = code + F.when(proj > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return code


def ann_lsh_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 3,
    n_planes: int = N_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probes only compare against corpus vectors in
    their own LSH bucket. The bucket join is an equi-join (shuffle or
    broadcast by bucket code) — corpus never self-joins, probes never
    scan the full corpus. Deterministic → a SQL oracle reproduces the
    same approximate result exactly."""
    bucket = lsh_bucket_expr(vec_col, n_planes)
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), bucket.alias("bucket")
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("_pv"), bucket.alias("bucket")
    )
    scored = (
        c.join(F.broadcast(p), "bucket")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine_expr("_pv", "_cv"))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id",
            "neighbor_id",
            "rank",
            F.floor(F.lit(100000) * F.col("cos")).cast("long").alias("cos_bp"),
        )
    )
