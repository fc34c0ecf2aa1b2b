"""Similarity search over embedding columns.

Three search paths plus a near-dup detector:
- `cosine_topk` — brute-force exact top-k for a (small, broadcast)
  probe set against the full corpus: probes × corpus is a broadcast
  nested-loop join whose cost is linear in the corpus, the correctness
  baseline at any scale;
- `ann_lsh_topk` — random-hyperplane LSH (sign-bit bucket codes)
  buckets the corpus once, probes only scan their own bucket. Bucket
  assignment is a map-only expression; the probe-bucket join is an
  equi-join on the code.
- `ann_ivf_topk` — IVF-Flat: a coarse quantizer assigns every corpus
  vector to its nearest centroid (the inverted lists); a probe scores
  only the lists of its `nprobe` nearest centroids. The centroid set
  is either deterministic lowest-id corpus vectors or k-means-trained
  via `kmeans_centroids` (Lloyd iterations on an integer micro-unit
  grid — order-free exact arithmetic, so even the TRAINED index is
  reproduced bit-for-bit by a SQL oracle). The plan shape (broadcast
  centroids → argmin assign → equi-join on list id) is identical
  either way.
- `cosine_near_dup_pairs` — embedding-space near-duplicate pairs:
  same-bucket LSH self-join + cosine threshold, the vector-side
  complement of the MinHash/SimHash text dedup.

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


def norm_expr(col: Column | str) -> Column:
    """Euclidean norm with the exact fold order of cosine_expr's
    denominators — precompute it ONCE per vector on frames that join
    pairwise, then divide dot by the two cached norms: the quotient is
    bit-identical to cosine_expr (same dot fold, same norm folds, same
    single `dot / (na * nb)` division) while the per-pair work drops
    from three interpreted array folds to one (guide §4: the folds are
    CodegenFallback, ~µs per element — at c² pairs per cluster they are
    the wall, and 2/3 of that work is re-deriving per-VECTOR norms)."""
    c = _as_double(col)
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))


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
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("_pv"),
        norm_expr(vec_col).alias("_pn"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        norm_expr(vec_col).alias("_cn"),
    )
    # norms precomputed per side (below the join, once per row) — the
    # per-pair cost is ONE dot fold; value bit-identical to cosine_expr
    scored = (
        c.join(F.broadcast(p), F.col("probe_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            dot_expr(_as_double("_pv"), _as_double("_cv"))
            / (F.col("_pn") * F.col("_cn")),
        )
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
    hamming_probes: int = 0,
) -> DataFrame:
    """Approximate top-k: probes only compare against corpus vectors in
    their own LSH bucket. The bucket join is an equi-join (shuffle or
    broadcast by bucket code) — corpus never self-joins, probes never
    scan the full corpus. Deterministic → a SQL oracle reproduces the
    same approximate result exactly.

    `hamming_probes` enables MULTI-PROBE LSH (Lv et al., VLDB'07): each
    probe also visits buckets within that Hamming distance of its own
    code — a near neighbor split off by one hyperplane lands one bit
    away, so probing h=1 visits n_planes+1 buckets and recovers most of
    what single-bucket LSH loses (measured in the soak recall table,
    SCALE.md r8: 8%→33% recall@3 at h=1 on sf0.1, ≥96% at soak scale).
    Cost multiplies by the probed-bucket count, never touches the
    corpus side: the probe frame explodes, the equi-join stays the
    same shape.

    Picking h (SCALE.md r9 ladder): h=1 is 7 buckets/probe; h=2 is 22
    (3.1× the candidates) for 33%→42% at 1× and 96%→100% at 8× —
    poor marginal economics. Default recommendation: IVF-Flat
    (ann_ivf_topk, 100% across the ladder) when quality matters;
    h=1 as the cheap-LSH compromise; h=2 only when an LSH-only
    pipeline needs the last recall points and can pay ~3× candidates."""
    bucket = lsh_bucket_expr(vec_col, n_planes)
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"), bucket.alias("bucket")
    )
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("_pv"), bucket.alias("bucket")
    )
    if hamming_probes > 0:
        masks = [0] + [
            m
            for m in range(1, 1 << n_planes)
            if bin(m).count("1") <= hamming_probes
        ]
        p = p.select(
            "probe_id",
            "_pv",
            F.explode(
                F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
            ).alias("bucket"),
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


KMEANS_SCALE = 1_000_000


def kmeans_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(centroid_id, _cent): k-means-trained IVF centroids — Lloyd
    iterations in pure DataFrame algebra, fully deterministic so a SQL
    oracle reproduces the trained index bit-for-bit.

    Determinism: components are quantized to an integer micro-unit grid
    (floor(x·1e6)) and each update step is an integer mean
    (floor(sum/count)) — order-free exact arithmetic, so the result does
    not depend on partitioning or aggregation order, in ANY engine.
    Init = the `n_centroids` lowest-id vectors; cosine ties break to the
    lowest centroid id.

    Scale shape per iteration: the centroid set packs into ONE broadcast
    row, so assignment is a map-only fold over the corpus (no join
    shuffle, no window); the update is a posexplode to (centroid, dim)
    with a map-side-combinable sum — shuffle rows = n_centroids × dims
    after combining, regardless of corpus size."""
    base = embeddings.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    q = base.withColumn(
        "qv", F.transform("v", lambda x: F.floor(x * KMEANS_SCALE).cast("long"))
    ).withColumn("_nv", norm_expr("v"))  # corpus-side norm ONCE per vector
    cent = q.filter(F.col("id") < n_centroids).select(
        F.col("id").alias("centroid_id"), F.col("qv").alias("cq")
    )
    init = F.struct(
        F.lit(None).cast("double").alias("cos"), F.lit(None).cast("long").alias("cid")
    )

    def merge(acc, c):
        # dot / (nv * nc): the exact float sequence of
        # cosine_expr(v, dequantized centroid), with both norms cached —
        # the assignment fold pays one dot per (vector, centroid)
        # instead of one dot + two norms + a dequantize transform
        cos = dot_expr(F.col("v"), c["cv"]) / (F.col("_nv") * c["nc"])
        better = acc["cid"].isNull() | (cos > acc["cos"])
        return F.struct(
            F.when(better, cos).otherwise(acc["cos"]).alias("cos"),
            F.when(better, c["centroid_id"]).otherwise(acc["cid"]).alias("cid"),
        )

    for _ in range(iters):
        centd = cent.select(
            "centroid_id",
            F.transform("cq", lambda x: x / KMEANS_SCALE).alias("cv"),
        ).withColumn("nc", norm_expr("cv"))
        packed = centd.agg(
            F.array_sort(
                F.collect_list(F.struct("centroid_id", "cv", "nc"))
            ).alias("cs")
        )
        assigned = q.crossJoin(F.broadcast(packed)).select(
            "qv", F.aggregate("cs", init, merge)["cid"].alias("centroid_id")
        )
        comp = (
            assigned.select("centroid_id", F.posexplode("qv").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.floor(F.sum("x") / F.count("*")).cast("long").alias("comp"))
        )
        cent = comp.groupBy("centroid_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "comp"))),
                lambda s: s["comp"],
            ).alias("cq")
        )
    return cent.select(
        "centroid_id",
        F.transform("cq", lambda x: x / KMEANS_SCALE).alias("_cent"),
    )


def _default_centroids(
    embeddings: DataFrame, n_centroids: int, id_col: str, vec_col: str
) -> DataFrame:
    """Training-free default quantizer: the n lowest-id vectors
    (deterministic, oracle-reproducible). Defined once so list build and
    probe side can never disagree on the quantizer."""
    return embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("_cent")
    )


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(id, vec, centroid_id): assign every vector to its nearest
    centroid — the IVF inverted-list build.

    Centroids = `centroids` (a (centroid_id, _cent) frame, e.g. from
    `kmeans_centroids`) or, by default, the `n_centroids` lowest-id
    vectors (deterministic, no training step; see module docstring). The
    centroid table broadcasts; assignment is one map-side windowed
    argmax per vector — the corpus is scanned exactly once and never
    shuffled except by the top-1 window on (id), which AQE keeps
    local."""
    cent = centroids if centroids is not None else _default_centroids(
        embeddings, n_centroids, id_col, vec_col
    )
    # norms below the join: once per corpus row / per centroid, not per
    # (row, centroid) pair; cos is bit-identical to cosine_expr
    scored = (
        embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            norm_expr(vec_col).alias("_nv"),
        )
        .crossJoin(F.broadcast(cent.withColumn("_nc", norm_expr("_cent"))))
        .withColumn(
            "cos",
            dot_expr(_as_double("vec"), _as_double("_cent"))
            / (F.col("_nv") * F.col("_nc")),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("cos"), "centroid_id")
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("id", "vec", "centroid_id")
    )


def ann_ivf_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-Flat approximate top-k: each probe scores only the inverted
    lists of its `nprobe` nearest centroids (pass `centroids` for a
    k-means-trained quantizer, default = lowest-id vectors).

    Scale shape: the corpus is partitioned by centroid_id once (the
    index build); a query is a broadcast of (probe × nprobe list ids)
    against that partitioning — an equi-join touching nprobe/n_centroids
    of the data, never a full scan, never a corpus self-join."""
    # ONE centroid frame for both sides: the probe-side quantizer must be
    # the exact quantizer the lists were built with
    cent = centroids if centroids is not None else _default_centroids(
        embeddings, n_centroids, id_col, vec_col
    )
    lists = ivf_assign(embeddings, n_centroids, id_col, vec_col, cent)
    return search_ivf_lists(lists, cent, probes, k, nprobe, id_col, vec_col)


def search_ivf_lists(
    lists: DataFrame,
    cent: DataFrame,
    probes: DataFrame,
    k: int = 3,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The IVF probe path over an existing (id, vec, centroid_id) lists
    relation — shared by the build-and-query op above and the persisted
    `IvfIndex` (vecindex.py), so an index on disk answers with exactly
    the plan (and bits) of the in-memory build."""
    p = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("_pv"),
        norm_expr(vec_col).alias("_pn"),
    )
    pw = Window.partitionBy("probe_id").orderBy(F.desc("pcos"), "centroid_id")
    probe_lists = (
        p.crossJoin(F.broadcast(cent.withColumn("_nc", norm_expr("_cent"))))
        .withColumn(
            "pcos",
            dot_expr(_as_double("_pv"), _as_double("_cent"))
            / (F.col("_pn") * F.col("_nc")),
        )
        .withColumn("_r", F.row_number().over(pw))
        .filter(F.col("_r") <= nprobe)
        .select("probe_id", "_pv", "_pn", "centroid_id")
    )
    # list-side norm once per corpus row (below the probe join) — the
    # scan stage then pays one dot fold per scored candidate
    scored = (
        lists.withColumn("_ln", norm_expr("vec"))
        .join(F.broadcast(probe_lists), "centroid_id")
        .filter(F.col("probe_id") != F.col("id"))
        .withColumn(
            "cos",
            dot_expr(_as_double("_pv"), _as_double("vec"))
            / (F.col("_pn") * F.col("_ln")),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"), "id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id",
            F.col("id").alias("neighbor_id"),
            "rank",
            F.floor(F.lit(100000) * F.col("cos")).cast("long").alias("cos_bp"),
        )
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    min_cos_bp: int = 99000,
    n_planes: int = N_PLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cos_bp) for
    same-LSH-bucket pairs at or above the threshold (basis points of
    1e5).

    Near-identical vectors project to the same side of every hyperplane
    with high probability, so true near-dups share a bucket; the
    self-join is an equi-join on the code — never all-pairs. Exact
    cosine then filters false bucket-mates. `max_bucket` drops buckets
    above the cap before the join (skew guard: one degenerate code —
    e.g. a mass of zero-ish vectors — makes the self-join quadratic on
    one executor; see dedup.lsh_candidate_pairs)."""
    from tsdb_spark.pipeline.common import materialize

    bucket = lsh_bucket_expr(vec_col, n_planes)
    # eager: both sides of the bucket self-join scan this frame — the
    # n_planes projection folds must not run twice over the corpus
    d = materialize(
        embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            bucket.alias("bucket"),
            # norm cached in the materialized frame: each vector's norm
            # fold runs once, not once per bucket-mate pair
            norm_expr(vec_col).alias("_n"),
        )
    )
    if max_bucket is not None:
        w = Window.partitionBy("bucket")
        d = (
            d.withColumn("_c", F.count("*").over(w))
            .filter(F.col("_c") <= max_bucket)
            .drop("_c")
        )
    a = d.select(
        F.col("id").alias("id_a"), F.col("vec").alias("_va"), "bucket",
        F.col("_n").alias("_na"),
    )
    b = d.select(
        F.col("id").alias("id_b"), F.col("vec").alias("_vb"), "bucket",
        F.col("_n").alias("_nb"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_bp",
            F.floor(
                F.lit(100000)
                * (
                    dot_expr(_as_double("_va"), _as_double("_vb"))
                    / (F.col("_na") * F.col("_nb"))
                )
            ).cast("long"),
        )
        .filter(F.col("cos_bp") >= min_cos_bp)
        # one bucket code per vector (not banded) → a pair appears at
        # most once; no distinct needed
        .select("id_a", "id_b", "cos_bp")
    )


def pq_codes(
    embeddings: DataFrame,
    m: int = 4,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization encoding: split each vector into `m`
    contiguous subvectors and replace each with the id of its nearest
    codebook entry (L2) — the compression step of an IVF-PQ index, which
    is how billion-vector ANN stores fit in memory (a 64-dim float
    vector becomes m=4 one-byte codes here).

    Codebook = the subvectors of the `n_codes` lowest-id vectors per
    subspace (deterministic, training-free — the same convention as
    `_default_centroids`; a k-means codebook drops in the same way).

    Returns (vec_id, code0..code{m-1}, err_bp): the per-subspace codes
    and the total squared reconstruction error in 1e-4 units.

    Scale shape: the codebook (m × n_codes subvectors) broadcasts; the
    corpus explodes m-ways, equi-joins on the subspace id, and folds
    back with TWO map-side-combinable aggregates — cost linear in the
    corpus, shuffle rows = m per vector, never a corpus self-join.

    Determinism: distances are double-precision sequential folds; the
    argmin tie breaks to the lowest code id; the per-vector error sums
    in subspace order (a 4-element ordered fold, not a float SUM).
    """
    base = embeddings.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    subs = base.select(
        "id",
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.expr(f"slice(v, sub * (size(v) div {m}) + 1, size(v) div {m})").alias("sv"),
    )
    cb = subs.filter(F.col("id") < n_codes).select(
        F.col("sub"), F.col("id").alias("code"), F.col("sv").alias("cv")
    )
    d2 = F.aggregate(
        F.zip_with("sv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    best = (
        subs.join(F.broadcast(cb), "sub")
        .withColumn("d2", d2)
        .groupBy("id", "sub")
        .agg(
            F.min_by("code", F.struct("d2", "code")).alias("code"),
            F.min("d2").alias("d2"),
        )
    )
    packed = best.groupBy("id").agg(
        F.array_sort(F.collect_list(F.struct("sub", "code", "d2"))).alias("cs")
    )
    err = F.aggregate(
        F.transform("cs", lambda s: s["d2"]), F.lit(0.0), lambda acc, x: acc + x
    )
    return packed.select(
        F.col("id").alias(id_col),
        *[
            F.element_at("cs", i + 1)["code"].cast("long").alias(f"code{i}")
            for i in range(m)
        ],
        F.floor(F.lit(10000) * err).cast("long").alias("err_bp"),
    )


def sq8_grid(embeddings: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension [lo, hi] quantization grid over the corpus as a
    ONE-ROW frame of two dim-length arrays.

    Scale shape: posexplode fans out inside each task, the per-dimension
    min/max is a map-side-combinable aggregate whose key count is the
    dimensionality (never the corpus), and the single packed row is
    broadcast to the quantizer — no driver round-trip, no corpus shuffle.
    """
    v = _as_double(vec_col)
    dims = (
        embeddings.select(F.posexplode(v).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    )
    return dims.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "lo"))), lambda s: s["lo"]
        ).alias("_los"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "hi"))), lambda s: s["hi"]
        ).alias("_his"),
    )


def sq8_codes_expr(vec_col: Column | str) -> Column:
    """uint8 scalar-quantization codes for a vector against the grid
    columns `_los`/`_his` (join `sq8_grid` first): per dimension,
    floor((x - lo) * 255 / (hi - lo)) clamped to [0, 255]; a degenerate
    dimension (hi == lo) codes to 0. Pure double arithmetic in a fixed
    order, so the oracle reproduces every code bit-for-bit."""
    v = _as_double(vec_col)
    return F.transform(
        v,
        lambda x, i: F.when(
            F.element_at("_his", i + 1) > F.element_at("_los", i + 1),
            F.least(
                F.lit(255),
                F.floor(
                    (x - F.element_at("_los", i + 1))
                    * 255
                    / (F.element_at("_his", i + 1) - F.element_at("_los", i + 1))
                ).cast("long"),
            ),
        ).otherwise(F.lit(0).cast("long")),
    )


def sq8_topk(
    embeddings: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k neighbors over 8-bit scalar-quantized vectors
    — the memory-compression ANN path (4x smaller vectors than f32).

    Scoring DEQUANTIZES each code to its cell center (lo_i + (c+0.5)Δ_i)
    and ranks by the double dot product of the reconstructions — the
    FAISS ScalarQuantizer arrangement. The earlier raw integer-code dot
    Σ c_p·c_n was measured essentially uncorrelated with the true dot
    (recall@3 ≈ 4% on the sf0.1 corpus, SCALE.md r8): codes are shifted
    by -lo_i/Δ_i per dimension, so the offset cross-terms (which vary
    per NEIGHBOR via its component sum) swamp the signal. Dequantized
    scoring isolates the only loss SQ8 should have — quantization
    resolution (measured recall@3 ≈ 96% same corpus). Arithmetic is
    fixed-order double math, so ranks stay engine-reproducible.

    Scale shape: the grid row and the probe set are broadcast; the
    corpus streams through one map stage (quantize + score) and the only
    shuffle is the per-probe top-k window."""
    grid = sq8_grid(embeddings, vec_col)
    c = (
        embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col))
        .join(F.broadcast(grid))
        .select("neighbor_id", sq8_codes_expr(vec_col).alias("_cc"), "_los", "_his")
    )
    p = (
        probes.select(F.col(id_col).alias("probe_id"), F.col(vec_col))
        .join(F.broadcast(grid))
        .select("probe_id", sq8_codes_expr(vec_col).alias("_pc"))
    )

    def dq(code, i):
        lo = F.element_at("_los", i + 1)
        hi = F.element_at("_his", i + 1)
        return F.when(
            hi > lo,
            lo + (code.cast("double") + 0.5) * (hi - lo) / 255,
        ).otherwise(lo)

    dot = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.size("_cc") - 1),
            lambda i: dq(F.element_at("_pc", i + 1), i)
            * dq(F.element_at("_cc", i + 1), i),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = c.join(
        F.broadcast(p), F.col("probe_id") != F.col("neighbor_id")
    ).withColumn("dot", dot)
    w = Window.partitionBy("probe_id").orderBy(F.desc("dot"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "probe_id",
            "neighbor_id",
            "rank",
            F.floor(F.lit(1_000_000) * F.col("dot")).cast("long").alias("dot"),
        )
    )
