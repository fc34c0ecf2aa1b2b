"""Driver-facing pipeline queries over documents/embeddings, each paired
with a DuckDB oracle that reproduces the sketch bit-for-bit (shared
md5-derived hashing, integer basis-point ratios, double-precision
sequential folds — see pipeline/common.py).

The dedup queries run over a constructed corpus = documents ∪ exact
copies (doc_id%10==0, +100000) ∪ near copies (doc_id%7==0, +200000,
last 3 tokens dropped) — the driver's corpus has no natural duplicates,
so the workload synthesizes them identically on both sides (the same
pattern the tsdb vertical-dedup query uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tsdb_spark.pipeline import dedup as D
from tsdb_spark.pipeline.common import materialize
from tsdb_spark.pipeline import embed as E
from tsdb_spark.pipeline import multimodal as M
from tsdb_spark.pipeline import text as T
from tsdb_spark.queries import register
from tsdb_spark.sources.events import load_table

# ---------------------------------------------------------------- SQL lego

#: whitespace tokens, empties dropped (== text.tokens_expr)
SQL_TOKS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"


def sql_h(seed_expr: str, val_expr: str) -> str:
    """DuckDB rendering of common.hash64 (seed_expr/val_expr are SQL)."""
    return (
        "CAST(concat('0x', substr(md5(concat("
        f"{seed_expr}, ':', {val_expr})), 1, 15)) AS BIGINT)"
    )


#: corpus with synthesized duplicates (matches _corpus below)
SQL_CORPUS = f"""
base AS (SELECT doc_id, text FROM documents),
tok0 AS (SELECT doc_id, {SQL_TOKS} AS toks FROM base),
exact_c AS (SELECT doc_id + 100000 AS doc_id, text FROM base WHERE doc_id % 10 = 0),
near_c AS (SELECT doc_id + 200000 AS doc_id,
                  -- guard short docs: DuckDB slice bounds <= 0 wrap or
                  -- go NULL, while the Spark side's slice(toks, 1,
                  -- greatest(size-3, 0)) yields '' — mirror that exactly
                  CASE WHEN len(toks) > 3
                       THEN array_to_string(toks[1:len(toks)-3], ' ')
                       ELSE '' END AS text
           FROM tok0 WHERE doc_id % 7 = 0),
corpus AS (SELECT * FROM base UNION ALL SELECT * FROM exact_c UNION ALL SELECT * FROM near_c)
""".strip()

#: distinct 3-token shingle sets of the corpus (== dedup.shingles_expr)
SQL_SHINGLES = """
ctoks AS MATERIALIZED (SELECT doc_id, {toks} AS toks FROM corpus),
sh AS MATERIALIZED (SELECT doc_id,
              list_distinct(list_transform(range(1, len(toks) - 1),
                                           i -> array_to_string(toks[i:i+2], ' '))) AS sh
       FROM ctoks WHERE len(toks) >= 3)
""".strip().format(toks=SQL_TOKS)


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread the (few, large) input files across the cluster before the
    # heavy sketch expressions — at sf0.01 the parquet arrives as ~3
    # splits, which would cap every downstream md5/minhash stage at 3
    # tasks no matter how wide the cluster is
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    exact = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    toks = T.tokens_expr("text")
    near = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.array_join(F.slice(toks, 1, F.greatest(F.size(toks) - 3, F.lit(0))), " ").alias(
            "text"
        ),
    )
    return docs.unionByName(exact).unionByName(near)


# ================================================================ text

@register(
    "docs_text_stats",
    f"""
WITH t AS (SELECT doc_id, text, {SQL_TOKS} AS toks FROM documents)
SELECT doc_id,
  length(text) AS n_chars,
  len(toks) AS n_tokens,
  len(list_distinct(toks)) AS n_distinct_tokens,
  CAST((10000 * list_sum(list_transform(toks, x -> length(x)))) // len(toks) AS BIGINT) AS avg_token_len_bp,
  (10000 * len(list_filter(toks, x -> x IN {T.EN_STOPWORDS!r}))) // len(toks) AS stopword_bp,
  (10000 * length(regexp_replace(text, '[^a-z]', '', 'g'))) // length(text) AS alpha_bp,
  (len(toks) BETWEEN 10 AND 100000)
    AND ((10000 * len(list_filter(toks, x -> x IN {T.EN_STOPWORDS!r}))) // len(toks) >= 100) AS keep
FROM t""",
    "per-document text statistics + C4-style quality gate (map-only pass)",
)
def docs_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.text_stats(load_table(spark, sf_dir, "documents"))


@register(
    "docs_lang_id",
    f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
s AS (SELECT doc_id,
  {", ".join(f"len(list_filter(toks, x -> x IN {words!r})) AS score_{lang}" for lang, words in T.LANG_PROFILES.items())}
  FROM t),
g AS (SELECT *, greatest({", ".join(f"score_{lang}" for lang in T.LANG_ORDER)}) AS best FROM s)
SELECT doc_id, {", ".join(f"score_{lang}" for lang in T.LANG_ORDER)},
  CASE {" ".join(f"WHEN score_{lang} = best THEN '{lang}'" for lang in T.LANG_ORDER)} END AS pred_lang
FROM g""",
    "stopword-profile language identification (first-match argmax)",
)
def docs_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.language_id(load_table(spark, sf_dir, "documents"))


@register(
    "docs_lang_confusion",
    f"""
WITH t AS (SELECT doc_id, lang, {SQL_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, lang,
  {", ".join(f"len(list_filter(toks, x -> x IN {words!r})) AS score_{lang}" for lang, words in T.LANG_PROFILES.items())}
  FROM t),
g AS (SELECT *, greatest({", ".join(f"score_{lang}" for lang in T.LANG_ORDER)}) AS best FROM s),
p AS (SELECT doc_id, lang,
  CASE {" ".join(f"WHEN score_{lang} = best THEN '{lang}'" for lang in T.LANG_ORDER)} END AS pred_lang
FROM g)
SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY 1, 2""",
    "classifier evaluation: language-ID confusion matrix against the "
    "corpus's labeled lang column (tiny groupBy rollup of a map-only "
    "prediction pass)",
)
def docs_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pred = T.language_id(docs).select("doc_id", "pred_lang")
    return (
        docs.select("doc_id", "lang")
        .join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )


@register(
    "docs_wordpiece_count",
    f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS ws,
             regexp_extract_all(lower(text), '[a-z0-9'']+|[^a-z0-9\\s]') AS wp
           FROM documents)
SELECT doc_id, len(ws) AS n_ws_tokens, len(wp) AS n_wordpieces,
       len(list_distinct(wp)) AS n_distinct_wordpieces
FROM t""",
    "token counting, both tokenizers: whitespace + BPE-ish regex "
    "(words-or-single-punct over lowercased text); map-only pass",
)
def docs_wordpiece_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # bind the regex tokenization once; referencing the expression twice
    # (size + distinct-size) would run the regex scan twice per row
    return docs.withColumn("_wp", T.wordpieces_expr("text")).select(
        "doc_id",
        F.size(T.tokens_expr("text")).alias("n_ws_tokens"),
        F.size("_wp").alias("n_wordpieces"),
        F.size(F.array_distinct("_wp")).alias("n_distinct_wordpieces"),
    )


@register(
    "docs_token_histogram",
    f"""
WITH t AS (SELECT unnest({SQL_TOKS}) AS token FROM documents)
SELECT token, count(*) AS n FROM t GROUP BY token ORDER BY n DESC, token LIMIT 20""",
    "corpus token frequencies, top-20 (map-side-combined groupBy)",
)
def docs_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.token_histogram(load_table(spark, sf_dir, "documents"))


@register(
    "docs_fingerprints",
    f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
h AS (SELECT doc_id,
        list_transform(range(1, len(toks) - 1),
                       i -> {sql_h("'shingle'", "array_to_string(toks[i:i+2], ' ')")}) AS h
      FROM t WHERE len(toks) >= 6),
fp AS (SELECT doc_id,
         list_distinct(list_transform(range(1, len(h) - 2),
                                      i -> list_min(h[i:i+3]))) AS fps
       FROM h)
SELECT doc_id, unnest(fps) AS fingerprint FROM fp""",
    "winnowing fingerprints (k=3 shingles, window=4; Schleimer SIGMOD'03)",
)
def docs_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.winnow_fingerprints(load_table(spark, sf_dir, "documents"))


@register(
    "docs_chunk_windows",
    f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
nz AS (SELECT doc_id, toks FROM t WHERE len(toks) >= 1),
e AS (SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS chunk_start FROM nz)
SELECT doc_id, CAST(chunk_start AS INT) AS chunk_start,
  CAST(least(32, len(toks) - chunk_start) AS BIGINT) AS n_chunk_tokens,
  {sql_h("'chunk'", "array_to_string(toks[chunk_start+1:chunk_start+32], ' ')")} AS chunk_hash
FROM e""",
    "training-sequence sharding: fixed 32-token windows at stride 24 "
    "(8-token overlap) with a keyed content digest per window — MAP-ONLY "
    "fan-out inside each task, no shuffle",
)
def docs_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.chunk_windows(load_table(spark, sf_dir, "documents"))


@register(
    "docs_chunk_dedup",
    f"""
WITH {SQL_CORPUS},
nz AS (SELECT doc_id, {SQL_TOKS} AS toks FROM corpus WHERE len({SQL_TOKS}) >= 1),
e AS (SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS chunk_start FROM nz),
h AS (SELECT doc_id,
        {sql_h("'chunk'", "array_to_string(toks[chunk_start+1:chunk_start+32], ' ')")} AS chunk_hash
      FROM e)
SELECT chunk_hash, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
  CAST(count(*) AS BIGINT) AS n_occurrences, min(doc_id) AS canonical_doc
FROM h GROUP BY chunk_hash HAVING count(*) > 1""",
    "chunk-level dedup over the duplicate-synthesized corpus: the "
    "windows from `chunk_windows` grouped on their content digest — "
    "repeated training sequences surface across documents even when "
    "whole-document hashes differ (the sequence-level complement of "
    "MinHash); ONE map-side-combinable groupBy on the digest, shuffle "
    "∝ distinct chunks",
)
def docs_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = T.chunk_windows(_corpus(spark, sf_dir))
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


@register(
    "docs_repetition",
    f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
t2 AS (SELECT * FROM t WHERE len(toks) >= 2),
g AS (SELECT doc_id, 1 AS n, unnest(toks) AS g FROM t2
      UNION ALL
      SELECT doc_id, 2 AS n,
             unnest(list_transform(range(1, len(toks)),
                                   i -> array_to_string(toks[i:i+1], ' '))) AS g
      FROM t2),
c AS (SELECT doc_id, n, g, count(*) AS c FROM g GROUP BY ALL),
p AS (SELECT doc_id, n, sum(c) AS total, max(c) AS top, count(*) AS dist
      FROM c GROUP BY doc_id, n)
SELECT doc_id,
  CAST(max(CASE WHEN n=1 THEN total END) AS BIGINT) AS n_tokens,
  CAST((10000 * max(CASE WHEN n=1 THEN top END))
    // max(CASE WHEN n=1 THEN total END) AS BIGINT) AS top_token_bp,
  CAST(max(CASE WHEN n=2 THEN total END) AS BIGINT) AS n_bigrams,
  CAST((10000 * max(CASE WHEN n=2 THEN top END))
    // max(CASE WHEN n=2 THEN total END) AS BIGINT) AS top_bigram_bp,
  CAST((10000 * (max(CASE WHEN n=2 THEN total END) - max(CASE WHEN n=2 THEN dist END)))
    // max(CASE WHEN n=2 THEN total END) AS BIGINT) AS dup_bigram_bp
FROM p GROUP BY doc_id""",
    "Gopher-style repetition signals (top-token / top-bigram share, "
    "duplicate-bigram fraction) — boilerplate detection; doc-local keys, "
    "no corpus-wide hot key",
)
def docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.repetition_stats(load_table(spark, sf_dir, "documents"))


# ================================================================ dedup

@register(
    "docs_dedup_exact",
    f"""
WITH {SQL_CORPUS}
SELECT doc_id, md5(text) AS content_hash,
  min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
  count(*) OVER (PARTITION BY md5(text)) AS group_size,
  doc_id != min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
FROM corpus""",
    "exact dedup by content hash over corpus-with-copies (hash groupBy)",
)
def docs_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(_corpus(spark, sf_dir))


_MH_A = "[" + ", ".join(str(a) for a, _, _ in D.MH_CONSTS) + "]"
_MH_B = "[" + ", ".join(str(b) for _, b, _ in D.MH_CONSTS) + "]"
_MH_C = "[" + ", ".join(str(c) for _, _, c in D.MH_CONSTS) + "]"


#: MinHash pipeline as reusable CTEs (needs SQL_CORPUS + SQL_SHINGLES in
#: scope): signatures → banded candidates → exact-Jaccard `verified`
#: pairs with their jaccard_bp. ONE copy — the pairs query and the
#: cluster queries compose from it, so the band-key arithmetic can never
#: desynchronize between them.
SQL_MINHASH_PAIRS = f"""
bh AS MATERIALIZED (SELECT doc_id, sh, list_transform(sh, x -> {sql_h("'mh'", "x")}) AS bh FROM sh),
sig AS MATERIALIZED (SELECT doc_id,
          list_transform(range(0, {D.N_HASHES}),
                         s -> list_min(list_transform(bh, h ->
                           ((h >> 30) * ({_MH_A})[s+1]
                            + (h & {D.MASK30}) * ({_MH_B})[s+1]
                            + ({_MH_C})[s+1]) & {D.MASK60}))) AS sig
        FROM bh),
banded AS MATERIALIZED (SELECT doc_id, b AS band_id,
             {sql_h("'band' || b::VARCHAR", f"array_to_string(sig[b*{D.ROWS_PER_BAND}+1:b*{D.ROWS_PER_BAND}+{D.ROWS_PER_BAND}], ',')")} AS band_key
           FROM sig CROSS JOIN range(0, {D.N_BANDS}) t(b)),
cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM banded a JOIN banded b
           ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
verified AS MATERIALIZED (SELECT id_a, id_b, jaccard_bp FROM (
             SELECT c.id_a, c.id_b,
               (10000 * len(list_intersect(sa.sh, sb.sh)))
                 // (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jaccard_bp
             FROM cand c
             JOIN sh sa ON sa.doc_id = c.id_a
             JOIN sh sb ON sb.doc_id = c.id_b)
             WHERE jaccard_bp >= 6000)
""".strip()


@register(
    "docs_dedup_minhash",
    f"""
WITH {SQL_CORPUS},
{SQL_SHINGLES},
{SQL_MINHASH_PAIRS}
SELECT id_a, id_b, jaccard_bp FROM verified""",
    "MinHash-LSH near-dup: 32 hashes, 8 bands — banded bucket join, never all-pairs; exact-Jaccard verified",
)
def docs_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_pairs(spark, sf_dir)


@register(
    "docs_lsh_recall",
    f"""
WITH {SQL_CORPUS},
{SQL_SHINGLES},
{SQL_MINHASH_PAIRS},
planted AS (SELECT doc_id AS id_a, doc_id + 100000 AS id_b, 'exact' AS kind
              FROM base WHERE doc_id % 10 = 0
            UNION ALL
            SELECT doc_id, doc_id + 200000, 'near'
              FROM base WHERE doc_id % 7 = 0),
truth AS (SELECT p.kind, p.id_a, p.id_b,
            (10000 * len(list_intersect(sa.sh, sb.sh)))
              // (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) AS jbp
          FROM planted p
          JOIN sh sa ON sa.doc_id = p.id_a
          JOIN sh sb ON sb.doc_id = p.id_b),
t2 AS (SELECT * FROM truth WHERE jbp >= 6000)
SELECT kind, CAST(count(*) AS BIGINT) AS n_true,
  CAST(count(v.id_a) AS BIGINT) AS n_found,
  (10000 * count(v.id_a)) // count(*) AS recall_bp
FROM t2 LEFT JOIN verified v USING (id_a, id_b)
GROUP BY kind""",
    "LSH recall evaluation: the planted duplicate pairs (ground truth by "
    "construction, independent of the sketch) whose exact Jaccard meets "
    "the threshold, anti-checked against the MinHash-LSH output — the "
    "quality gate a production dedup pipeline runs before trusting a "
    "sketch config; the truth side scans only the (tiny) planted pair "
    "list against the shingle frame",
)
def docs_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    found = _minhash_pairs(spark, sf_dir).select(
        "id_a", "id_b", F.lit(1).alias("hit")
    )
    base = load_table(spark, sf_dir, "documents").select("doc_id")
    planted = (
        base.filter(F.col("doc_id") % 10 == 0)
        .select(
            F.col("doc_id").alias("id_a"),
            (F.col("doc_id") + 100000).alias("id_b"),
            F.lit("exact").alias("kind"),
        )
        .unionByName(
            base.filter(F.col("doc_id") % 7 == 0).select(
                F.col("doc_id").alias("id_a"),
                (F.col("doc_id") + 200000).alias("id_b"),
                F.lit("near").alias("kind"),
            )
        )
    )
    sh = D.shingle_sets(_corpus(spark, sf_dir))
    a = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    truth = (
        planted.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("jbp", F.floor(F.lit(10000) * inter / union).cast("long"))
        .filter(F.col("jbp") >= 6000)
    )
    return (
        truth.join(found, ["id_a", "id_b"], "left")
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_true"),
            F.count("hit").alias("n_found"),
            F.floor(F.lit(10000) * F.count("hit") / F.count("*"))
            .cast("long")
            .alias("recall_bp"),
        )
    )


#: keyed by (session id, sf_dir): cached DataFrames are bound to the
#: session that built them — a driver recreating its SparkSession must
#: get a fresh sketch pass, not a dead handle
_PAIRS_CACHE: dict[tuple, DataFrame] = {}


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memoized verified MinHash pairs — the pairs query and the cluster
    queries share ONE sketch pass per sf_dir instead of re-running the
    32-way MinHash over the corpus each."""
    key = (id(spark), sf_dir)
    if key not in _PAIRS_CACHE:
        # eager materialize: the signature frame feeds the banded
        # self-join (2 scans) and the Jaccard verification (2 more) —
        # lazily persisted, the sibling scan stages all miss the empty
        # cache and the 32-way minhash expression runs 4x over the corpus
        # keep_shingles=False: the lean (id, sig) frame — the 128x soak
        # measured the corpus-wide shingle-array cache as THE one-box
        # disk wall; exact Jaccard re-shingles candidates only
        sigs = materialize(
            D.minhash_signatures(_corpus(spark, sf_dir), keep_shingles=False)
        )
        # max_bucket: the 100TB skew guard (drop degenerate band buckets
        # before the self-join); far above any bucket size at test scale,
        # so oracle results are unaffected
        # cand is referenced three times downstream (the candidate-id
        # distinct + both sides of the Jaccard join) — materialize the
        # pair-sized frame so the banded self-join runs ONCE
        cand = materialize(D.lsh_candidate_pairs(sigs, max_bucket=100_000))
        _PAIRS_CACHE[key] = materialize(
            D.jaccard_pairs_for_docs(cand, _corpus(spark, sf_dir))
        )
        # pairs are materialized: the signature/candidate frames are no
        # longer scanned — release their executor storage
        sigs.unpersist()
        cand.unpersist()
    return _PAIRS_CACHE[key]


def sql_cc(edges: str) -> str:
    """DuckDB connected components (recursive-CTE reachability) over an
    edge CTE with columns (id_a, id_b); yields `clusters(id, cluster_id,
    cluster_size, is_canonical)`. Use inside a WITH RECURSIVE."""
    return f"""sym AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM {edges}
        UNION ALL SELECT id_b, id_a FROM {edges}),
walk AS (
  SELECT DISTINCT u AS id, u AS label FROM sym
  UNION
  SELECT s.v AS id, w.label FROM walk w JOIN sym s ON s.u = w.id
),
cc AS (SELECT id, min(label) AS cluster_id FROM walk GROUP BY id),
clusters AS (SELECT id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       id = cluster_id AS is_canonical
FROM cc)"""


#: cluster frame memo — docs_dedup_clusters and docs_curated_corpus share
#: the (iterative, multi-job) CC computation within one driver run
_CLUSTER_CACHE: dict[str, DataFrame] = {}


def _minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    if sf_dir not in _CLUSTER_CACHE:
        _CLUSTER_CACHE[sf_dir] = materialize(
            D.dedup_clusters(_minhash_pairs(spark, sf_dir))
        )
    return _CLUSTER_CACHE[sf_dir]


def clear_pipeline_caches(pairs: bool = True, clusters: bool = True) -> None:
    """Evict the memoized sketch/cluster frames (bench.py uses this so
    a median-of-3 repetition re-measures the real pipeline cost instead
    of a persisted-frame read)."""
    if clusters:
        for df in _CLUSTER_CACHE.values():
            try:
                df.unpersist()
            except Exception:
                pass
        _CLUSTER_CACHE.clear()
    if pairs:
        for df in _PAIRS_CACHE.values():
            try:
                df.unpersist()
            except Exception:
                pass
        _PAIRS_CACHE.clear()


@register(
    "docs_dedup_clusters",
    f"""
WITH RECURSIVE {SQL_CORPUS},
{SQL_SHINGLES},
{SQL_MINHASH_PAIRS},
{sql_cc("verified")}
SELECT id, cluster_id, cluster_size, is_canonical FROM clusters""",
    "near-dup clusters: connected components over the verified MinHash "
    "pair graph (min-label propagation + pointer jumping, O(log d) "
    "rounds), canonical doc = min id per cluster",
)
def docs_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_clusters(spark, sf_dir)


#: full curation verdict as a CTE chain ending in
#: curated(doc_id, n_tokens, stopword_bp, keep_quality, is_exact_dup,
#: cluster_id, cluster_size, is_canonical, selected);
#: requires WITH RECURSIVE
SQL_CURATED = f"""{SQL_CORPUS},
{SQL_SHINGLES},
{SQL_MINHASH_PAIRS},
{sql_cc("verified")},
st0 AS (SELECT doc_id, len(toks) AS n_tokens,
          (10000 * len(list_filter(toks, x -> x IN {T.EN_STOPWORDS!r}))) // len(toks) AS stopword_bp
        FROM ctoks),
st AS (SELECT *,
         (n_tokens BETWEEN 10 AND 100000) AND stopword_bp >= 100 AS keep_quality
       FROM st0),
ex AS (SELECT doc_id,
         doc_id != min(doc_id) OVER (PARTITION BY md5(text)) AS is_exact_dup
       FROM corpus),
curated AS (
  SELECT st.doc_id, st.n_tokens, st.stopword_bp, st.keep_quality,
         ex.is_exact_dup,
         coalesce(c.cluster_id, st.doc_id) AS cluster_id,
         coalesce(c.cluster_size, 1) AS cluster_size,
         coalesce(c.is_canonical, TRUE) AS is_canonical,
         st.keep_quality AND NOT ex.is_exact_dup AND coalesce(c.is_canonical, TRUE) AS selected
  FROM st JOIN ex USING (doc_id) LEFT JOIN clusters c ON c.id = st.doc_id)"""


@register(
    "docs_curated_corpus",
    f"""
WITH RECURSIVE {SQL_CURATED}
SELECT * FROM curated""",
    "end-to-end curation verdict per doc: C4-style quality gate + exact "
    "dedup + near-dup cluster canonicality composed into one `selected` "
    "flag — the decision a training-data pipeline materializes",
)
def docs_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _curated(spark, sf_dir)


@register(
    "docs_source_report",
    f"""
WITH RECURSIVE {SQL_CURATED}
SELECT d.source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN c.keep_quality THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
  CAST(sum(CASE WHEN c.is_exact_dup OR NOT c.is_canonical THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
  CAST(sum(CASE WHEN c.selected THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
  CAST((10000 * sum(c.n_tokens)) // count(*) AS BIGINT) AS avg_tokens_bp
FROM curated c JOIN documents d ON d.doc_id = c.doc_id
GROUP BY d.source""",
    "per-source curation rollup over the base documents (quality pass / "
    "dup / selected counts, mean tokens) — the dataset-card summary a "
    "curation pipeline reports; reuses the memoized cluster frame",
)
def docs_source_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    c = _curated(spark, sf_dir)
    return (
        c.join(docs, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep_quality").cast("long")).alias("n_quality"),
            F.sum(
                (F.col("is_exact_dup") | ~F.col("is_canonical")).cast("long")
            ).alias("n_dups"),
            F.sum(F.col("selected").cast("long")).alias("n_selected"),
            F.floor(F.lit(10000) * F.sum("n_tokens") / F.count("*")).alias(
                "avg_tokens_bp"
            ),
        )
    )


def _curated(spark: SparkSession, sf_dir: str) -> DataFrame:
    # corpus-sized frames join on doc_id; the cluster frame is dup-graph-
    # sized (≪ corpus) and broadcast, so curation adds no extra shuffle
    # beyond the exact-dedup hash window
    corpus = _corpus(spark, sf_dir)
    stats = T.text_stats(corpus).select(
        "doc_id", "n_tokens", "stopword_bp", F.col("keep").alias("keep_quality")
    )
    ex = D.exact_dedup(corpus).select(
        "doc_id", F.col("is_dup").alias("is_exact_dup")
    )
    cl = _minhash_clusters(spark, sf_dir).select(
        F.col("id").alias("doc_id"), "cluster_id", "cluster_size", "is_canonical"
    )
    return (
        stats.join(ex, "doc_id")
        .join(F.broadcast(cl), "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "stopword_bp",
            "keep_quality",
            "is_exact_dup",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
            F.coalesce("cluster_size", F.lit(1).cast("long")).alias("cluster_size"),
            F.coalesce("is_canonical", F.lit(True)).alias("is_canonical"),
            (
                F.col("keep_quality")
                & ~F.col("is_exact_dup")
                & F.coalesce("is_canonical", F.lit(True))
            ).alias("selected"),
        )
    )


@register(
    "docs_dedup_simhash",
    f"""
WITH {SQL_CORPUS},
hs AS (SELECT doc_id, list_transform({SQL_TOKS}, t -> {sql_h("'simhash'", "t")}) AS hs FROM corpus),
sim AS (SELECT doc_id,
          list_sum(list_transform(range(0, {D.SIMHASH_BITS}), b ->
            CASE WHEN list_sum(list_transform(hs, h -> ((h >> b) & 1) * 2 - 1)) > 0
                 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS simhash
        FROM hs),
blocks AS (SELECT doc_id, simhash, i AS block_id,
             (simhash >> (i * {D.BLOCK_BITS})) & {(1 << D.BLOCK_BITS) - 1} AS block_val
           FROM sim CROSS JOIN range(0, {D.SIMHASH_BLOCKS}) t(i)),
pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
            bit_count(xor(a.simhash, b.simhash)) AS hamming
          FROM blocks a JOIN blocks b
            ON a.block_id = b.block_id AND a.block_val = b.block_val AND a.doc_id < b.doc_id)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3""",
    "SimHash near-dup: 48-bit fingerprint, 4-block pigeonhole banding, Hamming <= 3",
)
def docs_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_pairs(_corpus(spark, sf_dir), max_bucket=100_000)


@register(
    "docs_jaccard_knn",
    f"""
WITH {SQL_CORPUS},
{SQL_SHINGLES},
probes AS (SELECT doc_id AS probe_id, sh AS psh FROM sh WHERE doc_id < 10),
scored AS (SELECT probe_id, s.doc_id AS neighbor_id,
             (10000 * len(list_intersect(psh, s.sh)))
               // (len(psh) + len(s.sh) - len(list_intersect(psh, s.sh))) AS jaccard_bp
           FROM probes CROSS JOIN sh s WHERE s.doc_id != probe_id),
r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
                                   ORDER BY jaccard_bp DESC, neighbor_id) AS rnk
      FROM scored)
SELECT probe_id, neighbor_id, jaccard_bp FROM r WHERE rnk = 1""",
    "exact n-gram-Jaccard nearest neighbor for a broadcast probe set",
)
def docs_jaccard_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    # shared by the probe extraction (broadcast side) and the corpus scan
    sigs = materialize(D.shingle_sets(_corpus(spark, sf_dir)))
    probes = sigs.filter(F.col("id") < 10).select(
        F.col("id").alias("probe_id"), F.col("shingles").alias("psh")
    )
    inter = F.size(F.array_intersect("psh", "shingles"))
    union = F.size("psh") + F.size("shingles") - inter
    scored = (
        sigs.join(F.broadcast(probes), F.col("id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("id").alias("neighbor_id"),
            F.floor(F.lit(10000) * inter / union).cast("long").alias("jaccard_bp"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("jaccard_bp"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("probe_id", "neighbor_id", "jaccard_bp")
    )


# ================================================================ embeddings

SQL_EMB = "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"


@register(
    "emb_cosine_topk",
    f"""
WITH {SQL_EMB},
p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 8),
scored AS (SELECT probe_id, e.vec_id AS neighbor_id, list_cosine_similarity(pv, e.v) AS cos
           FROM e CROSS JOIN p WHERE e.vec_id != probe_id),
r AS (SELECT probe_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
SELECT probe_id, neighbor_id, rank, CAST(floor(100000 * cos) AS BIGINT) AS cos_bp
FROM r WHERE rank <= 5""",
    "brute-force exact top-k cosine for a broadcast probe set (the ANN baseline)",
)
def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return E.cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)


@register(
    "emb_pq_codes",
    f"""
WITH {SQL_EMB},
subs AS (SELECT vec_id AS id, s.sub,
           v[(s.sub * (len(v) // 4) + 1):((s.sub + 1) * (len(v) // 4))] AS sv
         FROM e, (SELECT unnest(range(0, 4)) AS sub) s),
cb AS (SELECT sub, id AS code, sv AS cv FROM subs WHERE id < 16),
scored AS (SELECT subs.id, subs.sub, cb.code,
    list_reduce(list_prepend(CAST(0 AS DOUBLE),
      list_transform(range(1, 1 + len(sv)),
                     i -> (sv[i] - cv[i]) * (sv[i] - cv[i]))),
      (a, b) -> a + b) AS d2
  FROM subs JOIN cb USING (sub)),
best AS (SELECT id, sub, code, d2 FROM (
           SELECT *, row_number() OVER (PARTITION BY id, sub
                                        ORDER BY d2, code) AS rn
           FROM scored) WHERE rn = 1),
packed AS (SELECT id, list(code ORDER BY sub) AS codes,
                  list(d2 ORDER BY sub) AS d2s
           FROM best GROUP BY 1)
SELECT id AS vec_id,
  CAST(codes[1] AS BIGINT) AS code0, CAST(codes[2] AS BIGINT) AS code1,
  CAST(codes[3] AS BIGINT) AS code2, CAST(codes[4] AS BIGINT) AS code3,
  CAST(floor(10000 * list_reduce(list_prepend(CAST(0 AS DOUBLE), d2s),
                                 (a, b) -> a + b)) AS BIGINT) AS err_bp
FROM packed""",
    "product-quantization encoding (the IVF-PQ compression step): m=4 "
    "subspaces, 16-entry codebook per subspace from the lowest-id "
    "vectors; broadcast codebook, m-way explode, two combinable "
    "aggregates — linear in the corpus",
)
def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return E.pq_codes(load_table(spark, sf_dir, "embeddings"))


def _sql_lsh_code(vexpr: str) -> str:
    """DuckDB rendering of embed.lsh_bucket_expr for a DOUBLE[] column:
    per plane, the ±1 sign vector comes from hash64('plane<p>', dim) and
    the projection is the same sequential fold as the Spark side."""
    terms = []
    for p in range(E.N_PLANES):
        sign = f"CAST((({sql_h(repr(f'plane{p}'), '(i - 1)::VARCHAR')} & 1) * 2 - 1) AS DOUBLE)"
        proj = (
            "list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(range(1, 1 + len({vexpr})), "
            f"i -> {vexpr}[i] * {sign})), (a, b) -> a + b)"
        )
        terms.append(
            f"CASE WHEN {proj} > 0 THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        )
    return "(" + " + ".join(terms) + ")"


_ANN_LSH_SQL = f"""
WITH {SQL_EMB},
coded AS (SELECT vec_id, v, {_sql_lsh_code('v')} AS bucket FROM e),
p AS (SELECT vec_id AS probe_id, v AS pv, bucket FROM coded WHERE vec_id < 8),
scored AS (SELECT probe_id, c.vec_id AS neighbor_id, list_cosine_similarity(pv, c.v) AS cos
           FROM coded c JOIN p USING (bucket) WHERE c.vec_id != probe_id),
r AS (SELECT probe_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
SELECT probe_id, neighbor_id, rank, CAST(floor(100000 * cos) AS BIGINT) AS cos_bp
FROM r WHERE rank <= 3"""


@register(
    "emb_ann_lsh",
    _ANN_LSH_SQL,
    "LSH-bucketed approximate top-k: 6 sign hyperplanes, probes scan only their bucket",
)
def emb_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return E.ann_lsh_topk(emb, emb.filter(F.col("vec_id") < 8), k=3)


@register(
    "emb_ann_lsh_multiprobe",
    f"""
WITH {{SQL_EMB}},
coded AS (SELECT vec_id, v, {{code}} AS bucket FROM e),
masks AS (SELECT unnest([0, 1, 2, 4, 8, 16, 32]) AS m),
p AS (SELECT vec_id AS probe_id, pv, xor(b0, m) AS bucket
      FROM (SELECT vec_id, v AS pv, bucket AS b0 FROM coded WHERE vec_id < 8)
      CROSS JOIN masks),
scored AS (SELECT probe_id, c.vec_id AS neighbor_id, list_cosine_similarity(pv, c.v) AS cos
           FROM coded c JOIN p USING (bucket) WHERE c.vec_id != probe_id),
r AS (SELECT probe_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
SELECT probe_id, neighbor_id, rank, CAST(floor(100000 * cos) AS BIGINT) AS cos_bp
FROM r WHERE rank <= 3""".format(SQL_EMB=SQL_EMB, code=_sql_lsh_code("v")),
    "multi-probe LSH top-k (Lv et al., VLDB'07): each probe also visits "
    "the n_planes buckets one hyperplane-bit away — recall@3 measured "
    "8%→33% at sf0.1 and 75%→96% at the 8x soak vs single-bucket "
    "(SCALE.md r8) for a 7x bounded probe-side fan-out that never "
    "touches the corpus side of the equi-join",
)
def emb_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return E.ann_lsh_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=3, hamming_probes=1
    )


#: the IVF-Flat probe chain (16 deterministic centroids, nprobe=4, top-3
#: per probe) — shared by the ANN query and the recall evaluation so the
#: two oracles can never disagree on the index definition
SQL_IVF_CHAIN = """
cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < 16),
asg0 AS (SELECT e.vec_id AS id, e.v, centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_cosine_similarity(e.v, cv) DESC, centroid_id) AS r
         FROM e CROSS JOIN cent),
lists AS (SELECT id, v, centroid_id FROM asg0 WHERE r = 1),
p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 8),
pl0 AS (SELECT probe_id, pv, centroid_id,
          row_number() OVER (PARTITION BY probe_id
                             ORDER BY list_cosine_similarity(pv, cv) DESC, centroid_id) AS r
        FROM p CROSS JOIN cent),
pl AS (SELECT probe_id, pv, centroid_id FROM pl0 WHERE r <= 4),
scored AS (SELECT probe_id, l.id AS neighbor_id, list_cosine_similarity(pv, l.v) AS cos
           FROM lists l JOIN pl USING (centroid_id) WHERE l.id != probe_id),
rk AS (SELECT probe_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank
       FROM scored)
""".strip()


@register(
    "emb_ann_ivf",
    f"""
WITH {SQL_EMB},
{SQL_IVF_CHAIN}
SELECT probe_id, neighbor_id, rank, CAST(floor(100000 * cos) AS BIGINT) AS cos_bp
FROM rk WHERE rank <= 3""",
    "IVF-Flat approximate top-k: 16 deterministic centroids, nprobe=4 inverted-list probe",
)
def emb_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return E.ann_ivf_topk(
        emb, emb.filter(F.col("vec_id") < 8), k=3, n_centroids=16, nprobe=4
    )


@register(
    "emb_ann_recall",
    f"""
WITH {SQL_EMB},
{SQL_IVF_CHAIN},
approx AS (SELECT probe_id, neighbor_id FROM rk WHERE rank <= 3),
ex0 AS (SELECT probe_id, e.vec_id AS neighbor_id,
          row_number() OVER (PARTITION BY probe_id
                             ORDER BY list_cosine_similarity(pv, e.v) DESC, e.vec_id) AS rank
        FROM e CROSS JOIN p WHERE e.vec_id != probe_id),
exact AS (SELECT probe_id, neighbor_id FROM ex0 WHERE rank <= 3)
SELECT probe_id, CAST(count(*) AS BIGINT) AS n_exact,
  CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
  (10000 * count(a.neighbor_id)) // count(*) AS recall_bp
FROM exact LEFT JOIN approx a USING (probe_id, neighbor_id)
GROUP BY probe_id""",
    "ANN recall@3 evaluation: the IVF-Flat result anti-checked against "
    "brute-force exact top-3 per probe — the index-quality gate run "
    "before trusting nprobe/n_centroids at corpus scale; the exact side "
    "is the (broadcast-probe) linear scan, never a corpus self-join",
)
def emb_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 8)
    exact = E.cosine_topk(emb, probes, k=3).select("probe_id", "neighbor_id")
    approx = E.ann_ivf_topk(emb, probes, k=3, n_centroids=16, nprobe=4).select(
        "probe_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(approx, ["probe_id", "neighbor_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.count("hit").alias("n_hit"),
            F.floor(F.lit(10000) * F.count("hit") / F.count("*"))
            .cast("long")
            .alias("recall_bp"),
        )
    )


def _sql_lloyd(i: int) -> str:
    """One Lloyd iteration c{i} → c{i+1} (assign by cosine, integer-mean
    update on the micro-unit grid — matches embed.kmeans_centroids)."""
    o = i + 1
    return f"""
s{o} AS (SELECT q.vec_id, q.qv, c.centroid_id,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY list_cosine_similarity(q.v, list_transform(c.cq, x -> x / 1000000.0)) DESC,
                                       c.centroid_id) AS r
         FROM q CROSS JOIN c{i} c),
a{o} AS (SELECT vec_id, qv, centroid_id FROM s{o} WHERE r = 1),
u{o} AS (SELECT centroid_id, generate_subscripts(qv, 1) AS i, unnest(qv) AS x FROM a{o}),
m{o} AS (SELECT centroid_id, i, CAST(floor(1.0 * sum(x) / count(*)) AS BIGINT) AS comp
         FROM u{o} GROUP BY centroid_id, i),
c{o} AS (SELECT centroid_id, list(comp ORDER BY i) AS cq FROM m{o} GROUP BY centroid_id)""".strip()


@register(
    "emb_kmeans_ivf",
    f"""
WITH {SQL_EMB},
q AS (SELECT vec_id, v, list_transform(v, x -> CAST(floor(x * 1000000) AS BIGINT)) AS qv FROM e),
c0 AS (SELECT vec_id AS centroid_id, qv AS cq FROM q WHERE vec_id < 8),
{_sql_lloyd(0)},
{_sql_lloyd(1)},
cent AS (SELECT centroid_id, list_transform(cq, x -> x / 1000000.0) AS cv FROM c2),
asg AS (SELECT e.vec_id AS id, e.v, centroid_id,
          row_number() OVER (PARTITION BY e.vec_id
                             ORDER BY list_cosine_similarity(e.v, cv) DESC, centroid_id) AS r
        FROM e CROSS JOIN cent),
lists AS (SELECT id, v, centroid_id FROM asg WHERE r = 1),
p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 8),
pl0 AS (SELECT probe_id, pv, centroid_id,
          row_number() OVER (PARTITION BY probe_id
                             ORDER BY list_cosine_similarity(pv, cv) DESC, centroid_id) AS r
        FROM p CROSS JOIN cent),
pl AS (SELECT probe_id, pv, centroid_id FROM pl0 WHERE r <= 2),
scored AS (SELECT probe_id, l.id AS neighbor_id, list_cosine_similarity(pv, l.v) AS cos
           FROM lists l JOIN pl USING (centroid_id) WHERE l.id != probe_id),
rk AS (SELECT probe_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, neighbor_id) AS rank
       FROM scored)
SELECT probe_id, neighbor_id, rank, CAST(floor(100000 * cos) AS BIGINT) AS cos_bp
FROM rk WHERE rank <= 3""",
    "IVF-Flat with a k-means-TRAINED quantizer: 2 Lloyd iterations in "
    "pure DataFrame algebra (integer micro-unit grid → order-free exact "
    "means, map-only assignment via one broadcast centroid row), then "
    "the nprobe=2 inverted-list probe over the trained index",
)
def emb_kmeans_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = E.kmeans_centroids(emb, n_centroids=8, iters=2)
    return E.ann_ivf_topk(
        emb,
        emb.filter(F.col("vec_id") < 8),
        k=3,
        n_centroids=8,
        nprobe=2,
        centroids=cents,
    )


#: embedding corpus with synthesized duplicates: exact copies (+100000,
#: vec_id%10==0) and near copies (+200000, vec_id%7==0, first component
#: scaled 1.2x — cosine stays near 1 but not exactly 1)
SQL_EMB_DUP = f"""
{SQL_EMB},
exact_e AS (SELECT vec_id + 100000 AS vec_id, v FROM e WHERE vec_id % 10 = 0),
near_e AS (SELECT vec_id + 200000 AS vec_id,
             list_transform(range(1, len(v) + 1),
                            i -> CASE WHEN i = 1 THEN v[1] * 1.2 ELSE v[i] END) AS v
           FROM e WHERE vec_id % 7 = 0),
corp AS (SELECT * FROM e UNION ALL SELECT * FROM exact_e UNION ALL SELECT * FROM near_e)
""".strip()


def _emb_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    exact = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    near = emb.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        F.transform(
            "embedding", lambda x, i: F.when(i == 0, x * 1.2).otherwise(x)
        ).alias("embedding"),
    )
    return emb.unionByName(exact).unionByName(near)


@register(
    "emb_near_dup",
    f"""
WITH {SQL_EMB_DUP},
coded AS (SELECT vec_id, v, {_sql_lsh_code('v')} AS bucket FROM corp),
pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            CAST(floor(100000 * list_cosine_similarity(a.v, b.v)) AS BIGINT) AS cos_bp
          FROM coded a JOIN coded b
            ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT id_a, id_b, cos_bp FROM pairs WHERE cos_bp >= 99000""",
    "embedding-cosine near-dup pairs: same-LSH-bucket equi-join + exact cosine threshold",
)
def emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return E.cosine_near_dup_pairs(
        _emb_dup_corpus(spark, sf_dir), min_cos_bp=99000, max_bucket=100_000
    )


@register(
    "emb_dedup_clusters",
    f"""
WITH RECURSIVE {SQL_EMB_DUP},
coded AS (SELECT vec_id, v, {_sql_lsh_code('v')} AS bucket FROM corp),
pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            CAST(floor(100000 * list_cosine_similarity(a.v, b.v)) AS BIGINT) AS cos_bp
          FROM coded a JOIN coded b
            ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
verified AS MATERIALIZED (SELECT id_a, id_b FROM pairs WHERE cos_bp >= 99000),
{sql_cc("verified")}
SELECT id, cluster_id, cluster_size, is_canonical FROM clusters""",
    "embedding near-dup clusters: the same connected-components operator "
    "over the cosine pair graph — one dedup_clusters consumer for text "
    "sketches and embeddings alike",
)
def emb_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = E.cosine_near_dup_pairs(
        _emb_dup_corpus(spark, sf_dir), min_cos_bp=99000, max_bucket=100_000
    )
    return D.dedup_clusters(pairs.select("id_a", "id_b"))


# ================================================================ multimodal

@register(
    "mm_payload_features",
    """
SELECT doc_id,
  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
  md5(text) AS digest
FROM documents""",
    "binary payload plumbing: Arrow-batched mapInPandas feature extraction (decode stub)",
)
def mm_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return M.payload_features(M.with_payload(docs))


@register(
    "mm_image_decode",
    """
WITH d AS (SELECT doc_id, md5(text) AS digest FROM documents),
b AS (SELECT doc_id, digest, unnest(range(0, 3)) AS blk FROM d),
v AS (SELECT doc_id,
        CAST(concat('0x', substr(md5(concat('img:', digest, ':', blk::VARCHAR)), 1, 15))
             AS BIGINT) % 256 AS val
      FROM b)
SELECT doc_id, 16 AS width, 16 AS height, CAST(768 AS BIGINT) AS n_px,
       CAST(SUM(val * 256) AS BIGINT) AS px_checksum
FROM v GROUP BY doc_id""",
    "image decode+resize plumbing: mapInPandas ships the full 16x16x3 pixel "
    "array through Arrow (deterministic fake decoder); the checksum folds "
    "every pixel back to an integer the oracle reproduces per 256-px block",
)
def mm_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    decoded = M.decode_image(M.with_payload(docs), 16, 16)
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.size("pixels").cast("long").alias("n_px"),
        F.aggregate(
            "pixels",
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.round(x * 255).cast("long"),
        ).alias("px_checksum"),
    )


@register(
    "mm_frame_sample",
    """
WITH d AS (SELECT doc_id, md5(text) AS digest,
                  octet_length(CAST(text AS BLOB)) AS n_bytes
           FROM documents)
SELECT doc_id, unnest(range(0, n_bytes // 100 + 1)) AS frame_idx,
       unnest(range(0, n_bytes // 100 + 1)) * 100 AS ts_ms,
       md5('frm:' || digest || ':' || unnest(range(0, n_bytes // 100 + 1))::VARCHAR)
         AS frame_digest
FROM d""",
    "video frame-sample plumbing: one-to-many mapInPandas fan-out, ten frames "
    "per second of (fake) clip, per-frame digest chained from the payload",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return M.sample_frames(M.with_payload(docs), every_ms=100)


# =========================================================== selection

# deterministic per-source sampling rates: src<i> keeps 500 + (i*450)%9000
# basis points — the same closed-form expression on both sides, so no
# rate table needs shipping
_RATE_SQL = "500 + (CAST(substr(source, 4) AS BIGINT) * 450) % 9000"


@register(
    "docs_sample_stratified",
    f"""
SELECT doc_id, source,
       {sql_h("'strat'", "CAST(doc_id AS VARCHAR)")} % 10000 AS samp_key,
       {_RATE_SQL} AS rate_bp
FROM documents
WHERE {sql_h("'strat'", "CAST(doc_id AS VARCHAR)")} % 10000 < {_RATE_SQL}""",
    "deterministic stratified sampling: per-source keep rates decided by "
    "a keyed hash of the doc id — map-only, rerun-stable, no rand()",
)
def docs_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdb_spark.pipeline import sampling as S

    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(500) + (F.substring("source", 4, 8).cast("long") * 450) % 9000
    return S.stratified_sample(docs, rate).select(
        "doc_id", "source", "samp_key", "rate_bp"
    )


@register(
    "docs_keywords",
    f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, unnest({SQL_TOKS}) AS token FROM documents),
tf AS MATERIALIZED (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM t GROUP BY doc_id, token),
df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token),
r AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
        CAST(row_number() OVER (PARTITION BY tf.doc_id
               ORDER BY tf.tf DESC, df.df ASC, tf.token ASC) AS BIGINT) AS rank
      FROM tf JOIN df USING (token))
SELECT doc_id, token, tf, df, rank FROM r WHERE rank <= 3""",
    "per-document keyword extraction: top tokens by (tf desc, df asc) — "
    "integer-exact tf-idf ranking; shuffle bounded by distinct (doc,token)",
)
def docs_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.doc_keywords(load_table(spark, sf_dir, "documents"), top=3)


# decontamination runs over the synthesized dup-corpus (SQL_CORPUS):
# the probe set is the base docs with doc_id % 14 == 0, whose exact
# (+100000) and near (+200000) copies in the corpus are contaminated by
# construction — a driver corpus with planted leakage on both sides
SQL_DECON = f"""
dtoks AS MATERIALIZED (SELECT doc_id, {SQL_TOKS} AS toks FROM corpus),
dsh AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(toks) - 3),
                  i -> {sql_h("'decon'", "array_to_string(toks[i:i+4], ' ')")}))) AS sh
  FROM dtoks WHERE len(toks) >= 5)
""".strip()


@register(
    "docs_decontaminate",
    f"""
WITH {SQL_CORPUS},
{SQL_DECON},
probe AS (SELECT DISTINCT doc_id AS probe_id, sh FROM dsh
          WHERE doc_id < 100000 AND doc_id % 14 = 0),
rest AS (SELECT doc_id, sh FROM dsh
         WHERE doc_id >= 100000 OR doc_id % 14 <> 0)
SELECT r.doc_id,
       CAST(count(DISTINCT r.sh) AS BIGINT) AS n_shared,
       CAST(count(DISTINCT p.probe_id) AS BIGINT) AS n_probe_docs
FROM rest r JOIN probe p ON r.sh = p.sh
GROUP BY r.doc_id""",
    "benchmark decontamination: corpus docs sharing a 5-token shingle "
    "with the probe set — broadcast probe join, never quadratic",
)
def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdb_spark.pipeline import sampling as S

    corpus = _corpus(spark, sf_dir)
    probes = corpus.filter((F.col("doc_id") < 100000) & (F.col("doc_id") % 14 == 0))
    rest = corpus.filter((F.col("doc_id") >= 100000) | (F.col("doc_id") % 14 != 0))
    return S.decontaminate(rest, probes, k=5)


@register(
    "mm_audio_features",
    """
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
w AS (SELECT doc_id, text, n, unnest(range(0, (n + 63) // 64)) AS win_idx FROM d),
c AS (SELECT doc_id, win_idx,
        list_transform(range(win_idx * 64 + 1, least((win_idx + 1) * 64, n) + 1),
                       p -> ascii(substr(text, CAST(p AS INT), 1)) - 128) AS codes
      FROM w)
SELECT doc_id, win_idx,
  CAST(len(codes) AS BIGINT) AS n_samples,
  CAST(list_sum(list_transform(codes, x -> x * x)) AS BIGINT) AS energy,
  CAST(coalesce(list_sum(list_transform(range(1, len(codes)),
         i -> CASE WHEN (codes[i] > 0 AND codes[i+1] < 0)
                     OR (codes[i] < 0 AND codes[i+1] > 0)
              THEN 1 ELSE 0 END)), 0) AS BIGINT) AS zero_crossings,
  CAST(list_max(list_transform(codes, x -> abs(x))) AS BIGINT) AS peak
FROM c""",
    "audio feature plumbing: payload as 8-bit PCM, per-64-sample frame "
    "integer energy / zero-crossings / peak via Arrow-batched mapInPandas "
    "(one-to-many fan-out; a real codec swaps in at the byte-source line)",
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return M.audio_features(M.with_payload(docs))


_IVF_INDEXES: dict = {}


@register(
    "emb_ivf_persisted",
    None,  # oracle assigned below: identical to emb_ann_ivf by design
    "persisted IVF index (vecindex.IvfIndex): centroids + per-list "
    "partitioned parquet built once, probe reads pruned to nprobe lists; "
    "answers bit-identically to the in-memory build (same oracle)",
)
def emb_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from tsdb_spark.pipeline.vecindex import IvfIndex

    emb = load_table(spark, sf_dir, "embeddings")
    if sf_dir not in _IVF_INDEXES:
        root = tempfile.mkdtemp(prefix="tsdb_q_ivfidx_")
        IvfIndex.build(spark, emb, root, n_centroids=16)
        _IVF_INDEXES[sf_dir] = root
    idx = IvfIndex.open(spark, _IVF_INDEXES[sf_dir])
    return idx.search(emb.filter(F.col("vec_id") < 8), k=3, nprobe=4)


# the persisted index must answer exactly like the in-memory build — one
# oracle covers both (divergence = a bug in the index roundtrip)
from tsdb_spark.queries import QUERIES as _Q  # noqa: E402

_Q["emb_ivf_persisted"].oracle = _Q["emb_ann_ivf"].oracle


@register(
    "docs_bigram_familiarity",
    f"""
WITH t AS MATERIALIZED (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
b AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(toks)),
           i -> toks[i] || ' ' || toks[i+1]))) AS bg
  FROM t WHERE len(toks) >= 2),
df AS (SELECT bg, CAST(count(*) AS BIGINT) AS df FROM b GROUP BY bg)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
  CAST(count(*) FILTER (WHERE df >= 2) AS BIGINT) AS n_familiar,
  (10000 * count(*) FILTER (WHERE df >= 2)) // count(*) AS familiarity_bp
FROM b JOIN df USING (bg) GROUP BY doc_id""",
    "LM-proxy quality: fraction of a doc's distinct bigrams seen in >= 2 "
    "docs (integer perplexity stand-in); shuffle ∝ distinct bigram "
    "occurrences, df table vocabulary-sized",
)
def docs_bigram_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.bigram_familiarity(load_table(spark, sf_dir, "documents"))


@register(
    "emb_corpus_map",
    f"""
WITH {SQL_EMB},
q AS (SELECT vec_id, v, list_transform(v, x -> CAST(floor(x * 1000000) AS BIGINT)) AS qv FROM e),
c0 AS (SELECT vec_id AS centroid_id, qv AS cq FROM q WHERE vec_id < 8),
{_sql_lloyd(0)},
{_sql_lloyd(1)},
cent AS (SELECT centroid_id, list_transform(cq, x -> x / 1000000.0) AS cv FROM c2),
asg AS (SELECT e.vec_id, centroid_id,
          row_number() OVER (PARTITION BY e.vec_id
                             ORDER BY list_cosine_similarity(e.v, cv) DESC, centroid_id) AS r
        FROM e CROSS JOIN cent),
a AS (SELECT vec_id, centroid_id FROM asg WHERE r = 1)
SELECT a.centroid_id AS cluster_id, d.lang, d.source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(d.n_chars) AS BIGINT) AS total_chars
FROM a JOIN documents d ON d.doc_id = a.vec_id
GROUP BY 1, 2, 3""",
    "corpus map (dataset-card rollup): k-means cluster assignment of the "
    "embeddings joined to document metadata on doc_id=vec_id, rolled up "
    "per (cluster, lang, source) — the docs-side join broadcasts the "
    "(vec_id, cluster) assignment; rollup keys ∝ clusters x langs x "
    "sources, independent of corpus size",
)
def emb_corpus_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    cents = E.kmeans_centroids(emb, n_centroids=8, iters=2)
    asg = E.ivf_assign(emb, n_centroids=8, centroids=cents).select(
        F.col("id").alias("vec_id"), F.col("centroid_id").alias("cluster_id")
    )
    return (
        docs.join(F.broadcast(asg), docs["doc_id"] == asg["vec_id"])
        .groupBy("cluster_id", "lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# ====================================================== round-4 additions

#: deterministic PII planting: the synthetic corpus has no natural
#: emails/ids, so every 13th doc gets a contact line appended — the same
#: construction on both engines (the dedup-corpus pattern)
SQL_PII_CORPUS = """
pc AS (SELECT doc_id,
         text || CASE WHEN doc_id % 13 = 0
                      THEN ' contact user' || doc_id
                           || '@example.com ref 900' || doc_id
                      ELSE '' END AS text
       FROM documents)
""".strip()


@register(
    "docs_pii_scrub",
    f"""
WITH {SQL_PII_CORPUS}
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{T.PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{T.PII_DIGITS_RE}')) AS BIGINT) AS n_long_digits,
  CAST(coalesce(list_sum(list_transform(regexp_extract_all(text, '{T.PII_EMAIL_RE}'),
                                        m -> length(m))), 0)
     + coalesce(list_sum(list_transform(regexp_extract_all(text, '{T.PII_DIGITS_RE}'),
                                        m -> length(m))), 0) AS BIGINT) AS masked_chars,
  CAST(len(regexp_extract_all(text, '{T.PII_EMAIL_RE}')) > 0
       OR len(regexp_extract_all(text, '{T.PII_DIGITS_RE}')) > 0 AS INT) AS has_pii
FROM pc""",
    "PII detection report (the pre-release compliance gate): per doc the "
    "email-address and long-digit-run match counts, total chars a "
    "redaction would mask, and the scrub verdict — patterns restricted "
    "to the Java/RE2-agreeing regex subset; MAP-ONLY, zero shuffle, "
    "match lists never leave the task",
)
def docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com ref 900"),
                    F.col("doc_id").cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return T.pii_stats(planted)


@register(
    "docs_dup_span_coverage",
    f"""
WITH {SQL_CORPUS},
nz AS (SELECT doc_id, {SQL_TOKS} AS toks FROM corpus WHERE len({SQL_TOKS}) >= 1),
e AS (SELECT doc_id, toks, unnest(range(0, len(toks), 8)) AS chunk_start FROM nz),
h AS (SELECT doc_id,
        {sql_h("'chunk'", "array_to_string(toks[chunk_start+1:chunk_start+16], ' ')")} AS chunk_hash
      FROM e),
df AS (SELECT chunk_hash, count(DISTINCT doc_id) AS ndocs FROM h GROUP BY 1)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
  CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
  CAST((10000 * sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
    AS dup_bp
FROM h JOIN df USING (chunk_hash) GROUP BY doc_id""",
    "duplicate-span coverage (the substring-dedup signal of Lee et al., "
    "'Deduplicating Training Data Makes Language Models Better'): per "
    "doc, the fraction of its 16-token windows (stride 8) whose content "
    "digest appears in >= 2 docs — catches partial/boilerplate overlap "
    "that whole-doc hashes miss. Shuffle ∝ distinct window digests "
    "(combinable df agg + one equi-join back); never doc x doc",
)
def docs_dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = T.chunk_windows(_corpus(spark, sf_dir), size=16, stride=8).select(
        "doc_id", "chunk_hash"
    )
    df_tbl = ch.groupBy("chunk_hash").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    dup = F.sum(F.when(F.col("ndocs") >= 2, 1).otherwise(0)).cast("long")
    return (
        ch.join(df_tbl, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            dup.alias("n_dup_windows"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_dup_windows",
            F.expr("10000 * n_dup_windows div n_windows").alias("dup_bp"),
        )
    )


@register(
    "emb_sq8_recall",
    f"""
WITH {SQL_EMB},
dims AS (SELECT i, min(v[i]) AS lo, max(v[i]) AS hi
         FROM e CROSS JOIN (SELECT unnest(range(1, (SELECT len(v) FROM e LIMIT 1) + 1)) AS i) d
         GROUP BY i),
g AS (SELECT list(lo ORDER BY i) AS los, list(hi ORDER BY i) AS his FROM dims),
q AS (SELECT vec_id, list_transform(range(1, len(v) + 1),
        i -> CASE WHEN his[i] > los[i]
                  THEN least(255, CAST(floor((v[i] - los[i]) * 255 / (his[i] - los[i])) AS BIGINT))
                  ELSE 0 END) AS c
      FROM e, g),
p AS (SELECT vec_id AS probe_id, c AS pc FROM q WHERE vec_id < 8),
sc AS (SELECT probe_id, q.vec_id AS neighbor_id,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(range(1, 1 + len(pc)), i ->
             (CASE WHEN his[i] > los[i]
                   THEN los[i] + (pc[i] + 0.5) * (his[i] - los[i]) / 255
                   ELSE los[i] END)
             * (CASE WHEN his[i] > los[i]
                     THEN los[i] + (q.c[i] + 0.5) * (his[i] - los[i]) / 255
                     ELSE los[i] END))), (a, b) -> a + b) AS dot
       FROM q CROSS JOIN p, g WHERE q.vec_id != probe_id),
ar AS (SELECT probe_id, neighbor_id,
         row_number() OVER (PARTITION BY probe_id ORDER BY dot DESC, neighbor_id) AS rank
       FROM sc),
approx AS (SELECT probe_id, neighbor_id FROM ar WHERE rank <= 5),
pv AS (SELECT vec_id AS probe_id, v AS pvec FROM e WHERE vec_id < 8),
ex0 AS (SELECT probe_id, e.vec_id AS neighbor_id,
          row_number() OVER (PARTITION BY probe_id
                             ORDER BY list_cosine_similarity(pvec, e.v) DESC, e.vec_id) AS rank
        FROM e CROSS JOIN pv WHERE e.vec_id != probe_id),
exact AS (SELECT probe_id, neighbor_id FROM ex0 WHERE rank <= 5)
SELECT probe_id, CAST(count(*) AS BIGINT) AS n_exact,
  CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
  (10000 * count(a.neighbor_id)) // count(*) AS recall_bp
FROM exact LEFT JOIN approx a USING (probe_id, neighbor_id)
GROUP BY probe_id""",
    "8-bit scalar quantization recall@5: vectors compressed 4x to uint8 "
    "codes on a per-dimension [lo,hi] grid, neighbors scored by the "
    "DEQUANTIZED cell-center dot product (FAISS ScalarQuantizer "
    "arrangement — the raw integer-code dot measured ~4% recall, its "
    "per-dim shift cross-terms swamp the signal; see embed.sq8_topk), "
    "anti-checked against brute-force cosine — the "
    "memory-compression ANN path graded the same way as IVF/PQ. Grid is "
    "one broadcast row (dim-sized combinable agg), corpus never shuffles "
    "except the per-probe top-k window",
)
def emb_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 8)
    exact = E.cosine_topk(emb, probes, k=5).select("probe_id", "neighbor_id")
    approx = E.sq8_topk(emb, probes, k=5).select(
        "probe_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(approx, ["probe_id", "neighbor_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.count("*").alias("n_exact"),
            F.count("hit").alias("n_hit"),
            F.floor(F.lit(10000) * F.count("hit") / F.count("*"))
            .cast("long")
            .alias("recall_bp"),
        )
    )


@register(
    "docs_pack_shards",
    f"""
WITH d AS (SELECT source, doc_id,
             CAST(len({SQL_TOKS}) AS BIGINT) AS n_tok
           FROM documents),
c AS (SELECT *, sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS cum_before
      FROM d)
SELECT source AS part, CAST(cum_before // 2048 AS BIGINT) AS shard_id,
  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tok_sum,
  min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY 1, 2""",
    "sequence packing into training shards: per source stream (doc_id "
    "order), docs are concatenated and cut every 2048 tokens "
    "(concat-and-split, the pretraining batch layout); one row per "
    "shard with doc count / token sum / id range. Running sum is "
    "windowed per source — no global sort; rollup is combinable",
)
def docs_pack_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.pack_shards(load_table(spark, sf_dir, "documents"), budget=2048)


@register(
    "docs_importance_weights",
    f"""
WITH t AS (SELECT doc_id, lang = 'en' AS is_t, {SQL_TOKS} AS toks FROM documents),
b AS (SELECT doc_id, is_t,
        unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
      FROM t WHERE len(toks) >= 2),
occ AS (SELECT doc_id, is_t, bg, CAST(count(*) AS BIGINT) AS n_occ
        FROM b GROUP BY 1, 2, 3),
cts AS (SELECT bg, CAST(sum(n_occ) AS BIGINT) AS ct_r,
          CAST(coalesce(sum(n_occ) FILTER (WHERE is_t), 0) AS BIGINT) AS ct_t
        FROM occ GROUP BY 1),
tot AS (SELECT CAST(sum(ct_r) AS BIGINT) AS nr, CAST(sum(ct_t) AS BIGINT) AS nt,
          CAST(count(*) AS BIGINT) AS v
        FROM cts)
SELECT doc_id, CAST(sum(n_occ) AS BIGINT) AS n_bigrams,
  CAST(sum(n_occ * CAST(round(1000 * (ln((ct_t + 1) / (nt + v))
                                    - ln((ct_r + 1) / (nr + v)))) AS BIGINT)) AS BIGINT)
    AS score_mn
FROM occ JOIN cts USING (bg) CROSS JOIN tot
GROUP BY doc_id""",
    "DSIR-style importance weights: per-doc log-likelihood ratio of a "
    "Laplace-smoothed target (lang=en) bigram LM vs the raw-corpus LM, "
    "each occurrence's milli-nat term integer-rounded BEFORE the sum "
    "(order-free exact fold). One explode + one combinable occurrence "
    "groupBy; LM tables vocabulary-sized; totals broadcast",
)
def docs_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.importance_weights(load_table(spark, sf_dir, "documents"))


_SQL_DSIR = f"""
t AS (SELECT doc_id, lang = 'en' AS is_t, {SQL_TOKS} AS toks FROM documents),
b AS (SELECT doc_id, is_t,
        unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bg
      FROM t WHERE len(toks) >= 2),
occ AS (SELECT doc_id, is_t, bg, CAST(count(*) AS BIGINT) AS n_occ
        FROM b GROUP BY 1, 2, 3),
cts AS (SELECT bg, CAST(sum(n_occ) AS BIGINT) AS ct_r,
          CAST(coalesce(sum(n_occ) FILTER (WHERE is_t), 0) AS BIGINT) AS ct_t
        FROM occ GROUP BY 1),
tot AS (SELECT CAST(sum(ct_r) AS BIGINT) AS nr, CAST(sum(ct_t) AS BIGINT) AS nt,
          CAST(count(*) AS BIGINT) AS v
        FROM cts),
w AS (SELECT doc_id,
        CAST(sum(n_occ * CAST(round(1000 * (ln((ct_t + 1) / (nt + v))
                                          - ln((ct_r + 1) / (nr + v)))) AS BIGINT)) AS BIGINT)
          AS score_mn
      FROM occ JOIN cts USING (bg) CROSS JOIN tot
      GROUP BY doc_id)
""".strip()


@register(
    "docs_mixture_sample",
    f"""
WITH {_SQL_DSIR},
s AS (SELECT d.doc_id, d.source, w.score_mn FROM documents d JOIN w USING (doc_id)),
r AS (SELECT *,
        CAST(row_number() OVER (PARTITION BY source
                                ORDER BY score_mn DESC, doc_id) AS BIGINT) AS rank,
        CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_src
      FROM s)
SELECT doc_id, source, score_mn, rank,
  CAST(CASE WHEN 4 * rank <= n_src THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM r""",
    "DSIR-guided mixture selection: the top quartile of each source "
    "stratum by importance weight (the deterministic analog of "
    "importance RESAMPLING — Xie et al. '23 select by sampling "
    "proportional to the weight; rank-thresholding makes the choice "
    "rerun-stable and driver-verifiable). Weights reuse the DSIR "
    "operator's combinable shape; ranking is one window per stratum "
    "over DOC-count-sized rows (never token rows). At 100 TB the exact "
    "per-stratum rank swaps for an approx-quantile score threshold "
    "with the identical upstream plan",
)
def docs_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = T.importance_weights(docs)
    s = docs.select("doc_id", "source").join(w.select("doc_id", "score_mn"), "doc_id")
    win = Window.partitionBy("source").orderBy(F.desc("score_mn"), F.asc("doc_id"))
    r = s.select(
        "doc_id",
        "source",
        "score_mn",
        F.row_number().over(win).cast("long").alias("rank"),
        F.count("*").over(Window.partitionBy("source")).cast("long").alias("n_src"),
    )
    return r.select(
        "doc_id",
        "source",
        "score_mn",
        "rank",
        F.when(4 * F.col("rank") <= F.col("n_src"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("kept"),
    )


@register(
    "emb_semdedup",
    f"""
WITH RECURSIVE {SQL_EMB_DUP},
q AS (SELECT vec_id, v, list_transform(v, x -> CAST(floor(x * 1000000) AS BIGINT)) AS qv FROM corp),
c0 AS (SELECT vec_id AS centroid_id, qv AS cq FROM q WHERE vec_id < 8),
{_sql_lloyd(0)},
{_sql_lloyd(1)},
cent AS (SELECT centroid_id, list_transform(cq, x -> x / 1000000.0) AS cv FROM c2),
asg0 AS (SELECT q.vec_id, q.v, centroid_id, cv,
           row_number() OVER (PARTITION BY q.vec_id
                              ORDER BY list_cosine_similarity(q.v, cv) DESC, centroid_id) AS r
         FROM q CROSS JOIN cent),
asg AS MATERIALIZED (SELECT vec_id, v, centroid_id,
         CAST(floor(100000 * list_cosine_similarity(v, cv)) AS BIGINT) AS cent_cos_bp
       FROM asg0 WHERE r = 1),
prs AS MATERIALIZED (SELECT a.vec_id AS id_a, b.vec_id AS id_b
       FROM asg a JOIN asg b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
       WHERE floor(100000 * list_cosine_similarity(a.v, b.v)) >= 99000),
{sql_cc("prs")},
m AS (SELECT asg.vec_id, asg.centroid_id, asg.cent_cos_bp,
        coalesce(cc.cluster_id, asg.vec_id) AS component
      FROM asg LEFT JOIN cc ON cc.id = asg.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY component
                                   ORDER BY cent_cos_bp ASC, vec_id ASC) AS rk
      FROM m)
SELECT vec_id, centroid_id, component, cent_cos_bp,
  CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM r""",
    "SemDeDup (Abbas et al. '23, public): k-means the corpus, find "
    "cosine-duplicate pairs ONLY within each cluster (the cluster bound "
    "is what makes semantic dedup tractable — pairwise work is "
    "sum(cluster^2), never corpus^2; k is chosen so clusters stay "
    "machine-sized at 100 TB), group duplicates into components, and "
    "keep each component's LOWEST-centroid-similarity member (the "
    "paper's keep-the-outlier rule). Reuses the trained k-means "
    "quantizer, the broadcast assignment, and the connected-components "
    "operator; the verdict columns are driver-verified bit-for-bit",
)
def emb_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    corp = _emb_dup_corpus(spark, sf_dir)
    cent = E.kmeans_centroids(corp, n_centroids=8, iters=2)
    asg = E.ivf_assign(corp, centroids=cent)  # (id, vec, centroid_id)
    # cent_cos carries two extra per-VECTOR facts for the pairwise pass:
    # the cached norm (the pair check then pays one dot fold, not
    # dot + 2 norms — bit-identical quotient, see embed.norm_expr) and
    # the angle to the centroid, which drives a fold-free NECESSARY
    # prefilter on pairs: by the angular triangle inequality
    # θ(a,b) >= |θ(a,c) − θ(b,c)|, so cos(a,b) >= 0.99 requires
    # |θa − θb| <= acos(0.99) — checked with slack (acos(0.9895), three
    # orders of magnitude above double/acos rounding), and every
    # surviving pair still passes the ORIGINAL exact floor test, so the
    # output is unchanged while the interpreted cosine fold runs only on
    # the near-band candidates instead of every same-cluster pair.
    _cc = E.dot_expr(F.col("vec").cast("array<double>"), F.col("_cent")) / (
        F.col("_n") * F.col("_nc")
    )
    scored = materialize(
        asg.withColumn("_n", E.norm_expr("vec"))
        .join(
            F.broadcast(cent.withColumn("_nc", E.norm_expr("_cent"))),
            "centroid_id",
        )
        .withColumn("_cc", _cc)
        .select(
            "id",
            "vec",
            "centroid_id",
            F.floor(100000 * F.col("_cc")).cast("long").alias("cent_cos_bp"),
            "_n",
            F.acos(
                F.greatest(F.lit(-1.0), F.least(F.lit(1.0), F.col("_cc")))
            ).alias("_th"),
        )
    )
    _theta_band = 0.14489148067820806  # math.acos(0.9895)
    a, b = scored.alias("a"), scored.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.col("a._th") - F.col("b._th")) <= F.lit(_theta_band)),
        )
        .filter(
            F.floor(
                100000
                * (
                    E.dot_expr(
                        F.col("a.vec").cast("array<double>"),
                        F.col("b.vec").cast("array<double>"),
                    )
                    / (F.col("a._n") * F.col("b._n"))
                )
            )
            >= 99000
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    cc = D.connected_components(pairs)  # (id, label)
    m = scored.join(cc, scored["id"] == cc["id"], "left").select(
        scored["id"].alias("vec_id"),
        "centroid_id",
        F.coalesce(cc["label"], scored["id"]).alias("component"),
        "cent_cos_bp",
    )
    win = Window.partitionBy("component").orderBy(
        F.asc("cent_cos_bp"), F.asc("vec_id")
    )
    return m.select(
        "vec_id",
        "centroid_id",
        "component",
        "cent_cos_bp",
        F.when(F.row_number().over(win) == 1, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("kept"),
    )


@register(
    "docs_cross_dedup",
    f"""
WITH {SQL_CORPUS},
{SQL_SHINGLES},
bh AS MATERIALIZED (SELECT doc_id, sh, list_transform(sh, x -> {sql_h("'mh'", "x")}) AS bh FROM sh),
sig AS MATERIALIZED (SELECT doc_id,
          list_transform(range(0, {D.N_HASHES}),
                         s -> list_min(list_transform(bh, h ->
                           ((h >> 30) * ({_MH_A})[s+1]
                            + (h & {D.MASK30}) * ({_MH_B})[s+1]
                            + ({_MH_C})[s+1]) & {D.MASK60}))) AS sig
        FROM bh),
banded AS MATERIALIZED (SELECT doc_id, b AS band_id,
             {sql_h("'band' || b::VARCHAR", f"array_to_string(sig[b*{D.ROWS_PER_BAND}+1:b*{D.ROWS_PER_BAND}+{D.ROWS_PER_BAND}], ',')")} AS band_key
           FROM sig CROSS JOIN range(0, {D.N_BANDS}) t(b)),
cross_cand AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
               FROM banded n JOIN banded o
                 ON n.band_id = o.band_id AND n.band_key = o.band_key
               WHERE n.doc_id >= 100000 AND o.doc_id < 100000),
cv AS (SELECT new_id, old_id,
         (10000 * len(list_intersect(sn.sh, so.sh)))
           // (len(sn.sh) + len(so.sh) - len(list_intersect(sn.sh, so.sh))) AS jbp
       FROM cross_cand c
       JOIN sh sn ON sn.doc_id = c.new_id
       JOIN sh so ON so.doc_id = c.old_id),
hits AS (SELECT new_id, min(old_id) AS matched_id, max(jbp) AS best_jaccard_bp
         FROM cv WHERE jbp >= 6000 GROUP BY new_id),
incoming AS (SELECT doc_id FROM corpus WHERE doc_id >= 100000)
SELECT i.doc_id, h.matched_id,
  coalesce(h.best_jaccard_bp, 0) AS best_jaccard_bp,
  CAST(CASE WHEN h.new_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM incoming i LEFT JOIN hits h ON h.new_id = i.doc_id""",
    "incremental cross-corpus dedup: an INCOMING batch (the synthesized "
    "exact+near copies) MinHash-banded against the EXISTING corpus only "
    "— the band join is new-side x old-side, never corpus x corpus, so "
    "a steady-state ingest pipeline pays bands(batch) join "
    "bands(existing index) per batch (at 100 TB the old side is a "
    "persisted band index partitioned by band, probed with partition "
    "pruning; batch-internal duplicates route to the ordinary self-join "
    "path first). Verdict per incoming doc: best existing match + keep "
    "flag; exact-Jaccard verification only on cross candidates",
)
def docs_cross_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = materialize(
        D.minhash_signatures(_corpus(spark, sf_dir), keep_shingles=False)
    )
    CUT = 100000
    # band both sides from the one signature pass, then equi-join
    # new x old (never a full self-join)
    from tsdb_spark.pipeline.dedup import N_BANDS, ROWS_PER_BAND
    from tsdb_spark.pipeline.common import hash64

    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                hash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("sig", b * ROWS_PER_BAND + r + 1)
                            for r in range(ROWS_PER_BAND)
                        ],
                    ),
                    f"band{b}",
                ).alias("band_key"),
            )
            for b in range(N_BANDS)
        ]
    )
    banded = sigs.select("id", F.explode(band_arr).alias("b")).select(
        "id", "b.band_id", "b.band_key"
    )
    new_b = banded.filter(F.col("id") >= CUT).withColumnRenamed("id", "new_id")
    old_b = banded.filter(F.col("id") < CUT).withColumnRenamed("id", "old_id")
    cand = materialize(
        new_b.join(old_b, ["band_id", "band_key"])
        .select("new_id", "old_id")
        .distinct()
    )
    return _cross_dedup_verdict(spark, sf_dir, cand, CUT)


def _cross_dedup_verdict(
    spark: SparkSession, sf_dir: str, cand: DataFrame, cut: int
) -> DataFrame:
    """Shared tail of the cross-corpus dedup entries: candidate-only
    re-shingle (the lean-signature path — the cross candidate id set is
    tiny, so the semi-join + re-tokenize replaces a corpus-wide
    shingle-array carry), exact Jaccard, per-incoming-doc verdict."""
    cand_ids = (
        cand.select(F.col("new_id").alias("doc_id"))
        .unionByName(cand.select(F.col("old_id").alias("doc_id")))
        .distinct()
    )
    sh = D.shingle_sets(
        _corpus(spark, sf_dir).join(cand_ids, "doc_id", "semi")
    )
    cv = (
        cand.join(
            sh.withColumnRenamed("id", "new_id").withColumnRenamed("shingles", "sh_n"),
            "new_id",
        )
        .join(
            sh.withColumnRenamed("id", "old_id").withColumnRenamed("shingles", "sh_o"),
            "old_id",
        )
    )
    inter = F.size(F.array_intersect("sh_n", "sh_o"))
    union = F.size("sh_n") + F.size("sh_o") - inter
    jbp = F.floor(F.lit(10000) * inter / union).cast("long")
    hits = (
        cv.select("new_id", "old_id", jbp.alias("jbp"))
        .filter(F.col("jbp") >= 6000)
        .groupBy("new_id")
        .agg(F.min("old_id").alias("matched_id"), F.max("jbp").alias("best_jaccard_bp"))
    )
    incoming = _corpus(spark, sf_dir).select("doc_id").filter(F.col("doc_id") >= cut)
    out = incoming.join(hits, incoming["doc_id"] == hits["new_id"], "left")
    return out.select(
        "doc_id",
        "matched_id",
        F.coalesce("best_jaccard_bp", F.lit(0)).cast("long").alias("best_jaccard_bp"),
        F.when(F.col("new_id").isNull(), F.lit(1)).otherwise(F.lit(0)).cast("long").alias("kept"),
    )


_BAND_INDEXES: dict = {}


@register(
    "docs_cross_dedup_indexed",
    None,  # oracle assigned below: identical to docs_cross_dedup
    "cross-corpus dedup served from the PERSISTED band index "
    "(bandindex.BandIndex): the existing corpus is sketched ONCE into a "
    "band_id-partitioned, band_key-sorted parquet artifact; each "
    "incoming batch sketches only itself and probes with a broadcast "
    "(band_id, band_key) equi-join — dynamic partition pruning carries "
    "a band_id filter into the index scan (plan-asserted, "
    "tests/test_plans.py). Same candidate-verification tail, same "
    "oracle as docs_cross_dedup: the index roundtrip must answer "
    "bit-identically to banding the corpus per query",
)
def docs_cross_dedup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from tsdb_spark.pipeline.bandindex import BandIndex

    CUT = 100000
    corpus = _corpus(spark, sf_dir)
    if sf_dir not in _BAND_INDEXES:
        root = tempfile.mkdtemp(prefix="tsdb_q_bandidx_")
        BandIndex.build(
            spark, corpus.filter(F.col("doc_id") < CUT), root
        )
        _BAND_INDEXES[sf_dir] = root
    idx = BandIndex.open(spark, _BAND_INDEXES[sf_dir])
    cand = materialize(
        idx.probe(corpus.filter(F.col("doc_id") >= CUT)).select(
            "new_id", "old_id"
        )
    )
    return _cross_dedup_verdict(spark, sf_dir, cand, CUT)


# the persisted band index must answer exactly like banding the corpus
# per query — one oracle covers both (divergence = an index-path bug)
_Q["docs_cross_dedup_indexed"].oracle = _Q["docs_cross_dedup"].oracle


@register(
    "mm_image_embed_ann",
    """
WITH d AS (SELECT doc_id, md5(text) AS digest FROM documents),
e AS (SELECT doc_id,
        list_transform(range(0, 3), b ->
          (CAST(concat('0x', substr(md5(concat('img:', digest, ':', b::VARCHAR)), 1, 15))
                AS BIGINT) % 256) / 255.0) AS emb
      FROM d),
p AS (SELECT doc_id AS probe_id, emb AS pv FROM e WHERE doc_id < 5),
scored AS (SELECT probe_id, c.doc_id AS neighbor_id,
             list_cosine_similarity(pv, c.emb) AS cos
           FROM e c JOIN p ON c.doc_id != probe_id),
r AS (SELECT probe_id, neighbor_id, cos,
        CAST(row_number() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored)
SELECT probe_id, neighbor_id, rank, CAST(floor(100000 * cos) AS BIGINT) AS cos_bp
FROM r WHERE rank <= 3""",
    "multimodal retrieval end-to-end: binary payload -> Arrow-batched "
    "image decode (mapInPandas, deterministic fake codec) -> pooled "
    "embedding (one component per 256-px block, exact in both engines) "
    "-> brute-force cosine top-3 — the image-similarity-search chain "
    "with every stage already production-shaped (the real codec swaps "
    "into the decoder slot; the embedding pooling becomes a model UDF; "
    "the ANN stage swaps for the IVF/LSH path at corpus scale)",
)
def mm_image_embed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    decoded = M.decode_image(M.with_payload(docs), 16, 16)
    emb = decoded.select(
        "doc_id",
        F.array(
            *[F.element_at("pixels", b * 256 + 1) for b in range(3)]
        ).alias("embedding"),
    )
    probes = emb.filter(F.col("doc_id") < 5)
    return E.cosine_topk(emb, probes, k=3, id_col="doc_id")


@register(
    "emb_knn_graph",
    f"""
WITH {SQL_EMB},
coded AS (SELECT vec_id, v, {_sql_lsh_code('v')} AS bucket FROM e),
scored AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
             list_cosine_similarity(a.v, b.v) AS cos
           FROM coded a JOIN coded b
             ON a.bucket = b.bucket AND a.vec_id != b.vec_id),
r AS (SELECT vec_id, neighbor_id, cos,
        CAST(row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
      FROM scored)
SELECT vec_id, neighbor_id, rank, CAST(floor(100000 * cos) AS BIGINT) AS cos_bp
FROM r WHERE rank <= 3""",
    "approximate kNN GRAPH over the whole corpus (every vector's top-3 "
    "within its LSH bucket) — the input relation for graph-based "
    "clustering / SNN dedup / connectivity analysis. Unlike the probe "
    "queries the probe set IS the corpus, so the cost shape is the "
    "bucket self-join: sum over buckets of size^2, bounded by the "
    "hyperplane count (add planes to halve buckets), never corpus^2; "
    "the per-vector top-k is one partial-sort-combinable window",
)
def emb_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    coded = emb.withColumn("bucket", E.lsh_bucket_expr("v"))
    a = coded.select("vec_id", "v", "bucket")
    b = coded.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"), "bucket"
    )
    scored = a.join(b, "bucket").filter(
        F.col("vec_id") != F.col("neighbor_id")
    ).withColumn("cos", E.cosine_expr("v", "nv"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            "vec_id",
            "neighbor_id",
            "rank",
            F.floor(F.lit(100000) * F.col("cos")).cast("long").alias("cos_bp"),
        )
    )


@register(
    "docs_pipeline_funnel",
    f"""
WITH RECURSIVE {SQL_CORPUS},
{SQL_SHINGLES},
{SQL_MINHASH_PAIRS},
{sql_cc("verified")},
{SQL_DECON},
ftoks AS (SELECT doc_id, text, {SQL_TOKS} AS toks FROM corpus),
s1 AS (SELECT doc_id, text FROM corpus),
s2 AS (SELECT f.doc_id, f.text FROM ftoks f
       WHERE len(toks) BETWEEN 10 AND 100000
         AND (10000 * len(list_filter(toks, x -> x IN {T.EN_STOPWORDS!r}))) // len(toks) >= 100),
s3 AS (SELECT doc_id, text FROM (
         SELECT doc_id, text,
           min(doc_id) OVER (PARTITION BY md5(text)) AS canon
         FROM s2) WHERE doc_id = canon),
canon4 AS (SELECT cc.cluster_id, min(s3.doc_id) AS keep_id
           FROM s3 JOIN cc ON cc.id = s3.doc_id GROUP BY cc.cluster_id),
s4 AS (SELECT s3.doc_id, s3.text FROM s3
       LEFT JOIN cc ON cc.id = s3.doc_id
       LEFT JOIN canon4 ON canon4.cluster_id = cc.cluster_id
       WHERE cc.id IS NULL OR s3.doc_id = canon4.keep_id),
probe_sh AS (SELECT DISTINCT sh FROM dsh WHERE doc_id < 100000 AND doc_id % 14 = 0),
dirty AS (SELECT DISTINCT d.doc_id FROM dsh d JOIN probe_sh p ON d.sh = p.sh),
s5 AS (SELECT s4.doc_id, s4.text FROM s4
       WHERE s4.doc_id NOT IN (SELECT doc_id FROM dirty)),
s6 AS (SELECT s5.doc_id, s5.text FROM s5
       JOIN documents base ON base.doc_id = s5.doc_id % 100000
       WHERE {sql_h("'strat'", "CAST(s5.doc_id AS VARCHAR)")} % 10000
             < 500 + (CAST(substr(base.source, 4) AS BIGINT) * 450) % 9000)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS stage_idx, 'raw' AS stage,
    CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(length(text)) AS BIGINT) AS n_chars FROM s1
  UNION ALL SELECT 2, 'quality', CAST(count(*) AS BIGINT), CAST(sum(length(text)) AS BIGINT) FROM s2
  UNION ALL SELECT 3, 'exact_dedup', CAST(count(*) AS BIGINT), CAST(sum(length(text)) AS BIGINT) FROM s3
  UNION ALL SELECT 4, 'near_dedup', CAST(count(*) AS BIGINT), CAST(sum(length(text)) AS BIGINT) FROM s4
  UNION ALL SELECT 5, 'decontaminated', CAST(count(*) AS BIGINT), CAST(sum(length(text)) AS BIGINT) FROM s5
  UNION ALL SELECT 6, 'sampled', CAST(count(*) AS BIGINT), CAST(sum(length(text)) AS BIGINT) FROM s6)""",
    "the WHOLE curation pipeline as one driver-verified funnel: raw "
    "corpus -> C4 quality gate -> exact dedup (md5 canonical) -> "
    "near-dedup (MinHash-LSH clusters, canonical re-elected among "
    "survivors) -> benchmark decontamination (5-shingle overlap with "
    "the probe set) -> stratified sampling; one row per stage with doc "
    "and char counts. Every stage reuses the production operator and "
    "its scale shape (combinable hash aggs, banded joins, broadcast "
    "probes, map-only sampling) — the dataset-card funnel a real "
    "pipeline publishes",
)
def docs_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tsdb_spark.pipeline.common import hash64
    from tsdb_spark.pipeline.dedup import shingles_of_tokens
    from tsdb_spark.pipeline.sampling import sample_key_expr

    corpus = materialize(_corpus(spark, sf_dir))
    toks = T.tokens_expr("text")
    n_toks = F.size("_toks")
    stop = F.size(F.filter("_toks", lambda t: t.isin(*T.EN_STOPWORDS)))
    s2 = (
        corpus.withColumn("_toks", toks)
        .filter(
            n_toks.between(10, 100000)
            & (F.floor(10000 * stop / n_toks) >= 100)
        )
        .select("doc_id", "text")
    )
    w_md5 = Window.partitionBy(F.md5("text"))
    s3 = (
        s2.withColumn("_canon", F.min("doc_id").over(w_md5))
        .filter(F.col("doc_id") == F.col("_canon"))
        .select("doc_id", "text")
    )
    cc = _minhash_clusters(spark, sf_dir).select("id", "cluster_id")
    canon4 = (
        s3.join(cc, s3["doc_id"] == cc["id"])
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("keep_id"))
    )
    s4 = (
        s3.join(cc, s3["doc_id"] == cc["id"], "left")
        .join(F.broadcast(canon4), "cluster_id", "left")
        .filter(cc["id"].isNull() | (s3["doc_id"] == F.col("keep_id")))
        .select(s3["doc_id"], s3["text"])
    )
    # distinct 5-shingle hashes of every corpus doc (== SQL_DECON's dsh)
    dsh = (
        corpus.withColumn("_toks", toks)
        .filter(F.size("_toks") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        shingles_of_tokens(F.col("_toks"), 5),
                        lambda s: hash64(s, "decon"),
                    )
                )
            ).alias("sh"),
        )
    )
    probe_sh = dsh.filter(
        (F.col("doc_id") < 100000) & (F.col("doc_id") % 14 == 0)
    ).select("sh").distinct()
    dirty = (
        dsh.join(F.broadcast(probe_sh), "sh").select("doc_id").distinct()
    )
    s5 = s4.join(dirty, "doc_id", "left_anti")
    base = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("_base_id"), "source"
    )
    rate = (
        F.lit(500)
        + (F.substring("source", 4, 10).cast("long") * 450) % 9000
    )
    s6 = (
        s5.join(F.broadcast(base), s5["doc_id"] % 100000 == F.col("_base_id"))
        .filter(sample_key_expr(F.col("doc_id")) < rate)
        .select("doc_id", "text")
    )

    def stage(i, name, df):
        return df.agg(
            F.lit(i).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum(F.length("text")), F.lit(0)).cast("long").alias("n_chars"),
        )

    out = stage(1, "raw", corpus)
    for i, (name, df) in enumerate(
        [("quality", s2), ("exact_dedup", s3), ("near_dedup", s4),
         ("decontaminated", s5), ("sampled", s6)],
        start=2,
    ):
        out = out.unionByName(stage(i, name, df))
    return out


@register(
    "docs_bpe_tokens",
    None,  # iterative merge training is the sanctioned non-SQL case:
    # the driver records a rows-only check; the algorithm itself is
    # pinned by tests/test_pipeline.py against a hand-computed model
    "BPE tokenizer TRAINED on the corpus (Sennrich '16): one combinable "
    "word-histogram shuffle, a vocabulary-scale merge loop (driver "
    "state = the vocab table, like k-means centroids), then corpus "
    "encoding as encode-distinct-words-once + broadcast join — the "
    "heavy side is probed, never re-encoded per occurrence. Output: "
    "per-doc word and BPE-token counts",
)
def docs_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = T.bpe_train(docs, n_merges=40)
    return T.bpe_apply(docs, merges).orderBy("doc_id")


_SPAN_N = 8


@register(
    "docs_dup_spans",
    f"""
WITH {SQL_CORPUS},
t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM corpus WHERE len({SQL_TOKS}) > 0),
g AS (SELECT doc_id, u.i AS pos,
        {sql_h("'span'", f"array_to_string(toks[u.i:u.i+{_SPAN_N - 1}], ' ')")} AS h
      FROM t, UNNEST(range(1, len(toks) - {_SPAN_N} + 2)) AS u(i)),
dup AS (SELECT h FROM g GROUP BY h HAVING count(*) > 1),
cov AS (SELECT DISTINCT doc_id, w.p
        FROM g JOIN dup USING (h), UNNEST(range(g.pos, g.pos + {_SPAN_N})) AS w(p)),
cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_positions
        FROM cov GROUP BY doc_id)
SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
  coalesce(cnt.dup_positions, 0) AS dup_positions,
  (10000 * coalesce(cnt.dup_positions, 0)) // len(t.toks) AS dup_span_bp
FROM t LEFT JOIN cnt USING (doc_id)""",
    "substring-level duplicate SPANS at 8-token-gram granularity (Lee "
    "et al. '22 exact-substring dedup, suffix-array spans approximated "
    "at n-gram resolution): one JVM-side gram-hash pass, a combinable "
    "duplicated-gram count, an equi-join to mark positions (work ∝ "
    "duplicated text), per-doc covered-token fraction in basis points. "
    "Run over the corpus-with-copies so spans actually recur",
)
def docs_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.duplicated_spans(_corpus(spark, sf_dir), n=_SPAN_N)


_BM25_TERMS = ("window", "join", "hash")


def _bm25_sql(terms=_BM25_TERMS, k1="1.2", b="0.75", top_k=20) -> str:
    """DuckDB rendering of text.bm25_topk, parenthesized token-for-token
    with the Spark expressions so every IEEE +,-,*,/ folds in the same
    order (the rational idf keeps ln() out of the comparison)."""
    tf_cols = ", ".join(
        f"CAST(len(list_filter(toks, x -> x = '{t}')) AS BIGINT) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{i}"
        for i in range(len(terms))
    )
    avgdl = "(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    denom = f"({k1} * (1.0 - {b} + {b} * (CAST(dl AS DOUBLE) / {avgdl})))"
    score = " + ".join(
        f"((((CAST(n_docs AS DOUBLE) - CAST(df_{i} AS DOUBLE) + 0.5)"
        f" / (CAST(df_{i} AS DOUBLE) + 0.5))"
        f" * (CAST(tf_{i} AS DOUBLE) * ({k1} + 1.0)))"
        f" / (CAST(tf_{i} AS DOUBLE) + {denom}))"
        for i in range(len(terms))
    )
    hit = " OR ".join(f"tf_{i} > 0" for i in range(len(terms)))
    return f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, {tf_cols} FROM t),
s AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl, {df_cols} FROM d)
SELECT doc_id, dl, {score} AS score
FROM d CROSS JOIN s
WHERE {hit}
ORDER BY score DESC, doc_id
LIMIT {top_k}"""


@register(
    "docs_bm25_search",
    _bm25_sql(),
    "BM25 retrieval (rational-idf variant for bit-exact cross-engine "
    "scores): the corpus-slicing / contamination-lookup primitive — "
    "one map-only tf pass (query terms are a literal handful, so no "
    "explode and no per-term shuffle), a single-row df/Σdl aggregate "
    "broadcast back, a fixed-order float fold for the score, top-k as "
    "TakeOrderedAndProject; the corpus is scanned once, never shuffled",
)
def docs_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.bm25_topk(
        load_table(spark, sf_dir, "documents"), list(_BM25_TERMS)
    )


_GOPHER_SQL = """
WITH t AS (SELECT doc_id, text, {toks} AS toks,
             list_filter(regexp_split_to_array(text, '\\n'),
                         l -> trim(l) <> '') AS lines
           FROM documents),
d AS (SELECT doc_id,
  CAST(len(toks) AS BIGINT) AS n_words,
  greatest(len(toks), 1) AS nw,
  greatest(len(lines), 1) AS nl,
  coalesce(list_sum(list_transform(toks, x -> length(x))), 0) AS tot,
  len(list_filter(toks, x -> x = '#' OR contains(x, '...'))) AS sym,
  len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS alpha,
  len(list_filter(lines, l -> starts_with(trim(l), '-')
      OR starts_with(trim(l), '*') OR starts_with(trim(l), '•'))) AS bul,
  len(list_filter(lines, l -> ends_with(trim(l), '...')
      OR ends_with(trim(l), '…'))) AS ell,
  len(list_filter(['the','be','to','of','and','that','have','with'],
      w -> list_contains(toks, w))) AS stops
 FROM t)
SELECT doc_id, n_words,
  CAST((10000 * tot) // nw AS BIGINT) AS mean_word_len_bp,
  (10000 * sym) // nw AS symbol_word_bp,
  (10000 * bul) // nl AS bullet_line_bp,
  (10000 * ell) // nl AS ellipsis_line_bp,
  (10000 * alpha) // nw AS alpha_word_bp,
  CAST(stops AS BIGINT) AS gopher_stopwords,
  (n_words BETWEEN 50 AND 100000)
    AND ((10000 * tot) // nw BETWEEN 30000 AND 100000)
    AND ((10000 * sym) // nw <= 1000)
    AND ((10000 * bul) // nl <= 1000)
    AND ((10000 * ell) // nl <= 3000)
    AND ((10000 * alpha) // nw >= 8000)
    AND stops >= 2 AS keep
FROM d""".strip().format(toks=SQL_TOKS)


@register(
    "docs_gopher_quality",
    _GOPHER_SQL,
    "Gopher/MassiveWeb rule-based quality gate (Rae et al. 2021 A1.1): "
    "word-count and mean-word-length bounds, symbol-word / bullet-line "
    "/ ellipsis-line / alpha-word ratios, required-stopword floor — the "
    "second standard heuristic filter next to the C4-style one; all "
    "integer basis points, one map-only pass, no shuffle",
)
def docs_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.gopher_quality(load_table(spark, sf_dir, "documents"))
