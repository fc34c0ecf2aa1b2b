"""Deduplication operators: exact, MinHash-LSH near-dup, SimHash,
n-gram Jaccard.

Scale design (the part that matters at 100TB):
- exact dedup is a single groupBy on the content hash — map-side
  combinable, shuffle ∝ distinct contents;
- MinHash-LSH candidate generation is a groupBy/self-join on
  (band_id, band_key) — pairs are only formed inside a band bucket,
  never an all-pairs cross join (expected bucket size is corpus/2^60
  per key, i.e. only true near-dup collisions survive);
- exact-Jaccard verification joins the candidate pair list (tiny) back
  to the shingle sets — the wide corpus scan happens exactly twice
  (signature pass, verify pass), both embarrassingly parallel;
- SimHash banding splits the 48-bit fingerprint into 4 12-bit blocks:
  any pair within Hamming distance 3 shares at least one block
  (pigeonhole), so candidates again come from a bucketed groupBy.

All sketches are higher-order-function expressions over the token
array — JVM-side, no Python. Hashes are md5-derived (common.hash64) so
a SQL oracle reproduces every bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tsdb_spark.pipeline.common import hash64
from tsdb_spark.pipeline.text import tokens_expr

# MinHash geometry: 32 hashes in 8 bands of 4 rows — the classic
# S-curve puts the detection threshold near (1/8)^(1/4) ≈ 0.6 Jaccard.
N_HASHES = 32
N_BANDS = 8
ROWS_PER_BAND = N_HASHES // N_BANDS

SIMHASH_BITS = 48
SIMHASH_BLOCKS = 4
BLOCK_BITS = SIMHASH_BITS // SIMHASH_BLOCKS


def shingles_of_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-token shingles from a *bound* token-array column.

    `toks` must be a plain column reference, not an expression tree: the
    transform lambda embeds whatever expression it's given, and Catalyst
    re-evaluates an embedded subtree once per sequence element — an
    inlined tokenizer turns this O(n) projection into O(n²) regex work
    per document (measured 7× slower at sf0.1)."""
    n = F.size(toks)
    # guard: sequence(1, x) with x < 1 would generate a DESCENDING range
    shingles = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.array_distinct(
        F.when(n >= k, shingles).otherwise(F.array().cast("array<string>"))
    )


def shingles_expr(text_col: Column | str = "text", k: int = 3) -> Column:
    """Distinct k-token shingles (the near-dup unit of comparison).

    Single-expression form for tests/one-off use; hot paths go through
    shingle_sets, which binds the token array to a column first."""
    return shingles_of_tokens(tokens_expr(text_col), k)


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact deduplication by content hash: every doc is assigned the
    minimal id of its content group as `canonical_id` (is_dup marks the
    non-canonical copies). One map-side-combinable shuffle on the hash."""
    w = Window.partitionBy("content_hash")
    return (
        docs.withColumn("content_hash", F.md5(F.col(text_col)))
        .withColumn("canonical_id", F.min(id_col).over(w))
        .withColumn("group_size", F.count("*").over(w))
        .select(
            F.col(id_col),
            "content_hash",
            "canonical_id",
            "group_size",
            (F.col(id_col) != F.col("canonical_id")).alias("is_dup"),
        )
    )


MASK30 = (1 << 30) - 1
MASK60 = (1 << 60) - 1


def _mh_consts(n: int) -> list[tuple[int, int, int]]:
    """Deterministic 28-bit multiplier/offset triples for the derived
    MinHash family — reproducible in SQL as plain integer literals."""
    import hashlib

    out = []
    for i in range(n):
        d = hashlib.md5(f"mh:{i}".encode()).hexdigest()
        out.append((int(d[:7], 16) | 1, int(d[7:14], 16) | 1, int(d[14:21], 16)))
    return out


MH_CONSTS = _mh_consts(N_HASHES)


def shingle_sets(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, shingles): the distinct k-shingle set per doc — the shared
    input of MinHash signatures and exact-Jaccard scoring."""
    # the emptiness filter is expressed on the token count, not on the
    # shingle array: Catalyst pushes filters below projections BY
    # SUBSTITUTION, so `size(_sh) > 0` would re-inline the whole O(n²)
    # shingle expression into a pre-projection Filter over every raw row
    # (shingles is non-empty exactly when the doc has >= k tokens)
    return (
        docs.withColumn("_toks", tokens_expr(text_col))
        .filter(F.size("_toks") >= k)
        .withColumn("_sh", shingles_of_tokens(F.col("_toks"), k))
        .select(F.col(id_col).alias("id"), F.col("_sh").alias("shingles"))
    )


def minhash_signatures(
    docs: DataFrame,
    n_hashes: int = N_HASHES,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_shingles: bool = True,
) -> DataFrame:
    """(id[, shingles], sig): MinHash signature over the shingle set.

    Scale shape: ONE md5 per shingle (exploded to rows, whole-stage
    codegen), then the n_hashes family derives by 30-bit-split
    multiply-add — (h>>30)*a + (h&MASK30)*b + c, masked to 60 bits, all
    products < 2^58 so the arithmetic is overflow-free and bit-identical
    in any BIGINT engine (the SQL oracle reproduces it with integer
    literals). The per-seed minima run as plain MIN aggregates in one
    map-side-combinable HashAggregate — never an interpreted higher-order
    fold, never n_hashes md5 passes.

    `keep_shingles=False` is the corpus-scale form: the shingle arrays
    are neither carried nor cached — the exploded rows stream straight
    into the combinable aggregate, column-pruned to (id, h). The 128×
    soak measured the corpus-wide shingle-array cache as THE disk wall
    (hundreds of GB of serialized arrays on one box); downstream exact
    Jaccard re-shingles only the candidate docs (jaccard_pairs_for_docs
    — candidates are a vanishing fraction of the corpus)."""
    if keep_shingles:
        # eager: the shingle frame feeds both the exploded hash
        # aggregation and the final signature join — sibling scans of
        # one job would each recompute the tokenize+shingle expression
        # on a lazy persist
        from tsdb_spark.pipeline.common import materialize

        sets = materialize(shingle_sets(docs, k=k, text_col=text_col, id_col=id_col))
        # hash INSIDE the array and explode longs: the Generate then
        # carries 8-byte rows instead of shingle strings — measured 6×
        # faster than explode-then-hash at sf0.1; h values are identical
        # (same per-shingle hash64)
        ex = sets.select(
            "id",
            F.explode(F.transform("shingles", lambda s: hash64(s, "mh"))).alias("h"),
        )
    else:
        # corpus-scale fused form: ONE interpreted array pass builds the
        # hash directly from the token positions — no intermediate
        # shingle-string array, no array_distinct (a duplicate shingle
        # contributes a duplicate h, which can never change a per-seed
        # MIN, so the signatures are bit-identical; measured 1.8× faster
        # than the sets-based pass at sf0.1). The emptiness filter stays
        # on the token count so Catalyst's filter-substitution can't
        # re-inline the O(n²) shingle work (see shingle_sets).
        toks = docs.withColumn("_toks", tokens_expr(text_col)).filter(
            F.size("_toks") >= k
        )
        n = F.size("_toks")
        ex = toks.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), n - (k - 1)),
                    lambda i: hash64(
                        F.array_join(F.slice("_toks", i, k), " "), "mh"
                    ),
                )
            ).alias("h"),
        )
    h1 = F.shiftright(F.col("h"), 30)
    h2 = F.col("h").bitwiseAND(F.lit(MASK30))
    mins = ex.groupBy("id").agg(
        *[
            F.min((h1 * a + h2 * b + c).bitwiseAND(F.lit(MASK60))).alias(f"_m{i}")
            for i, (a, b, c) in enumerate(_mh_consts(n_hashes))
        ]
    )
    sig = F.array(*[F.col(f"_m{i}") for i in range(n_hashes)])
    if not keep_shingles:
        return mins.select("id", sig.alias("sig"))
    return sets.join(mins, "id").select("id", "shingles", sig.alias("sig"))


def band_rows(
    signatures: DataFrame,
    n_bands: int = N_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """(id, band_id, band_key): each signature split into n_bands
    hashed band keys — the shared banding step of the LSH self-join,
    the cross-corpus probe, and the persisted band index."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                hash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at("sig", b * rows_per_band + r + 1)
                            for r in range(rows_per_band)
                        ],
                    ),
                    f"band{b}",
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    return signatures.select("id", F.explode(bands).alias("band")).select(
        "id", "band.band_id", "band.band_key"
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    n_bands: int = N_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    max_bucket: int | None = None,
) -> DataFrame:
    """Banded LSH: hash each band of the signature to a bucket key;
    docs sharing any (band_id, band_key) become a candidate pair.

    The self-join is equi on the band key — Spark shuffles both sides by
    (band_id, band_key) and pairs form only within buckets. distinct()
    collapses pairs that collide in several bands.

    `max_bucket` is the skew guard for corpus scale: a degenerate bucket
    (e.g. millions of boilerplate documents sharing a band key) turns
    the self-join quadratic — one hot key produces size² pairs on one
    executor. Buckets larger than the cap are dropped BEFORE the join
    (a documented recall tradeoff: members of a dropped bucket can still
    pair through their other n_bands-1 bands; a true all-ways-degenerate
    group is better handled by exact dedup first)."""
    banded = band_rows(signatures, n_bands, rows_per_band)
    if max_bucket is not None:
        w = Window.partitionBy("band_id", "band_key")
        banded = (
            banded.withColumn("_c", F.count("*").over(w))
            .filter(F.col("_c") <= max_bucket)
            .drop("_c")
        )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_pairs(
    pairs: DataFrame, signatures: DataFrame, min_jaccard_bp: int = 6000
) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard, keeping
    pairs at or above the threshold (basis points, integer-exact).

    The pair list is tiny relative to the corpus — both signature joins
    broadcast the pairs side in practice (AQE picks it up)."""
    sh = signatures.select("id", "shingles")
    j = (
        pairs.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        j.select(
            "id_a",
            "id_b",
            F.floor(F.lit(10000) * inter / union).cast("long").alias("jaccard_bp"),
        )
        .filter(F.col("jaccard_bp") >= min_jaccard_bp)
    )


def jaccard_pairs_for_docs(
    pairs: DataFrame,
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_jaccard_bp: int = 6000,
) -> DataFrame:
    """jaccard_pairs for the corpus-scale path: re-shingle ONLY the
    candidate documents (semi-join against the tiny pair id set) instead
    of carrying every document's shingle array through the signature
    frame. Same exact integer Jaccard, same threshold — candidates are
    a vanishing fraction of a 100 TB corpus, so the re-tokenize is
    noise next to a corpus-wide array cache."""
    from tsdb_spark.pipeline.common import materialize

    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sub = docs.join(ids, id_col, "semi")
    # candidate-sized frame, consumed by BOTH sides of the pair join —
    # materialized so the corpus semi-scan + re-tokenize runs once
    sh = materialize(shingle_sets(sub, k=k, text_col=text_col, id_col=id_col))
    return jaccard_pairs(pairs, sh, min_jaccard_bp=min_jaccard_bp)


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """(id, label): connected components of the near-dup pair graph;
    label = the minimum node id reachable from each node.

    Scale shape: min-label propagation with pointer jumping. Each round
    runs (1) a propagate step — every node takes the min of its own and
    its neighbors' labels, one shuffle bounded by the edge list — and
    (2) a shortcut step — every node re-reads the label OF its label
    (path halving), one more join on the (node, label) frame. With the
    shortcut, convergence is O(log diameter) rounds instead of
    O(diameter), so a 1M-node chain needs ~20 rounds, not 1M.

    State is only the dup-graph nodes (docs that appear in some pair),
    never the corpus; each round localCheckpoints the label frame so the
    plan doesn't grow with the iteration count (a label frame is
    consumed TWICE per round and `stepped` twice again — un-truncated,
    the logical plan nests ~4x per round and Catalyst's plan
    canonicalization goes exponential), and the only value that
    reaches the driver is the 0/1 converged flag.

    r11: the init fuses the ROUND-0 PROPAGATE into the seed — label =
    min(id, 1-hop neighbor min), one combinable aggregate over the same
    frame the old identity-init's distinct() scanned. Labels are
    monotone non-increasing, so a closer seed can only reduce the round
    count (one full round of 2-join+checkpoint+count job latency on
    graphs whose 1-hop min already is the component min).
    """
    e = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    sym = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_nb"))
        .select(F.col("u").alias("id"), F.least("u", "_nb").alias("label"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        nbr_min = (
            sym.join(labels.select(F.col("id").alias("u"), "label"), "u")
            .groupBy(F.col("v").alias("id"))
            .agg(F.min("label").alias("nbr_min"))
        )
        stepped = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("label").alias("old"),
            F.least("label", F.coalesce("nbr_min", "label")).alias("label"),
        )
        parent = stepped.select(
            F.col("id").alias("label"), F.col("label").alias("p_label")
        )
        # the per-node changed flag rides the checkpointed frame, so
        # convergence detection is a scan of cached partitions — no extra
        # old-vs-new join round-trip
        new = (
            stepped.join(parent, "label", "left")
            .select(
                "id",
                F.coalesce("p_label", "label").alias("label"),
                (F.coalesce("p_label", "label") != F.col("old")).alias("chg"),
            )
            .localCheckpoint()
        )
        labels = new.select("id", "label")
        if new.filter("chg").limit(1).count() == 0:
            break
    return labels


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """(id, cluster_id, cluster_size, is_canonical): group near-dup
    pairs into clusters and pick the minimum doc id as the canonical
    representative — the form a dedup pipeline actually consumes (keep
    one doc per cluster, drop the rest)."""
    cc = connected_components(pairs)
    w = Window.partitionBy("cluster_id")
    return (
        cc.select("id", F.col("label").alias("cluster_id"))
        .withColumn("cluster_size", F.count("*").over(w).cast("long"))
        .withColumn("is_canonical", F.col("id") == F.col("cluster_id"))
    )


def simhash_expr(text_col: Column | str = "text", bits: int = SIMHASH_BITS) -> Column:
    """SimHash fingerprint of the token multiset: bit b of the output is
    set iff the sum over tokens of ±1 (sign of bit b of the token hash)
    is positive. The bit loop unrolls at expression-build time (shift
    amounts must be literals); everything stays a codegen'd expression,
    no explode."""
    toks = tokens_expr(text_col)
    hs = F.transform(toks, lambda t: hash64(t, "simhash"))

    def bitsum(b: int) -> Column:
        return F.aggregate(
            hs,
            F.lit(0).cast("long"),
            lambda acc, h: acc + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1),
        )

    total = F.lit(0).cast("long")
    for b in range(bits):
        total = total + F.when(
            bitsum(b) > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return total


def simhash_frame(
    docs: DataFrame,
    bits: int = SIMHASH_BITS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, simhash) for a whole corpus — the FAST formulation.

    `simhash_expr` folds the token-hash array with per-bit `aggregate`
    calls; higher-order array functions are interpreted per element
    (never whole-stage-codegen'd), which makes it the slow path for bulk
    scoring. Here the tokens explode to rows and the 48 per-bit ±1 sums
    run as plain SUM aggregates inside one codegen'd, map-side-combinable
    HashAggregate — the md5 per token happens exactly once, and the only
    shuffle is the groupBy on the doc id. Bit math is identical, so both
    formulations (and the SQL oracle) agree bit-for-bit."""
    toks = tokens_expr(text_col)
    h = docs.select(
        F.col(id_col).alias("id"),
        # outer: a zero-token doc must keep a row (simhash 0), matching
        # the fold formulation and the oracle's NULL-sum semantics
        F.explode_outer(F.transform(toks, lambda t: hash64(t, "simhash"))).alias("h"),
    )
    sums = h.groupBy("id").agg(
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"_b{b}")
            for b in range(bits)
        ]
    )
    total = F.lit(0).cast("long")
    for b in range(bits):
        total = total + F.when(
            F.col(f"_b{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sums.select("id", total.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash: candidates share one of the 4 12-bit
    blocks (pigeonhole guarantees completeness for Hamming ≤ 3), then
    the exact Hamming distance filters. Returns (id_a, id_b, hamming).
    `max_bucket` drops degenerate blocks before the self-join (skew
    guard, see lsh_candidate_pairs)."""
    # materialize the fingerprints once: the banded self-join reads this
    # frame on BOTH sides as sibling stages — lazily persisted, each side
    # would recompute the full simhash aggregation over the corpus
    from tsdb_spark.pipeline.common import materialize

    d = materialize(simhash_frame(docs, text_col=text_col, id_col=id_col))
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("block_id"),
                F.shiftright("simhash", i * BLOCK_BITS)
                .bitwiseAND(F.lit((1 << BLOCK_BITS) - 1))
                .alias("block_val"),
            )
            for i in range(SIMHASH_BLOCKS)
        ]
    )
    banded = d.select("id", "simhash", F.explode(blocks).alias("b")).select(
        "id", "simhash", "b.block_id", "b.block_val"
    )
    if max_bucket is not None:
        w = Window.partitionBy("block_id", "block_val")
        banded = (
            banded.withColumn("_c", F.count("*").over(w))
            .filter(F.col("_c") <= max_bucket)
            .drop("_c")
        )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def duplicated_spans(
    docs: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Substring-level duplicate detection at token n-gram granularity —
    the Spark-native rendering of exact-substring training-data dedup
    (Lee et al. '22, "Deduplicating Training Data Makes Language Models
    Better"; the suffix-array method's spans, approximated at n-token
    resolution).

    Scale shape: ONE n-gram hash pass (higher-order expression, JVM
    side), a combinable count to find hashes occurring more than once,
    an equi-join (NOT broadcast — the duplicated-gram table grows with
    the corpus) to mark duplicated positions, and a distinct-positions
    union per doc. The ×n position fan-out happens only on MARKED
    grams, i.e. work ∝ duplicated text, not corpus.

    Returns (id_col, n_tokens, dup_positions, dup_span_bp) where
    dup_span_bp = floor(1e4 · covered-token fraction).
    """
    toks = tokens_expr(text_col)
    d = docs.select(F.col(id_col), toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    grams = F.when(
        F.size("toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - n + 1),
            lambda i: hash64(
                F.array_join(F.slice(F.col("toks"), i, n), " "), seed="span"
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    g = d.select(
        F.col(id_col),
        F.size("toks").alias("n_tokens"),
        F.posexplode(grams).alias("pos0", "h"),
    ).select(
        id_col, "n_tokens", (F.col("pos0") + 1).alias("pos"), "h"
    )
    dup = g.groupBy("h").count().filter(F.col("count") > 1).select("h")
    cov = (
        g.join(dup, "h")
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.col("pos"), F.col("pos") + n - 1)).alias("p"),
        )
        .distinct()
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("dup_positions"))
    )
    return (
        d.select(F.col(id_col), F.size("toks").cast("long").alias("n_tokens"))
        .join(cov, id_col, "left")
        .fillna(0, subset=["dup_positions"])
        .select(
            id_col,
            "n_tokens",
            "dup_positions",
            F.floor(F.lit(10000) * F.col("dup_positions") / F.col("n_tokens"))
            .cast("long")
            .alias("dup_span_bp"),
        )
    )
