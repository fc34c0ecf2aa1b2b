"""Text analysis operators: tokenization, per-document statistics,
language identification, quality signals, and winnowing fingerprints.

All pure Column expressions (higher-order array functions) — one
narrow projection per document, no shuffle, no Python. At 100TB this is
a map-only pass that scales linearly with executors; the only wide
operation in this module is the token histogram's groupBy.

Ratios are emitted as ``floor(10000 * num / den)`` basis points computed
in *integer* arithmetic so Spark and any SQL oracle agree bit-for-bit
(double division + round() differs across engines on .5 boundaries).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tsdb_spark.pipeline.common import hash64

# BPE-ish lexer: runs of word chars (incl. apostrophe) or single
# non-space symbols — the classic pre-tokenizer shape.
WORDPIECE_RE = r"[a-z0-9']+|[^a-z0-9\s]"

# tiny per-language stopword profiles for the n-gram/stopword heuristic
# language classifier. Deterministic score = number of token hits per
# profile; predicted language = argmax with a fixed preference order.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
    "es": ("el", "la", "de", "los", "las", "es", "un", "una"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "不"),
}
LANG_ORDER = tuple(LANG_PROFILES)  # fixed tiebreak preference

EN_STOPWORDS = LANG_PROFILES["en"]


def tokens_expr(text_col: Column | str = "text") -> Column:
    """Whitespace tokenization (empty tokens dropped)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))


def wordpieces_expr(text_col: Column | str = "text") -> Column:
    """BPE-ish regex tokenization of the lowercased text."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.regexp_extract_all(F.lower(c), F.lit(WORDPIECE_RE), 0)


def _bp(num: Column, den: Column) -> Column:
    """Basis points = floor(10000*num / den) — integer-exact for the
    magnitudes here (numerators ≤ ~1e10, so the correctly-rounded double
    quotient floors identically in every engine; double round() half-up
    vs half-even differences can never appear). Caller guarantees den>0;
    DuckDB oracle renders it as (10000*num) // den."""
    return F.floor(F.lit(10000) * num / den).cast("long")


def text_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document statistics + quality signals.

    Columns: n_chars, n_tokens, n_distinct_tokens, avg_token_len_bp,
    stopword_bp, alpha_bp, keep (the quality gate: length in range and
    stopword ratio over a floor — the standard C4-style heuristic pair).
    """
    toks = tokens_expr(text_col)
    d = docs.withColumn("_toks", toks)
    n_tokens = F.size("_toks")
    n_chars = F.length(text_col)
    total_tok_len = F.aggregate(
        "_toks", F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    stop_hits = F.size(
        F.filter("_toks", lambda t: t.isin(*EN_STOPWORDS))
    )
    alpha_chars = F.length(F.regexp_replace(F.col(text_col), r"[^a-z]", ""))
    out = d.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct("_toks")).alias("n_distinct_tokens"),
        _bp(total_tok_len, n_tokens).alias("avg_token_len_bp"),
        _bp(stop_hits, n_tokens).alias("stopword_bp"),
        _bp(alpha_chars, n_chars).alias("alpha_bp"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_tokens") >= 10)
        & (F.col("n_tokens") <= 100_000)
        & (F.col("stopword_bp") >= 100),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-profile language classifier.

    Scores each language by token hits against its profile; predicts the
    argmax with LANG_ORDER as the deterministic tiebreak (first language
    with the maximal score wins). Returns (id, score_<lang>..., pred_lang).
    """
    d = docs.withColumn("_toks", tokens_expr(text_col))

    def _hits(words: tuple[str, ...]):
        # single-param lambda: higher-order functions pass one Column per
        # declared parameter (a default param would receive a Column too)
        return lambda t: t.isin(*words)

    scores = {
        lang: F.size(F.filter("_toks", _hits(words)))
        for lang, words in LANG_PROFILES.items()
    }
    cols = [F.col(id_col)] + [scores[lang].alias(f"score_{lang}") for lang in LANG_ORDER]
    out = d.select(*cols)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_ORDER])
    pred = None
    for lang in reversed(LANG_ORDER):
        cond = F.col(f"score_{lang}") == best
        pred = F.when(cond, F.lit(lang)) if pred is None else F.when(cond, F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", pred)


def _run_stats(arr: Column) -> Column:
    """(top, dist) of an n-gram array: max occurrence count of any single
    value and the number of distinct values — computed as a sort + one
    linear run-length fold INSIDE the row (F.aggregate), so the whole
    repetition pass is map-only. The alternative (explode + groupBy)
    shuffles every token occurrence in the corpus; this shuffles
    nothing."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("top"),
        F.lit(0).cast("long").alias("dist"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["top"], run).alias("top"),
            (acc["dist"] + F.when(x == acc["prev"], 0).otherwise(1)).alias("dist"),
        )

    return F.aggregate(
        F.array_sort(arr),
        zero,
        step,
        lambda acc: F.struct(acc["top"].alias("top"), acc["dist"].alias("dist")),
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1) on token
    n-grams: a document dominated by a few repeated n-grams is
    boilerplate. Per doc:

    - top_token_bp / top_bigram_bp — share of occurrences held by the
      single most frequent token / 2-gram,
    - dup_bigram_bp — share of 2-gram occurrences that repeat an earlier
      occurrence (1 - distinct/total).

    Scale shape: MAP-ONLY — per-row array sort + linear run-length fold
    (`_run_stats`); no explode, no shuffle, no corpus-wide key anywhere."""
    toks = tokens_expr(text_col)
    d = docs.select(F.col(id_col), toks.alias("_toks")).filter(F.size("_toks") >= 2)
    bigrams = F.expr(
        "transform(sequence(1, size(_toks) - 1), i -> concat(_toks[i-1], ' ', _toks[i]))"
    )
    d = d.select(
        id_col,
        F.size("_toks").cast("long").alias("n_tokens"),
        _run_stats(F.col("_toks")).alias("u"),
        (F.size("_toks") - 1).cast("long").alias("n_bigrams"),
        _run_stats(bigrams).alias("b"),
    )
    return d.select(
        id_col,
        "n_tokens",
        _bp(F.col("u.top"), F.col("n_tokens")).alias("top_token_bp"),
        "n_bigrams",
        _bp(F.col("b.top"), F.col("n_bigrams")).alias("top_bigram_bp"),
        _bp(F.col("n_bigrams") - F.col("b.dist"), F.col("n_bigrams")).alias(
            "dup_bigram_bp"
        ),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 3,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03).

    Positional k-token shingle hashes; within every window of `window`
    consecutive hashes keep the minimum; the distinct kept hashes are the
    document's fingerprint set. Guarantees any shared run of
    k+window-1 tokens between two documents shares a fingerprint.

    Returns one row per (id, fingerprint) — exploded for joinability
    (fingerprint inverted indexes are built by a groupBy on fingerprint).
    """
    toks = tokens_expr(text_col)
    # the filter runs BEFORE the positional-hash projection so the
    # sequence() bounds below are always ascending
    d = docs.withColumn("_toks", toks).filter(F.size("_toks") >= k + window - 1)
    n = F.size("_toks")
    # positional k-shingle hashes (1-based element_at; duplicates kept —
    # winnowing is positional, unlike the set-of-shingles MinHash path)
    d = d.withColumn(
        "_h",
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: hash64(F.array_join(F.slice("_toks", i, k), " "), "shingle"),
        ),
    )
    nh = F.size("_h")
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), nh - (window - 1)),
            lambda i: F.array_min(F.slice("_h", i, window)),
        )
    )
    return d.select(F.col(id_col), F.explode(fps).alias("fingerprint"))


def doc_keywords(
    docs: DataFrame, top: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document keyword extraction: the `top` tokens ranked by
    (tf desc, df asc, token asc) — the integer-exact core of tf-idf
    (a term matters when it's frequent here and rare elsewhere) without
    the transcendental idf, so any SQL engine reproduces the ranking
    bit-for-bit.

    Scale shape: one explode → (doc, token) count (map-side combinable),
    document frequency as a second aggregate over the SAME frame
    (shuffle ∝ distinct (doc, token) pairs, never raw token occurrences),
    df joined back on the token key, and a per-document top-k window.
    Returns (doc_id, token, tf, df, rank).
    """
    tf = (
        docs.select(F.col(id_col), F.explode(tokens_expr(text_col)).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    w = Window.partitionBy(id_col).orderBy(F.desc("tf"), F.asc("df"), F.asc("token"))
    return (
        tf.join(df_, "token")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select(id_col, "token", "tf", "df", "rank")
    )


def token_histogram(docs: DataFrame, text_col: str = "text", top: int = 20) -> DataFrame:
    """Corpus token frequencies, top-N by count (count desc, token asc).

    The one wide op in this module: a partial-aggregated groupBy on the
    token — map-side combine keeps the shuffle proportional to the
    vocabulary, not the corpus.
    """
    return (
        docs.select(F.explode(tokens_expr(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(top)
    )


def bigram_familiarity(
    docs: DataFrame, min_df: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """LM-proxy quality signal: what fraction of a document's distinct
    bigrams also appear in other documents? Text whose word transitions
    are corpus-typical scores high; gibberish and boilerplate-mangled
    text score low — the integer-exact stand-in for an n-gram LM
    perplexity filter.

    Returns (doc_id, n_bigrams, n_familiar, familiarity_bp) where a
    bigram is familiar iff its document frequency >= min_df.

    Scale shape: distinct bigrams per doc (map-only), document frequency
    as ONE map-side-combinable groupBy over (doc, bigram) rows, joined
    back on the bigram key — shuffle ∝ distinct bigram occurrences, and
    the df table is vocabulary-sized (broadcastable at most corpus
    scales)."""
    b = (
        docs.withColumn("_toks", tokens_expr(text_col))
        .filter(F.size("_toks") >= 2)
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, size(_toks) - 1),"
                        " i -> concat(_toks[i-1], ' ', _toks[i]))"
                    )
                )
            ).alias("bg"),
        )
    )
    df_ = b.groupBy("bg").agg(F.count("*").alias("df"))
    return (
        b.join(df_, "bg")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.count_if(F.col("df") >= min_df).alias("n_familiar"),
        )
        .withColumn(
            "familiarity_bp",
            F.floor(F.lit(10000) * F.col("n_familiar") / F.col("n_bigrams")).cast("long"),
        )
    )


def chunk_windows(
    docs: DataFrame,
    size: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the sharding step that turns raw documents into training sequences
    (size tokens per example, stride < size keeps cross-boundary context).

    Returns (doc_id, chunk_start, n_chunk_tokens, chunk_hash) with one
    row per window; chunk_hash is the keyed content digest (joinable for
    chunk-level dedup downstream).

    Scale shape: MAP-ONLY — the explode fans out rows inside each task
    (never more than ceil(n_tokens/stride) per doc), nothing shuffles;
    the row fan-out is bounded by size/stride (~1.3x token volume here).
    """
    from tsdb_spark.pipeline.common import hash64

    d = docs.withColumn("_toks", tokens_expr(text_col)).filter(F.size("_toks") >= 1)
    starts = F.sequence(
        F.lit(0), F.size("_toks") - 1, F.lit(stride)
    )  # every start < n_tokens
    e = d.select(
        F.col(id_col), "_toks", F.explode(starts).alias("chunk_start")
    )
    chunk = F.slice("_toks", F.col("chunk_start") + 1, size)
    return e.select(
        id_col,
        "chunk_start",
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        hash64(F.array_join(chunk, " "), "chunk").alias("chunk_hash"),
    )


#: conservative PII patterns, restricted to the regex subset on which
#: Java (Spark) and RE2 (DuckDB/Go) agree exactly: literal classes,
#: bounded/unbounded counted repeats, no backrefs or lookaround
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_DIGITS_RE = r"[0-9]{6,}"


def pii_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII detection report: email-address and long-digit-run
    (id/phone-shaped) match counts, the total characters a redaction pass
    would mask, and the keep/scrub verdict — the compliance gate a
    training corpus runs before release.

    Scale shape: MAP-ONLY — two regex extractions per row, zero shuffle;
    the match lists never leave the task (only their counts/length sums
    project out), so memory is bounded by one document regardless of
    corpus size.
    """
    emails = F.regexp_extract_all(F.col(text_col), F.lit(PII_EMAIL_RE), 0)
    digits = F.regexp_extract_all(F.col(text_col), F.lit(PII_DIGITS_RE), 0)

    def total_len(matches):
        return F.aggregate(
            F.transform(matches, lambda m: F.length(m).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    return docs.select(
        id_col,
        F.size(emails).cast("long").alias("n_emails"),
        F.size(digits).cast("long").alias("n_long_digits"),
        (total_len(emails) + total_len(digits)).alias("masked_chars"),
        ((F.size(emails) > 0) | (F.size(digits) > 0)).cast("int").alias("has_pii"),
    )


def pack_shards(
    docs: DataFrame,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    part_col: str = "source",
) -> DataFrame:
    """Greedy sequence packing: within each `part_col` stream (ordered
    by `id_col`) documents are concatenated into one token stream and
    cut every `budget` tokens; a document belongs to the shard where
    its FIRST token lands (concat-and-split packing, the standard
    pretraining batch layout — no padding waste, long docs span
    shards).

    Returns one row per (part, shard_id): doc count, token sum, and the
    id range of the documents that start in the shard.

    Scale shape: the running sum is windowed PER SOURCE — no global
    sort, one ordered pass per stream; the final rollup is a combinable
    groupBy on (source, shard_id). At 100 TB, sub-shard each source by
    a doc-id hash prefix first to bound window-partition width; the
    packing stays exact within each sub-stream.
    """
    from pyspark.sql import Window

    n_tok = F.size(tokens_expr(text_col)).cast("long")
    d = docs.select(F.col(part_col).alias("part"), F.col(id_col), n_tok.alias("n_tok"))
    w = (
        Window.partitionBy("part")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("cum_before", F.sum("n_tok").over(w) - F.col("n_tok"))
    return (
        c.groupBy("part", F.expr(f"cum_before div {budget}").alias("shard_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("tok_sum"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
    )


def importance_weights(
    docs: DataFrame,
    target: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style data-selection weights (Xie et al. 2023, public):
    score each document by the log-likelihood ratio between a TARGET
    bigram LM and the RAW-corpus bigram LM, both Laplace-smoothed —
    documents whose word transitions look like the target domain get
    positive scores and are up-sampled for training.

    `target` is a boolean Column over the doc row (default lang='en').
    Returns (doc_id, n_bigrams, score_mn) with the score as an exact
    integer sum of per-term milli-nats: each occurrence contributes
    round(1000 * (ln p_target(bg) - ln p_raw(bg))), rounded BEFORE the
    sum so the fold is order-free integer addition — no float-sum
    nondeterminism across partitionings or engines.

    Scale shape: one bigram explode (map-only), ONE combinable groupBy
    to (doc, bigram) occurrence counts, the two LM count tables derive
    from it vocabulary-sized, the totals row broadcasts; shuffle is
    bounded by distinct (doc, bigram) pairs.
    """
    target = target if target is not None else (F.col("lang") == "en")
    b = (
        docs.withColumn("_toks", tokens_expr(text_col))
        .filter(F.size("_toks") >= 2)
        .select(
            F.col(id_col),
            target.alias("is_t"),
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_toks) - 1),"
                    " i -> concat(_toks[i-1], ' ', _toks[i]))"
                )
            ).alias("bg"),
        )
    )
    occ = b.groupBy(id_col, "is_t", "bg").agg(F.count("*").alias("n_occ"))
    cts = occ.groupBy("bg").agg(
        F.sum("n_occ").alias("ct_r"),
        F.coalesce(
            F.sum(F.when(F.col("is_t"), F.col("n_occ"))), F.lit(0)
        ).alias("ct_t"),
    )
    tot = cts.agg(
        F.sum("ct_r").alias("nr"), F.sum("ct_t").alias("nt"), F.count("*").alias("v")
    )
    term_mn = F.round(
        1000
        * (
            F.log((F.col("ct_t") + 1) / (F.col("nt") + F.col("v")))
            - F.log((F.col("ct_r") + 1) / (F.col("nr") + F.col("v")))
        )
    ).cast("long")
    return (
        occ.join(cts, "bg")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.sum("n_occ").alias("n_bigrams"),
            F.sum(F.col("n_occ") * term_mn).alias("score_mn"),
        )
    )


# ---------------------------------------------------------------- BPE


def bpe_train(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Train a byte-pair-encoding merge table on the corpus (Sennrich
    et al. '16, the public algorithm behind GPT-2/LLaMA-style
    tokenizers).

    Scale shape: the only corpus-sized pass is ONE combinable word
    histogram (explode + groupBy count). The merge loop then runs on
    that vocabulary-sized table — the same metadata-scale driver state
    as k-means centroids; a 100 TB corpus has a ~1e7-word vocabulary,
    which is exactly the frame the original algorithm iterates on.
    Deterministic: ties on pair frequency break to the lexicographically
    greatest pair.
    """
    hist = (
        docs.select(F.explode(wordpieces_expr(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= min_freq)
    )
    words: dict[tuple[str, ...], int] = {
        tuple(r["w"]) + ("</w>",): int(r["freq"]) for r in hist.collect()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, f in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        nxt: dict[tuple[str, ...], int] = {}
        for sym, f in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + f
        words = nxt
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge of one word (the standard BPE
    inference loop)."""
    sym = list(word) + ["</w>"]
    while len(sym) > 1:
        cand = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(sym, sym[1:]))
            if (a, b) in ranks
        ]
        if not cand:
            break
        _, i = min(cand)
        sym = sym[:i] + [sym[i] + sym[i + 1]] + sym[i + 2:]
    return sym


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a trained merge table.

    Scale shape: encode the corpus's DISTINCT words once (a vocab-sized
    Arrow-batched pass — the merge loop never touches the corpus), then
    broadcast-join the exploded corpus against that word→n_tokens map
    and reduce per document. Per-occurrence work is a hash-join probe,
    not a re-encode.

    Returns (id_col, n_words, n_bpe_tokens).
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {m: i for i, m in enumerate(merges)}
    # explicit form: string type hints under `from __future__ import
    # annotations` break pandas_udf's hint introspection
    n_toks = pandas_udf(
        lambda ws: ws.map(lambda w: len(bpe_encode_word(w, ranks))),
        "integer",
    )

    occ = docs.select(
        F.col(id_col), F.explode(wordpieces_expr(text_col)).alias("w")
    )
    vocab = occ.select("w").distinct().withColumn("nt", n_toks("w"))
    return (
        occ.join(F.broadcast(vocab), "w")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("nt").cast("long").alias("n_bpe_tokens"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 retrieval: the top_k documents for a bag-of-terms query —
    the corpus-slicing / contamination-lookup primitive of a training-
    data pipeline (find the documents a benchmark query would surface).

    Uses the RATIONAL idf (N - df + 0.5)/(df + 0.5), i.e. Robertson-
    Sparck-Jones without the log: every arithmetic step is IEEE
    +,-,*,/ so a SQL oracle reproduces the scores bit-for-bit (ln()
    may differ in the last ulp across engines). Monotone in the
    standard idf, so per-term ranking is identical; multi-term totals
    weight rare terms more steeply than log-idf BM25 — a documented,
    deterministic variant.

    Scale shape: ONE map-only pass computes per-doc term frequencies
    (query terms are a literal handful, so tf columns are fixed-width —
    no explode, no per-term shuffle); a single-row global aggregate
    (df per term, Σdl, N) broadcasts back via crossJoin; the score is
    a fixed-order fold over the term columns (deterministic float
    addition, unlike a groupBy SUM); top_k lands as one
    TakeOrderedAndProject. The corpus is scanned once and never
    shuffled.
    """
    toks = tokens_expr(text_col)
    base = docs.select(F.col(id_col), toks.alias("_toks")).withColumn(
        "dl", F.size("_toks").cast("long")
    )
    def _eq(term):
        # one-arg closure: a 2-arg lambda would select F.filter's
        # (element, index) form and compare tokens to positions
        return lambda x: x == F.lit(term)

    tfs = base.select(
        id_col,
        "dl",
        *[
            F.size(F.filter("_toks", _eq(t))).cast("long").alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = tfs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = tfs.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    # k1 * (1.0 - b + b * (dl / avgdl)) — parenthesized identically in
    # the SQL oracle so both engines fold the same IEEE operation order
    denom_norm = F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    )
    score = None
    hit = None
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        df = F.col(f"df_{i}").cast("double")
        idf = (F.col("n_docs").cast("double") - df + F.lit(0.5)) / (
            df + F.lit(0.5)
        )
        s = (idf * (tf * F.lit(k1 + 1.0))) / (tf + denom_norm)
        score = s if score is None else score + s
        h = F.col(f"tf_{i}") > 0
        hit = h if hit is None else hit | h
    return (
        scored.filter(hit)
        .select(id_col, "dl", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(top_k)
    )


#: the Gopher repetition-free quality rules' required stop words
#: (Rae et al. 2021, appendix A1.1 "MassiveWeb quality filtering")
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher/MassiveWeb document-quality rules (Rae et al. 2021,
    appendix A1.1) — the second standard rule-based gate next to the
    C4-style one in text_stats, widely reused by MassiveText-descended
    corpora: word count in [50, 100k], mean word length in [3, 10],
    ≤10% symbol words (# or ...), ≤10% bullet lines, ≤30% ellipsis
    lines, ≥80% words with an alphabetic character, and ≥2 of the 8
    required stop words present.

    All signals are integer basis points (floor semantics shared with
    the DuckDB oracle), one map-only pass, no shuffle. Returns
    (id, n_words, mean_word_len_bp, symbol_word_bp, bullet_line_bp,
    ellipsis_line_bp, alpha_word_bp, gopher_stopwords, keep)."""
    d = docs.withColumn("_toks", tokens_expr(text_col)).withColumn(
        "_lines",
        F.filter(
            F.split(F.col(text_col), "\n"),
            lambda ln: F.trim(ln) != F.lit(""),
        ),
    )
    n_words = F.greatest(F.size("_toks"), F.lit(1))
    n_lines = F.greatest(F.size("_lines"), F.lit(1))
    total_tok_len = F.aggregate(
        "_toks", F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    symbol_words = F.size(
        F.filter(
            "_toks", lambda t: (t == F.lit("#")) | t.contains("...")
        )
    )
    alpha_words = F.size(F.filter("_toks", lambda t: t.rlike("[a-zA-Z]")))
    bullet_lines = F.size(
        F.filter(
            "_lines",
            lambda ln: F.trim(ln).startswith("-")
            | F.trim(ln).startswith("*")
            | F.trim(ln).startswith("•"),
        )
    )
    ellipsis_lines = F.size(
        F.filter(
            "_lines",
            lambda ln: F.trim(ln).endswith("...")
            | F.trim(ln).endswith("…"),
        )
    )
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            lambda w: F.array_contains("_toks", w),
        )
    )
    out = d.select(
        F.col(id_col),
        F.size("_toks").cast("long").alias("n_words"),
        _bp(total_tok_len, n_words).alias("mean_word_len_bp"),
        _bp(symbol_words, n_words).alias("symbol_word_bp"),
        _bp(bullet_lines, n_lines).alias("bullet_line_bp"),
        _bp(ellipsis_lines, n_lines).alias("ellipsis_line_bp"),
        _bp(alpha_words, n_words).alias("alpha_word_bp"),
        stop_hits.cast("long").alias("gopher_stopwords"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (F.col("mean_word_len_bp") >= 30_000)
        & (F.col("mean_word_len_bp") <= 100_000)
        & (F.col("symbol_word_bp") <= 1_000)
        & (F.col("bullet_line_bp") <= 1_000)
        & (F.col("ellipsis_line_bp") <= 3_000)
        & (F.col("alpha_word_bp") >= 8_000)
        & (F.col("gopher_stopwords") >= 2),
    )
