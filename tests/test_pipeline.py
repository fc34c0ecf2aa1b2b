"""Unit tests for the training-data pipeline operators on tiny literal
frames (the oracle-paired corpus tests live in pipeline/queries.py and
run through selfcheck/the driver)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from tsdb_spark.pipeline import dedup as D
from tsdb_spark.pipeline import embed as E
from tsdb_spark.pipeline import multimodal as M
from tsdb_spark.pipeline import text as T
from tsdb_spark.pipeline.common import hash64


def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )


def test_hash64_matches_md5_prefix(spark):
    out = spark.range(1).select(hash64(F.lit("hello"), 7).alias("h")).collect()[0]["h"]
    expect = int(hashlib.md5(b"7:hello").hexdigest()[:15], 16)
    assert out == expect


def test_shingles(spark):
    df = docs_df(spark, ["a b c d", "a b"])
    out = df.select(D.shingles_expr("text").alias("s")).collect()
    assert out[0]["s"] == ["a b c", "b c d"]
    assert out[1]["s"] == []  # fewer tokens than k


def test_exact_dedup(spark):
    df = docs_df(spark, ["same text", "other", "same text"])
    rows = {r["doc_id"]: r for r in D.exact_dedup(df).collect()}
    assert rows[0]["canonical_id"] == 0 and not rows[0]["is_dup"]
    assert rows[2]["canonical_id"] == 0 and rows[2]["is_dup"]
    assert rows[2]["group_size"] == 2
    assert rows[1]["group_size"] == 1 and not rows[1]["is_dup"]


def test_minhash_identical_docs_identical_sigs(spark):
    df = docs_df(spark, ["w1 w2 w3 w4 w5", "w1 w2 w3 w4 w5", "x1 x2 x3 x4 x5"])
    sigs = {r["id"]: r["sig"] for r in D.minhash_signatures(df).collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[2]


def test_lsh_pipeline_finds_near_dup(spark):
    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(38))  # drop last 2 tokens
    far = " ".join(f"other{i}" for i in range(40))
    df = docs_df(spark, [base, near, far])
    sigs = D.minhash_signatures(df)
    pairs = D.jaccard_pairs(D.lsh_candidate_pairs(sigs), sigs).collect()
    assert [(p["id_a"], p["id_b"]) for p in pairs] == [(0, 1)]
    # jaccard = 36/38 shared 3-shingles
    assert pairs[0]["jaccard_bp"] == (10000 * 36) // 38


def test_simhash_properties(spark):
    base = " ".join(f"tok{i}" for i in range(40))
    df = docs_df(spark, [base, base, "completely different words entirely here now"])
    out = df.select(D.simhash_expr("text").alias("s")).collect()
    assert out[0]["s"] == out[1]["s"]
    assert out[0]["s"] != out[2]["s"]
    assert 0 <= out[0]["s"] < (1 << D.SIMHASH_BITS)
    pairs = D.simhash_near_pairs(docs_df(spark, [base, base])).collect()
    assert len(pairs) == 1 and pairs[0]["hamming"] == 0


def test_winnowing_shared_run_shares_fingerprint(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    df = docs_df(spark, [f"a1 a2 a3 {shared}", f"b1 b2 b3 b4 {shared}"])
    fps = T.winnow_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    # winnowing guarantee: any shared run of k+window-1=6 tokens shares a print
    assert by_doc[0] & by_doc[1]


def test_text_stats(spark):
    df = docs_df(spark, ["the cat sat on the mat"])
    r = T.text_stats(df).collect()[0]
    assert r["n_tokens"] == 6
    assert r["n_distinct_tokens"] == 5
    assert r["n_chars"] == 22
    assert r["stopword_bp"] == (10000 * 2) // 6  # 'the' twice
    assert not r["keep"]  # < 10 tokens


def test_language_id_prefers_profile_hits(spark):
    df = docs_df(spark, ["der hund ist nicht da", "le chat est la", "just some words"])
    out = {r["doc_id"]: r["pred_lang"] for r in T.language_id(df).collect()}
    assert out[0] == "de"
    assert out[1] == "fr"
    assert out[2] == "en"  # zero scores everywhere -> first in preference order


def test_cosine_expr_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])],
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
    )
    out = [r["c"] for r in df.select(E.cosine_expr("a", "b").alias("c")).collect()]
    assert out[0] == pytest.approx(1.0)
    assert out[1] == pytest.approx(0.0)
    assert out[2] == pytest.approx(1.0)


def test_cosine_topk_ranks(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    probes = emb.filter(F.col("vec_id") == 0)
    out = E.cosine_topk(emb, probes, k=2).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in out] == [1, 2]


def test_ann_lsh_buckets_are_deterministic(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), float(-i), 1.0, 0.5]) for i in range(6)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    codes1 = {r["vec_id"]: r["b"] for r in emb.select("vec_id", E.lsh_bucket_expr("embedding").alias("b")).collect()}
    codes2 = {r["vec_id"]: r["b"] for r in emb.select("vec_id", E.lsh_bucket_expr("embedding").alias("b")).collect()}
    assert codes1 == codes2
    assert all(0 <= c < 64 for c in codes1.values())


def test_payload_features_roundtrip(spark):
    df = docs_df(spark, ["hello world", "αβγ"])
    out = {r["doc_id"]: r for r in M.payload_features(M.with_payload(df)).collect()}
    assert out[0]["n_bytes"] == 11
    assert out[0]["digest"] == hashlib.md5(b"hello world").hexdigest()
    assert out[1]["n_bytes"] == len("αβγ".encode())
    assert out[1]["digest"] == hashlib.md5("αβγ".encode()).hexdigest()


def test_multimodal_decode_plumbing(spark):
    import hashlib

    df = M.with_payload(docs_df(spark, ["hello world", "x"]))
    # decode: full pixel array crosses Arrow; fake decoder is
    # digest-derived per 256-px block, values in [0,1]
    rows = {r["doc_id"]: r for r in M.decode_image(df, 8, 8).collect()}
    assert rows[0]["width"] == 8 and len(rows[0]["pixels"]) == 8 * 8 * 3
    assert all(0.0 <= p <= 1.0 for p in rows[0]["pixels"])
    assert rows[0]["pixels"] != rows[1]["pixels"]
    # custom decoder plugs into the same plumbing
    custom = M.decode_image(df, 2, 2, decoder=lambda b, w, h: [0.5] * (w * h * 3))
    assert custom.collect()[0]["pixels"] == [0.5] * 12

    # frame sampling: one row per every_ms of fake clip, digest chain
    frames = M.sample_frames(df, every_ms=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[0]) == len(b"hello world") // 4 + 1
    assert len(by_doc[1]) == 1
    d0 = hashlib.md5(b"hello world").hexdigest()
    assert by_doc[0][0]["frame_digest"] == hashlib.md5(f"frm:{d0}:0".encode()).hexdigest()
    assert [r["ts_ms"] for r in sorted(by_doc[0], key=lambda r: r["frame_idx"])] == [
        0, 4, 8
    ]


def test_pipeline_plans_stay_jvm_side(spark):
    # the sketch paths must never fall back to row-at-a-time Python:
    # no BatchEvalPython/ArrowEvalPython in minhash, simhash, or the
    # embedding LSH plans (mapInPandas appears only in multimodal,
    # where it is the sanctioned path)
    docs = docs_df(spark, ["a b c d e f", "a b c d e g", "x y z w v u"])
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 2.0]) for i in range(8)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    from tsdb_spark.pipeline import dedup as D
    from tsdb_spark.pipeline import embed as E

    for df in (
        D.minhash_signatures(docs),
        D.simhash_frame(docs),
        E.ann_lsh_topk(emb, emb.filter("vec_id < 2")),
        E.ann_ivf_topk(emb, emb.filter("vec_id < 2"), n_centroids=4, nprobe=2),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


def test_lsh_hot_bucket_cap(spark):
    # 30 identical docs share every band key (a degenerate bucket that
    # would emit 30*29/2 pairs per band at scale); the cap drops those
    # buckets while a small near-dup pair elsewhere still surfaces
    hot = ["z1 z2 z3 z4 z5 z6"] * 30
    base = " ".join(f"tok{i}" for i in range(40))
    near = " ".join(f"tok{i}" for i in range(38))
    df = docs_df(spark, hot + [base, near])
    sigs = D.minhash_signatures(df)
    uncapped = D.lsh_candidate_pairs(sigs).count()
    capped = D.lsh_candidate_pairs(sigs, max_bucket=10)
    pairs = [(r["id_a"], r["id_b"]) for r in capped.collect()]
    assert uncapped == 30 * 29 // 2 + 1
    assert pairs == [(30, 31)]


def test_connected_components_chain_and_triangle(spark):
    # triangle {0,1,2}, a 9-node chain 10..18 (deep enough that plain
    # min-propagation needs several rounds — exercises pointer jumping),
    # and an isolated pair {100, 101}
    edges = [(0, 1), (1, 2), (0, 2)]
    edges += [(i, i + 1) for i in range(10, 18)]
    edges += [(100, 101)]
    df = spark.createDataFrame(edges, "id_a LONG, id_b LONG")
    got = {r["id"]: r["label"] for r in D.connected_components(df).collect()}
    assert {got[i] for i in (0, 1, 2)} == {0}
    assert {got[i] for i in range(10, 19)} == {10}
    assert got[100] == got[101] == 100


def test_dedup_clusters_canonical_and_size(spark):
    df = spark.createDataFrame(
        [(5, 3), (3, 7), (20, 21)], "id_a LONG, id_b LONG"
    )
    rows = {r["id"]: r for r in D.dedup_clusters(df).collect()}
    assert rows[3]["is_canonical"] and rows[3]["cluster_size"] == 3
    assert rows[5]["cluster_id"] == 3 and not rows[5]["is_canonical"]
    assert rows[7]["cluster_id"] == 3
    assert rows[20]["cluster_id"] == 20 and rows[21]["cluster_size"] == 2


def test_repetition_stats_known_values(spark):
    # "a b a b a": tokens a×3 b×2 (top 3/5); bigrams "a b"×2 "b a"×2
    # (top 2/4, distinct 2 of 4 occurrences → dup 50%)
    df = spark.createDataFrame([(1, "a b a b a")], "doc_id LONG, text STRING")
    r = T.repetition_stats(df).collect()[0]
    assert r["n_tokens"] == 5 and r["top_token_bp"] == 6000
    assert r["n_bigrams"] == 4 and r["top_bigram_bp"] == 5000
    assert r["dup_bigram_bp"] == 5000


def test_kmeans_centroids_lloyd_update(spark):
    # two clean cosine clusters; init = ids 0,1; all values picked so the
    # micro-unit grid and the means are exact in binary floating point
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.75, 0.25]), (3, [0.25, 0.75])]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    got = {
        r["centroid_id"]: r["_cent"]
        for r in E.kmeans_centroids(df, n_centroids=2, iters=1).collect()
    }
    assert got[0] == [0.875, 0.125] and got[1] == [0.125, 0.875]
    # fixed point: the second Lloyd iteration reassigns identically
    got2 = {
        r["centroid_id"]: r["_cent"]
        for r in E.kmeans_centroids(df, n_centroids=2, iters=2).collect()
    }
    assert got2 == got


def test_lsh_self_joins_are_equi_not_nlj(spark):
    # the banded/bucketed self-joins must compile to hash/sort-merge
    # equi-joins — a BroadcastNestedLoopJoin here is the all-pairs
    # cartesian the LSH design exists to avoid
    docs = docs_df(spark, ["a b c d e f", "a b c d e g", "x y z w v u"] * 4)
    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 2.0]) for i in range(12)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    sigs = D.minhash_signatures(docs)
    for df in (
        D.lsh_candidate_pairs(sigs),
        D.simhash_near_pairs(docs),
        E.cosine_near_dup_pairs(emb, min_cos_bp=90000),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoopJoin" not in plan, plan[:2000]
        assert "CartesianProduct" not in plan, plan[:2000]


def test_minhash_signatures_wide_family(spark):
    # n_hashes above the default family size must extend the hash family
    # (the constants are generated per index), not silently cap the
    # min-aggregates at 32 while the signature array asks for more
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "x y z w q r s")],
        "doc_id LONG, text STRING",
    )
    sigs = {r["id"]: r["sig"] for r in D.minhash_signatures(df, n_hashes=48).collect()}
    assert all(len(s) == 48 for s in sigs.values())
    assert sigs[1] == sigs[2] and sigs[1] != sigs[3]
    # the wide family's prefix IS the default family (same per-index seeds)
    narrow = {r["id"]: r["sig"] for r in D.minhash_signatures(df).collect()}
    assert sigs[1][: D.N_HASHES] == narrow[1]


# ---------------------------------------------------------------- selection


def test_stratified_sample_deterministic_and_bounded(spark):
    from tsdb_spark.pipeline import sampling as S

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias("source"),
    )
    rate = F.when(F.col("source") == "src0", 0).otherwise(5000)
    out = S.stratified_sample(df, rate, id_col="doc_id")
    rows = out.collect()
    # rate 0 strata contribute nothing
    assert all(r["source"] != "src0" for r in rows)
    # every kept key is under its rate
    assert all(r["samp_key"] < r["rate_bp"] for r in rows)
    # deterministic: the same call selects the same ids
    again = {r["doc_id"] for r in S.stratified_sample(df, rate).collect()}
    assert {r["doc_id"] for r in rows} == again
    # roughly half of the eligible 1500 docs survive a 50% rate
    assert 600 <= len(rows) <= 900


def test_stratified_sample_is_subset_stable(spark):
    # hash sampling must pick the same doc regardless of which other
    # rows are present (the property rand() sampling lacks)
    from tsdb_spark.pipeline import sampling as S

    df = spark.range(100).select(F.col("id").alias("doc_id"), F.lit("srcX").alias("source"))
    full = {r["doc_id"] for r in S.stratified_sample(df, F.lit(5000)).collect()}
    half = {r["doc_id"] for r in S.stratified_sample(df.filter("doc_id < 50"), F.lit(5000)).collect()}
    assert half == {d for d in full if d < 50}


def test_doc_keywords_ranking(spark):
    # doc0: 'b' most frequent; 'a' appears in both docs (df=2) while 'c'
    # is unique to doc0 — at equal tf the rarer token ranks first
    df = docs_df(spark, ["b b a c", "a x y"])
    rows = T.doc_keywords(df, top=2).collect()
    d0 = sorted([r for r in rows if r["doc_id"] == 0], key=lambda r: r["rank"])
    assert [r["token"] for r in d0] == ["b", "c"]
    assert d0[0]["tf"] == 2 and d0[0]["df"] == 1
    d1 = sorted([r for r in rows if r["doc_id"] == 1], key=lambda r: r["rank"])
    # tf all 1: df asc then token asc → x,y (df=1) before a (df=2)
    assert [r["token"] for r in d1] == ["x", "y"]


def test_decontaminate_flags_planted_overlap(spark):
    from tsdb_spark.pipeline import sampling as S

    probes = docs_df(spark, ["one two three four five six"])
    corpus = spark.createDataFrame(
        [
            (10, "zz one two three four five yy"),   # shares 5-grams
            (11, "totally different words here indeed ok"),
        ],
        "doc_id LONG, text STRING",
    )
    rows = S.decontaminate(corpus, probes, k=5).collect()
    assert [r["doc_id"] for r in rows] == [10]
    # 'one two three four five' and 'two three four five six'? only the
    # first survives inside doc 10 (yy breaks the second) → 1 shared
    assert rows[0]["n_shared"] == 1 and rows[0]["n_probe_docs"] == 1


def test_audio_features_integer_dsp(spark):
    df = spark.createDataFrame([(1, "ab")], "doc_id LONG, text STRING")
    rows = M.audio_features(M.with_payload(df), window=64).collect()
    # 'a'=97, 'b'=98 → centered: -31, -30; one window
    assert len(rows) == 1
    r = rows[0]
    assert r["n_samples"] == 2
    assert r["energy"] == 31 * 31 + 30 * 30
    assert r["zero_crossings"] == 0
    assert r["peak"] == 31


def test_audio_features_windows_and_zcr(spark):
    # 130,126 alternate around the 128 center → 3 sign flips in one window
    payload_text = chr(130 if False else 0x82) if False else None
    df = spark.createDataFrame([(1, "\x82\x7e\x82\x7e")], "doc_id LONG, text STRING")
    rows = M.audio_features(M.with_payload(df), window=2).collect()
    # NB: \x82 is non-ascii → utf-8 encodes multibyte; just assert the
    # fan-out contract (windows cover all bytes, indices contiguous)
    total = sum(r["n_samples"] for r in rows)
    assert total == len("\x82\x7e\x82\x7e".encode("utf-8"))
    assert [r["win_idx"] for r in rows] == list(range(len(rows)))


def test_ivf_index_roundtrip_matches_inmemory(spark, tmp_path):
    from tsdb_spark.pipeline.vecindex import IvfIndex

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 5) + 0.25 for j in range(4)]) for i in range(30)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    probes = emb.filter(F.col("vec_id") < 3)
    direct = E.ann_ivf_topk(emb, probes, k=2, n_centroids=4, nprobe=2)
    idx = IvfIndex.build(spark, emb, str(tmp_path / "ivf"), n_centroids=4)
    served = IvfIndex.open(spark, str(tmp_path / "ivf")).search(probes, k=2, nprobe=2)
    a = sorted(map(tuple, direct.collect()))
    b = sorted(map(tuple, served.collect()))
    assert a == b
    assert idx.meta["n_vectors"] == 30 and idx.meta["dim"] == 4


def test_bigram_familiarity(spark):
    df = docs_df(spark, ["a b c", "a b d", "x y"])
    rows = {r["doc_id"]: r for r in T.bigram_familiarity(df).collect()}
    # doc0: bigrams {a b, b c}; 'a b' appears in doc1 too → familiar
    assert rows[0]["n_bigrams"] == 2 and rows[0]["n_familiar"] == 1
    assert rows[0]["familiarity_bp"] == 5000
    # doc2: 'x y' unique → 0 familiar
    assert rows[2]["n_familiar"] == 0 and rows[2]["familiarity_bp"] == 0


def test_chunk_windows_strides_and_tail(spark):
    from tsdb_spark.pipeline.text import chunk_windows

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(80))),  # 80 tokens → starts 0,24,48,72
            (2, "only three tokens"),                   # single short chunk
            (3, ""),                                    # no tokens → no rows
        ],
        "doc_id LONG, text STRING",
    )
    rows = {
        (r["doc_id"], r["chunk_start"]): r
        for r in chunk_windows(docs, size=32, stride=24).collect()
    }
    assert sorted(k for k in rows if k[0] == 1) == [(1, 0), (1, 24), (1, 48), (1, 72)]
    assert rows[(1, 0)]["n_chunk_tokens"] == 32
    assert rows[(1, 72)]["n_chunk_tokens"] == 8  # tail clipped to remaining
    assert rows[(2, 0)]["n_chunk_tokens"] == 3
    assert not any(k[0] == 3 for k in rows)
    # overlap: chunk at 24 shares tokens 24..31 with chunk at 0 but
    # hashes differently (different window content)
    assert rows[(1, 0)]["chunk_hash"] != rows[(1, 24)]["chunk_hash"]


def test_chunk_windows_hash_is_content_keyed(spark):
    from tsdb_spark.pipeline.text import chunk_windows

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b d")], "doc_id LONG, text STRING"
    )
    h = {r["doc_id"]: r["chunk_hash"] for r in chunk_windows(docs).collect()}
    assert h[1] == h[2]  # identical content → identical digest (dedup-joinable)
    assert h[1] != h[3]


def test_pq_codes_known_assignment(spark):
    from tsdb_spark.pipeline.embed import pq_codes

    # codebook = vectors 0 and 1; vector 2's first half matches v0's,
    # second half matches v1's; codebook entries encode themselves
    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 10.0, 10.0]),
            (1, [5.0, 5.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 1.0]),
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    rows = {r["vec_id"]: r for r in pq_codes(emb, m=2, n_codes=2).collect()}
    assert (rows[0]["code0"], rows[0]["code1"], rows[0]["err_bp"]) == (0, 0, 0)
    assert (rows[1]["code0"], rows[1]["code1"], rows[1]["err_bp"]) == (1, 1, 0)
    # v2 first half [1,0]: d2 to cb0 [0,0] = 1, to cb1 [5,5] = 41 → code 0
    # v2 second half [0,1]: d2 to cb0 [10,10] = 181, to cb1 [0,0] = 1 → code 1
    assert (rows[2]["code0"], rows[2]["code1"]) == (0, 1)
    assert rows[2]["err_bp"] == 20000  # (1 + 1) * 1e4


# ---------------------------------------------------------------- BPE


def test_bpe_train_matches_hand_model(spark):
    # the classic Sennrich example corpus: low/lower/newest/widest
    rows = [(1, "low low low low low lower lower "
                "newest newest newest newest newest newest "
                "widest widest widest")]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    merges = T.bpe_train(docs, n_merges=4, min_freq=1)
    # hand model (ties break to the lexicographically greatest pair):
    # freqs: low:5 lower:2 newest:6 widest:3
    # round 1: (e,s)/(s,t)/(t,</w>) all 9 → tie-break: ('t','</w>')
    # round 2: (e,s)/(s,t</w>) at 9 → ('s','t</w>')
    # round 3: ('e','st</w>') 9
    # round 4: (l,o)/(o,w) at 7 → ('o','w')
    assert merges == [
        ("t", "</w>"), ("s", "t</w>"), ("e", "st</w>"), ("o", "w"),
    ]
    enc = T.bpe_encode_word("newest", {m: i for i, m in enumerate(merges)})
    assert enc == ["n", "e", "w", "est</w>"]
    assert "".join(enc) == "newest</w>"


def test_bpe_apply_counts(spark):
    rows = [
        (1, "low lower low"),
        (2, "newest widest"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    merges = T.bpe_train(docs, n_merges=3, min_freq=1)
    out = {r["doc_id"]: r for r in T.bpe_apply(docs, merges).collect()}
    assert out[1]["n_words"] == 3 and out[2]["n_words"] == 2
    # token counts bounded by chars+1 per word and >= 1 per word
    for d, text in rows:
        n_chars = sum(len(w) for w in text.split())
        assert out[d]["n_words"] <= out[d]["n_bpe_tokens"] <= n_chars + out[d]["n_words"]
    # more merges never increase the token count
    merges6 = T.bpe_train(docs, n_merges=6, min_freq=1)
    out6 = {r["doc_id"]: r for r in T.bpe_apply(docs, merges6).collect()}
    for d in out:
        assert out6[d]["n_bpe_tokens"] <= out[d]["n_bpe_tokens"]


def test_bpe_encode_roundtrip_property(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog repeatedly")],
        "doc_id LONG, text STRING",
    )
    merges = T.bpe_train(docs, n_merges=10, min_freq=1)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in "the quick brown fox jumps lazy dog".split():
        toks = T.bpe_encode_word(w, ranks)
        assert "".join(toks) == w + "</w>"


def test_duplicated_spans_hand_example(spark):
    rows = [
        (1, "a b c d e f g h x"),
        (2, "a b c d e f g h y"),
        (3, "completely different words here now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in D.duplicated_spans(docs, n=8).collect()}
    # docs 1 and 2 share the 8-gram "a..h" at pos 1 → tokens 1-8 covered
    for d in (1, 2):
        assert out[d]["n_tokens"] == 9
        assert out[d]["dup_positions"] == 8
        assert out[d]["dup_span_bp"] == 8888  # floor(1e4 * 8/9)
    # doc 3 is shorter than n and shares nothing
    assert out[3]["n_tokens"] == 5 and out[3]["dup_positions"] == 0
    assert out[3]["dup_span_bp"] == 0


def test_band_index_roundtrip_and_incremental_append(spark, tmp_path):
    """Persisted MinHash band index (bandindex.BandIndex): build over a
    corpus, probe with copies + fresh docs, append a batch and probe
    again — the index answers exactly like banding the corpus inline."""
    from tsdb_spark.pipeline.bandindex import BandIndex

    base = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog again and again"),
            (1, "pack my box with five dozen liquor jugs for the long trip"),
            (2, "completely unrelated text about spark physical query plans"),
        ],
        "doc_id LONG, text STRING",
    )
    idx = BandIndex.build(spark, base, str(tmp_path / "bidx"))
    assert idx.meta["n_docs"] == 3 and idx.meta["max_doc_id"] == 2

    incoming = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog again and again"),
            (11, "something that matches nothing in the existing corpus at all"),
        ],
        "doc_id LONG, text STRING",
    )
    cand = {
        (r["new_id"], r["old_id"])
        for r in idx.probe(incoming).collect()
    }
    assert (10, 0) in cand  # exact copy collides in every band
    assert all(n != 11 for n, _ in cand)  # fresh doc has no candidates

    # incremental append: doc 10's bands join the index; a later copy
    # of it must now hit doc 10 without any rebuild
    idx.append(incoming)
    assert idx.meta["n_docs"] == 5 and idx.meta["max_doc_id"] == 11
    later = spark.createDataFrame(
        [(20, "the quick brown fox jumps over the lazy dog again and again")],
        "doc_id LONG, text STRING",
    )
    cand2 = {
        (r["new_id"], r["old_id"])
        for r in BandIndex.open(spark, str(tmp_path / "bidx")).probe(later).collect()
    }
    assert (20, 0) in cand2 and (20, 10) in cand2


def test_lsh_multiprobe_expands_candidates(spark):
    """Multi-probe LSH (hamming_probes=1) visits the probe's bucket
    plus every 1-bit-flip bucket: its result set can only gain
    candidates vs single-bucket, and h=0 stays the original behavior."""
    from pyspark.sql import functions as F

    from tsdb_spark.pipeline import embed as E

    rng_rows = [
        (i, [((i * 37 + d * 11) % 97) / 97.0 - 0.5 for d in range(16)])
        for i in range(200)
    ]
    emb = spark.createDataFrame(rng_rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    probes = emb.filter(F.col("vec_id") < 4)
    h0 = E.ann_lsh_topk(emb, probes, k=5)
    h1 = E.ann_lsh_topk(emb, probes, k=5, hamming_probes=1)
    n0 = {(r["probe_id"], r["neighbor_id"]) for r in h0.collect()}
    n1_all = {
        (r["probe_id"], r["neighbor_id"])
        for r in E.ann_lsh_topk(emb, probes, k=10**6, hamming_probes=1).collect()
    }
    # every single-bucket candidate is reachable under multi-probe
    assert n0 <= n1_all
    # and multi-probe recall vs exact cosine is at least single-bucket's
    exact = {
        (r["probe_id"], r["neighbor_id"])
        for r in E.cosine_topk(emb, probes, k=5).collect()
    }
    r0 = len(exact & n0)
    r1 = len(exact & {(r["probe_id"], r["neighbor_id"]) for r in h1.collect()})
    assert r1 >= r0


def test_sq8_dequantized_matches_exact_dot_on_grid_data(spark):
    """Vectors sitting exactly on quantization cell centers reconstruct
    losslessly, so dequantized-dot ranking must equal exact-dot ranking
    — the invariant the raw integer-code dot violated (its per-dim
    shift cross-terms reorder neighbors; see embed.sq8_topk)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window as W

    from tsdb_spark.pipeline import embed as E

    # components on the 256-cell centers of [-0.5, 0.5]
    def cell(c):
        return -0.5 + (c + 0.5) / 255.0  # lo + (c+.5)Δ with Δ = 1/255

    rows = []
    for i in range(40):
        rows.append((i, [cell((i * 13 + d * 7) % 256) for d in range(8)]))
    # pin the grid: one vector at lo, one at hi per dimension
    rows.append((100, [cell(0)] * 8))
    rows.append((101, [cell(255)] * 8))
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    probes = emb.filter(F.col("vec_id") < 3)
    approx = {
        (r["probe_id"], r["rank"]): r["neighbor_id"]
        for r in E.sq8_topk(emb, probes, k=5).collect()
    }
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("_cv"))
    p = probes.select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("_pv"))
    dot = F.aggregate(
        F.zip_with("_pv", "_cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    w = W.partitionBy("probe_id").orderBy(F.desc("dot"), "neighbor_id")
    exact = {
        (r["probe_id"], r["rank"]): r["neighbor_id"]
        for r in (
            c.crossJoin(F.broadcast(p))
            .filter("probe_id != neighbor_id")
            .withColumn("dot", dot)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .collect()
        )
    }
    assert approx == exact


def test_bm25_topk_matches_hand_model(spark):
    """Tiny corpus scored by hand with the rational idf:
    idf = (N - df + 0.5)/(df + 0.5);
    score = Σ idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))."""
    from tsdb_spark.pipeline.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (0, "join join window scan"),   # tf(join)=2 tf(window)=1 dl=4
            (1, "window window window"),    # tf(window)=3        dl=3
            (2, "scan table row"),          # no hit              dl=3
        ],
        "doc_id LONG, text STRING",
    )
    out = bm25_topk(docs, ["join", "window"], top_k=10).collect()
    # doc 2 matches no term -> filtered out
    assert [r.doc_id for r in out] != [0, 1, 2]
    got = {r.doc_id: r.score for r in out}
    assert set(got) == {0, 1}

    k1, b = 1.2, 0.75
    N, avgdl = 3, (4 + 3 + 3) / 3
    def s(tf, df, dl):
        if tf == 0:
            return 0.0
        idf = (N - df + 0.5) / (df + 0.5)
        return (idf * (tf * (k1 + 1.0))) / (
            tf + k1 * (1.0 - b + b * (dl / avgdl))
        )
    exp0 = s(2, 1, 4) + s(1, 2, 4)
    exp1 = s(0, 1, 3) + s(3, 2, 3)
    assert got[0] == pytest.approx(exp0, rel=1e-12)
    assert got[1] == pytest.approx(exp1, rel=1e-12)
    # ranking: doc 0 carries the rarer term
    assert out[0].doc_id == (0 if exp0 > exp1 else 1)


def test_gopher_quality_hand_example(spark):
    """Line- and symbol-based Gopher rules on a crafted doc (the
    synthetic corpus has no newlines/bullets, so the oracle alone
    can't exercise them)."""
    from tsdb_spark.pipeline.text import gopher_quality

    good = " ".join(
        ["the", "be", "to", "of", "and"] + ["word"] * 60
    )  # 65 words, mean len ~3.6, no symbols, plenty of stopwords
    bad = "\n".join(
        ["- bullet one", "- bullet two", "* bullet three", "tail ..."]
    )  # 3/4 bullet lines, 1/4 ellipsis lines, only 9 words
    docs = spark.createDataFrame(
        [(0, good), (1, bad)], "doc_id LONG, text STRING"
    )
    rows = {r.doc_id: r for r in gopher_quality(docs).collect()}
    g, b = rows[0], rows[1]
    assert g.n_words == 65 and g.keep
    assert g.symbol_word_bp == 0 and g.bullet_line_bp == 0
    assert g.gopher_stopwords == 5
    assert b.n_words == 11 and not b.keep  # "-"/"*" markers are tokens
    assert b.bullet_line_bp == 7500   # 3 of 4 lines
    assert b.ellipsis_line_bp == 2500  # 1 of 4 lines
    assert b.symbol_word_bp == 909    # "..." is 1 of 11 words
