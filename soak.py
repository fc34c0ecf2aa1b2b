#!/usr/bin/env python
"""Scale soak: measure how the heavy paths scale when the data grows k-fold.

/root/testdata tops out at sf0.1 (~600k samples), so the 100 TB claims
rest on plan shapes. This soak manufactures the next decade locally:
replicate the sf0.1 tables k times with shifted identities (events get
k x the series via a user_id offset; documents/embeddings get k x the
corpus via id offsets and a per-replica text tag so replicas are
distinct documents, not exact dups), write them once to /tmp, then time
each headline shape at 1x and kx IN THE SAME PROCESS and report
time_k / (k * time_1) — `linearity` <= ~1.0 means the shape scales at
or better than linearly (fixed per-job cost amortizes, no super-linear
shuffle blowup).

Prints ONE JSON line:
  {"metric": "soak_linearity", "mult": k, "sf": ..., "queries":
   {name: {"t1": s, "tk": s, "linearity": r}, ...}}

Usage: python soak.py [--mult K]   (default 8; ~5 min at sf0.1)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(spark, mult: int, out_dir: str,
              events: bool = True, docs: bool = True, embs: bool = True) -> None:
    """Write kx copies of events/documents/embeddings with shifted ids.
    Table flags skip replicas no selected shape reads (a 256x events
    table is ~150M rows of wasted write when only minhash/ann run)."""
    from pyspark.sql import functions as F

    reps = spark.range(mult).select(F.col("id").alias("_rep"))

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    if not events:
        ev = ev.limit(0)
    (
        ev.crossJoin(F.broadcast(reps))
        .select(
            (F.col("event_id") + F.col("_rep") * 100_000_000).alias("event_id"),
            "ts",
            # new user ⇒ new series per replica: series cardinality
            # scales with the data, like a fleet growing 10x
            (F.col("user_id") + F.col("_rep") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/events.parquet")
    )

    dd = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if not docs:
        dd = dd.limit(0)
    docs = dd
    (
        docs.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("_rep") * 1_000_000).alias("doc_id"),
            # per-replica token prefix keeps the 1x corpus's INTERNAL
            # near-dup structure inside each replica while sharing zero
            # shingles across replicas — so the true near-dup pair count
            # scales k-linearly like a real k-times-larger corpus. (The
            # old scheme appended one tail token, which made all k
            # replicas of a doc near-dups of each other: candidate pairs
            # grew k-squared BY TEST CONSTRUCTION and drowned the signal
            # above 64x.)
            F.when(F.col("_rep") == 0, F.col("text"))
            .otherwise(
                F.regexp_replace(
                    F.col("text"),
                    F.lit(r"(^|\s)(\S)"),
                    F.concat(
                        F.lit("$1r"),
                        F.col("_rep").cast("string"),
                        F.lit("x$2"),
                    ),
                )
            )
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/documents.parquet")
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    if not embs:
        emb = emb.limit(0)
    (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("_rep") * 1_000_000).alias("vec_id"),
            # deterministic per-(replica, vector, dim) jitter (±0.05 on
            # components spanning ±0.58): replicas are DISTINCT vectors
            # clustered near their originals, so a k-times corpus has k
            # times the genuine near-neighbor structure — identical
            # copies would make every recall measurement at kx trivial
            # (the probe's own clones ARE the exact top-k and land in
            # the same LSH bucket / IVF list by construction)
            F.when(F.col("_rep") == 0, F.col("embedding"))
            .otherwise(
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x
                        + F.pmod(
                            F.xxhash64(F.col("vec_id"), F.col("_rep"), i),
                            F.lit(1000),
                        ).cast("double")
                        / 10000.0
                        - 0.05
                    ).cast("float"),
                )
            )
            .alias("embedding"),
            "label",
        )
        .write.mode("overwrite")
        .parquet(f"{out_dir}/embeddings.parquet")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=8)
    ap.add_argument("--shapes", default=None,
                    help="comma list of shape names to run (default: all); "
                    "fullscan/matchers/compact imply ingest")
    args = ap.parse_args()
    k = args.mult
    sel = set(args.shapes.split(",")) if args.shapes else None
    if sel is not None and sel & {"fullscan", "matchers", "compact"}:
        sel.add("ingest")  # they read the store ingest builds

    from pyspark.sql import functions as F

    from tsdb_spark import DB, eq, get_spark, neq, re_match
    from tsdb_spark.queries import DAY, QUERIES, T0
    import tsdb_spark.pipeline.queries  # noqa: F401 — registers pipeline entries
    from tsdb_spark.sources.events import events_samples

    spark = get_spark("soak")
    spark.sparkContext.setLogLevel("ERROR")

    big = tempfile.mkdtemp(prefix="tsdb_soak_")
    wh = tempfile.mkdtemp(prefix="tsdb_soak_wh_")
    results: dict[str, dict[str, float]] = {}
    try:
        # warmup: pay JVM/codegen/first-shuffle fixed cost OUTSIDE the
        # timed shapes, else the 1x run absorbs it and linearity reads
        # artificially low (the r4 bench bisect showed first-execution
        # fixed cost ~1s/shape on this box)
        wdb = DB.create(spark, f"{wh}/warm", block_width_ms=6 * 3600 * 1000)
        wdb.append(
            events_samples(spark, "/root/testdata/sf0.001").select("labels", "t", "v"),
            report=False,
        )
        wdb.querier(T0, T0 + 31 * DAY).select(
            [re_match("__name__", ".*")], with_labels=False
        ).agg(F.count("*")).collect()

        _ev_shapes = {"ingest", "fullscan", "matchers", "compact", "promql"}
        _doc_shapes = {"minhash", "chunking", "packing", "dup_spans", "bpe", "cross", "cross_idx"}
        replicate(
            spark, k, big,
            events=sel is None or bool(sel & _ev_shapes),
            docs=sel is None or bool(sel & _doc_shapes),
            embs=sel is None or bool(sel & {"ann", "recall"}),
        )

        def drain(df):
            df.agg(F.count("*")).collect()

        def shape(name, fn):
            if sel is not None and name not in sel:
                return
            t0 = time.time()
            fn(SF_DIR, f"{wh}/db1")
            t1 = time.time() - t0
            t0 = time.time()
            fn(big, f"{wh}/dbk")
            tk = time.time() - t0
            results[name] = {
                "t1": round(t1, 3),
                "tk": round(tk, 3),
                "linearity": round(tk / (k * t1), 3) if t1 > 0 else -1.0,
            }
            print(f"# {name}: 1x={t1:.1f}s {k}x={tk:.1f}s linearity={results[name]['linearity']}",
                  file=sys.stderr)

        dbs: dict[str, DB] = {}

        def ingest(sf, store):
            db = DB.create(spark, store, block_width_ms=6 * 3600 * 1000)
            db.append(events_samples(spark, sf).select("labels", "t", "v"), report=False)
            dbs[store] = db

        shape("ingest", ingest)

        def fullscan(sf, store):
            drain(dbs[store].querier(T0, T0 + 31 * DAY).select(
                [re_match("__name__", ".*")], with_labels=False))

        shape("fullscan", fullscan)

        def matchers(sf, store):
            q = dbs[store].querier(T0, T0 + 31 * DAY)
            drain(q.select([eq("__name__", "click"), neq("user", "3")], with_labels=False))

        shape("matchers", matchers)

        def compact(sf, store):
            dbs[store].compact(24 * 3600 * 1000)

        shape("compact", compact)

        for qname, label in (
            ("docs_dedup_minhash", "minhash"),
            ("emb_ann_lsh", "ann"),
            ("docs_chunk_windows", "chunking"),
            ("docs_pack_shards", "packing"),
            ("promql_sum_by_rate", "promql"),
            ("docs_dup_spans", "dup_spans"),
            ("docs_cross_dedup", "cross"),
            ("docs_cross_dedup_indexed", "cross_idx"),
            ("docs_bpe_tokens", "bpe"),
        ):
            shape(label, lambda sf, store, q=qname: drain(QUERIES[q].spark_fn(spark, sf)))

        # ANN quality at scale: the timing soaks prove the SHAPES stay
        # linear; this proves the SKETCHES stay accurate — recall@3 of
        # each approximate index vs brute-force exact top-3, on the
        # same probes, at 1x and kx. A recall cliff as the corpus grows
        # (more vectors per LSH bucket / IVF list crowding out true
        # neighbors) shows up here before it would in production.
        if sel is None or "recall" in sel:
            from tsdb_spark.pipeline import embed as E

            from pyspark.sql import Window as W

            def _dot_topk(emb, probes, k=3):
                # exact integer-free dot-product top-k: sq8's OWN metric
                # (ranking by dot, not cosine), so its recall isolates
                # quantization loss from the metric mismatch
                c = emb.select(
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("_cv"),
                )
                p = probes.select(
                    F.col("vec_id").alias("probe_id"),
                    F.col("embedding").alias("_pv"),
                )
                dot = F.aggregate(
                    F.zip_with("_pv", "_cv", lambda x, y: x.cast("double") * y),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                w = W.partitionBy("probe_id").orderBy(
                    F.desc("dot"), "neighbor_id"
                )
                return (
                    c.crossJoin(F.broadcast(p))
                    .filter(F.col("probe_id") != F.col("neighbor_id"))
                    .withColumn("dot", dot)
                    .withColumn("rank", F.row_number().over(w))
                    .filter(F.col("rank") <= k)
                    .select("probe_id", "neighbor_id")
                )

            def recall_at(sf: str) -> dict[str, float]:
                emb = spark.read.parquet(f"{sf}/embeddings.parquet")
                probes = emb.filter(F.col("vec_id") < 8)
                exact_cos = E.cosine_topk(emb, probes, k=3).select(
                    "probe_id", "neighbor_id"
                )
                exact_dot = _dot_topk(emb, probes, k=3)
                out = {}
                for name, truth, approx in (
                    ("ivf", exact_cos, E.ann_ivf_topk(
                        emb, probes, k=3, n_centroids=16, nprobe=4)),
                    ("lsh", exact_cos, E.ann_lsh_topk(emb, probes, k=3)),
                    ("lsh_mp", exact_cos, E.ann_lsh_topk(
                        emb, probes, k=3, hamming_probes=1)),
                    ("lsh_mp2", exact_cos, E.ann_lsh_topk(
                        emb, probes, k=3, hamming_probes=2)),
                    ("sq8", exact_dot, E.sq8_topk(emb, probes, k=3)),
                ):
                    j = truth.join(
                        approx.select(
                            "probe_id", "neighbor_id", F.lit(1).alias("hit")
                        ),
                        ["probe_id", "neighbor_id"],
                        "left",
                    )
                    r = j.agg(
                        F.count("*").alias("n"), F.count("hit").alias("h")
                    ).first()
                    out[name] = round(10000 * r["h"] / r["n"])
                return out

            results["recall_bp"] = {"r1": recall_at(SF_DIR), "rk": recall_at(big)}
            print(f"# recall_bp: {results['recall_bp']}", file=sys.stderr)

        print(json.dumps({
            "metric": "soak_linearity",
            "mult": k,
            "sf": float(os.path.basename(SF_DIR.rstrip("/"))[2:]),
            "queries": results,
        }))
    finally:
        shutil.rmtree(big, ignore_errors=True)
        shutil.rmtree(wh, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
