#!/usr/bin/env python
"""Headline benchmark: query shapes mirroring BASELINE.md harness configs
(full-scan iterate, seek, matcher matrix, set-regex, sorted merge /
vertical dedup, compaction rewrite, macro write) on the engine warehouse,
plus pipeline extensions where implemented.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    return float(base[2:]) if base.startswith("sf") else -1.0


def main() -> None:
    from pyspark.sql import functions as F

    from tsdb_spark import DB, eq, get_spark, neq, re_match
    from tsdb_spark.queries import DAY, T0, T_MID
    from tsdb_spark.sources.events import events_samples

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.time()

            def __exit__(self, *a):
                timings[name] = round(time.time() - self.t0, 3)

        return _T()

    wh = tempfile.mkdtemp(prefix="tsdb_bench_")
    try:
        # macro write path (cmd/tsdb bench write analog, cmd/tsdb/main.go:143-327)
        with timed("ingest"):
            db = DB.create(spark, f"{wh}/db", block_width_ms=6 * 3600 * 1000)
            db.append(events_samples(spark, SF_DIR).select("labels", "t", "v"), report=False)

        def drain(df):
            df.agg(F.count("*"), F.sum("v")).collect()

        # full-scan iterate (querier_test.go:1481 BenchmarkQueryIterator)
        with timed("fullscan"):
            drain(db.querier(T0, T0 + 31 * DAY).select([re_match("__name__", ".*")], with_labels=False))

        # seek-heavy (querier_test.go:1555)
        with timed("seek"):
            from tsdb_spark.operators.windows import seek_first_at_or_after

            drain(seek_first_at_or_after(db.samples(), T_MID).select(F.col("t").alias("t"), "v", "series_id"))

        # matcher matrix (querier_test.go:2110 BenchmarkQueries shapes)
        with timed("matchers"):
            q = db.querier(T0, T0 + 31 * DAY)
            for ms in (
                [eq("__name__", "click")],
                [eq("__name__", "click"), eq("k_bucket", "high")],
                [eq("__name__", "click"), eq("k_bucket", "high"), neq("user", "3")],
                [re_match("__name__", "c.*k")],
                [re_match("__name__", "c.*k"), re_match("user", "1.*")],
            ):
                drain(q.select(ms, with_labels=False))

        # set-regex (querier_test.go:1645 BenchmarkSetMatcher)
        with timed("setregex"):
            drain(
                db.querier(T0, T0 + 31 * DAY).select(
                    [re_match("user", "|".join(str(i) for i in range(1, 11)))],
                    with_labels=False,
                )
            )

        # trailing-window iterate (tsdbutil/buffer.go shape)
        with timed("lookback"):
            from tsdb_spark.queries import QUERIES

            QUERIES["tsdb_lookback_buffer"].spark_fn(spark, SF_DIR).agg(
                F.count("*"), F.sum("buf_sum")
            ).collect()

        # high-cardinality matcher algebra over the materialized postings
        # relation (head_bench_test.go:52-120 BenchmarkHeadPostingForMatchers:
        # 1e6 synthetic series, the matcher matrix it exercises)
        # setup OUTSIDE the timer, exactly like the reference benchmark
        # (head_bench_test.go builds the 1e6-series head, then
        # b.ResetTimer() before the matcher loop) — the timed section is
        # the matcher algebra only
        from tsdb_spark.operators.postings import build_postings, postings_for_matchers

        ser = spark.range(1_000_000).select(
            F.col("id").alias("series_id"),
            F.create_map(
                F.lit("n"), (F.col("id") % 10).cast("string"),
                F.lit("i"), F.col("id").cast("string"),
                F.lit("j"),
                F.when(F.col("id") % 2 == 0, F.lit("foo")).otherwise(F.lit("bar")),
            ).alias("labels"),
        )
        post = build_postings(ser).persist()
        post.count()  # materialize the index before the clock starts
        try:
            with timed("postings"):
                for ms in (
                    [eq("n", "1")],
                    [eq("n", "1"), eq("j", "foo")],
                    [eq("n", "1"), neq("j", "foo")],
                    [re_match("n", "1|3|5"), eq("j", "foo")],
                ):
                    postings_for_matchers(post, ser, ms).agg(F.count("*")).collect()
        finally:
            post.unpersist()

        # MinHash-LSH near-dup over documents (pipeline headline)
        with timed("minhash"):
            import tsdb_spark.pipeline.queries  # noqa: F401 — registers pipeline entries
            from tsdb_spark.queries import QUERIES

            QUERIES["docs_dedup_minhash"].spark_fn(spark, SF_DIR).agg(
                F.count("*")
            ).collect()

        # near-dup clustering: MinHash pair graph → connected components
        # (iterative pointer-jumping rounds; includes its own signature
        # pass — the full dedup-pipeline cost end to end)
        with timed("dedup_clusters"):
            QUERIES["docs_dedup_clusters"].spark_fn(spark, SF_DIR).agg(
                F.count("*")
            ).collect()

        # text-quality signals over the full corpus (map + doc-local keys)
        with timed("repetition"):
            QUERIES["docs_repetition"].spark_fn(spark, SF_DIR).agg(
                F.count("*")
            ).collect()

        # ANN probe path (LSH sign-bit buckets)
        with timed("ann"):
            QUERIES["emb_ann_lsh"].spark_fn(spark, SF_DIR).agg(
                F.count("*")
            ).collect()

        # corpus-selection pass: stratified sample + keyword extraction +
        # decontamination (map-only / bounded-shuffle pipeline ops)
        with timed("selection"):
            for qname in (
                "docs_sample_stratified",
                "docs_keywords",
                "docs_decontaminate",
            ):
                QUERIES[qname].spark_fn(spark, SF_DIR).agg(F.count("*")).collect()

        # training-sequence chunking (map-only fan-out over the corpus)
        with timed("chunking"):
            QUERIES["docs_chunk_windows"].spark_fn(spark, SF_DIR).agg(
                F.count("*")
            ).collect()

        # PQ encoding (broadcast codebook, two combinable aggregates)
        with timed("pq"):
            QUERIES["emb_pq_codes"].spark_fn(spark, SF_DIR).agg(
                F.count("*")
            ).collect()

        # aggregate-state query functions (histogram buckets + ordered fold)
        with timed("queryfns"):
            for qname in ("tsdb_histogram_quantile", "tsdb_holt_winters"):
                QUERIES[qname].spark_fn(spark, SF_DIR).agg(F.count("*")).collect()

        # PromQL range-query evaluator: parse → bounded grid fan-out →
        # combinable window aggregates (rate extrapolation, label agg,
        # topk-over-ratio composition)
        with timed("promql"):
            for qname in (
                "promql_rate_grid",
                "promql_sum_by_rate",
                "promql_topk_ratio",
            ):
                QUERIES[qname].spark_fn(spark, SF_DIR).agg(F.count("*")).collect()

        # PromQL composition surface: subquery plan composition,
        # comparison+set algebra, regression windows
        with timed("promql_compose"):
            for qname in (
                "promql_subquery",
                "promql_cmp_unless",
                "promql_deriv_predict",
            ):
                QUERIES[qname].spark_fn(spark, SF_DIR).agg(F.count("*")).collect()

        # instant-vector grid evaluation via the distributed as-of join
        # (union + one ordered window per series)
        with timed("asof"):
            QUERIES["tsdb_instant_vector"].spark_fn(spark, SF_DIR).agg(
                F.count("*")
            ).collect()

        # semantic dedup: k-means clusters bound the pairwise cosine work
        with timed("semdedup"):
            QUERIES["emb_semdedup"].spark_fn(spark, SF_DIR).agg(
                F.count("*")
            ).collect()

        # incremental ingest dedup: new batch banded against the corpus
        with timed("cross_dedup"):
            QUERIES["docs_cross_dedup"].spark_fn(spark, SF_DIR).agg(
                F.count("*")
            ).collect()

        # compaction rewrite (compact_test.go:788 BenchmarkCompaction)
        # — runs on the pristine store so the number stays comparable
        # across rounds
        with timed("compact"):
            db.compact(24 * 3600 * 1000)

        # incremental (planned) compaction: dirty one day of buckets,
        # one planning round rewrites exactly those — the 100TB
        # maintenance path (a full rewrite would touch the whole store)
        with timed("lvl_compact"):
            db.append(
                events_samples(spark, SF_DIR)
                .select("labels", "t", "v")
                .filter(F.col("t") < T0 + 1 * DAY)
            )
            db.auto_compact(max_rounds=1)

        total = round(sum(timings.values()), 3)
        print(
            json.dumps(
                {
                    "metric": "bench_total",
                    "value": total,
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf_of(SF_DIR),
                }
            )
        )
    finally:
        shutil.rmtree(wh, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sys.stdout.flush()
    main()
