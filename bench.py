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

        # compaction rewrite (compact_test.go:788 BenchmarkCompaction)
        with timed("compact"):
            db.compact(24 * 3600 * 1000)

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
