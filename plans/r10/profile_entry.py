#!/usr/bin/env python
"""Per-stage profiler for bench entries (guide §1/§7: measure first).

Runs a named piece of work with the Spark UI's REST API enabled and
prints every stage of every job it launched: stage name, wall time,
task time, shuffle read/write bytes, input bytes, records. Usage:

    python plans/r10/profile_entry.py <entry> [<entry>...]

Entries mirror bench.py's timed bodies (same frames, noop-drained).
Not part of the graded surface — a measurement aid only.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/../..")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark_with_ui():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    from tsdb_spark.session import RUNTIME_CONFS

    b = (
        SparkSession.builder.master("local[32]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4055")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in RUNTIME_CONFS.items():
        b = b.config(k, v)
    return b.getOrCreate()


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4055/api/v1/{path}") as r:
        return json.load(r)


def dump_stages(label: str, t0: float, t1: float):
    app = rest("applications")[0]["id"]
    stages = rest(f"applications/{app}/stages?status=complete")
    rows = []
    for s in stages:
        sub = s.get("submissionTime", "")
        # REST times are GMT strings; filter by stage id monotonicity instead
        rows.append(
            (
                s["stageId"],
                s["name"].split("\n")[0][:70],
                s.get("executorRunTime", 0) / 1000.0,
                s.get("inputBytes", 0) >> 20,
                s.get("shuffleReadBytes", 0) >> 20,
                s.get("shuffleWriteBytes", 0) >> 20,
                s.get("numTasks", 0),
                sub,
            )
        )
    rows.sort()
    print(f"\n== {label}: wall {t1 - t0:.2f}s ==")
    print(
        f"{'stage':>5} {'taskTime_s':>10} {'in_MB':>6} {'shR_MB':>6} "
        f"{'shW_MB':>6} {'tasks':>5}  name"
    )
    for sid, name, rt, inp, sr, sw, nt, sub in rows:
        print(f"{sid:>5} {rt:>10.2f} {inp:>6} {sr:>6} {sw:>6} {nt:>5}  {name}")


def main():
    from pyspark.sql import functions as F

    from tsdb_spark import DB, eq, get_spark, neq, re_match  # noqa: F401
    from tsdb_spark.queries import DAY, T0, T_MID, QUERIES
    import tsdb_spark.pipeline.queries as PQ  # noqa: F401
    import tsdb_spark.promql_queries  # noqa: F401
    from tsdb_spark.sources.events import events_samples

    spark = get_spark_with_ui()
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def drain(df):
        df.write.format("noop").mode("overwrite").save()

    def q(name):
        return QUERIES[name].spark_fn(spark, SF_DIR)

    targets = sys.argv[1:]
    marker = [0]

    def run(label, fn):
        if targets and not any(label.startswith(t) for t in targets):
            return
        sc.setJobDescription(label)
        t0 = time.time()
        fn()
        t1 = time.time()
        sc.setJobDescription(None)
        dump_stages(label, t0, t1)

    # individual registry entries by name: profile:<entry>
    for t in targets:
        if t in QUERIES:
            run(t, lambda t=t: drain(q(t)))

    spark.stop()


if __name__ == "__main__":
    main()
