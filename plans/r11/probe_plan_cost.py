#!/usr/bin/env python
"""Measure per-query fixed planning cost vs execution for the promql
bench entries (VERDICT r10 item 8): time (a) DataFrame construction
(parse + logical plan build), (b) queryExecution.executedPlan (analysis
+ optimization + physical planning), (c) the drain action, and report
the size of the optimized plan text as a proxy for Catalyst work.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402

from tsdb_spark import get_spark  # noqa: E402
from tsdb_spark.queries import QUERIES  # noqa: E402

NAMES = sys.argv[1:] or [
    "promql_rate_grid",
    "promql_sum_by_rate",
    "promql_topk_ratio",
    "promql_subquery",
    "promql_cmp_unless",
    "promql_deriv_predict",
    "promql_stat_windows",
    "promql_changes_resets",
    "tsdb_instant_vector",
]

spark = get_spark("plan-probe")
spark.sparkContext.setLogLevel("ERROR")

# warm the session (JIT, first-job overhead) once, untimed
spark.range(1000).agg(F.sum("id")).collect()

print(f"{'entry':28s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'plantxt':>9s}")
for name in NAMES:
    q = QUERIES[name]
    for rep in range(3):
        t0 = time.time()
        df = q.spark_fn(spark, SF_DIR)
        t1 = time.time()
        # force analysis+optimization+physical planning without running
        plan_txt = df._jdf.queryExecution().executedPlan().toString()
        t2 = time.time()
        df.agg(F.count("*")).collect()
        t3 = time.time()
        if rep == 2:  # report the warm repetition
            print(
                f"{name:28s} {t1-t0:7.3f} {t2-t1:7.3f} {t3-t2:7.3f} "
                f"{len(plan_txt):9d}"
            )
spark.stop()
