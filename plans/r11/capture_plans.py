#!/usr/bin/env python
"""Capture .explain('formatted') for registry entries into
plans/r11/<name>_<suffix>.txt (driver-contract deliverable: the judge
checks plan claims against these files).

Usage: python plans/r11/capture_plans.py before|after name [name...]
       (no names -> the standard bench-entry set)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) + "/../..")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.dirname(os.path.abspath(__file__))

DEFAULT = [
    "promql_rate_grid",
    "promql_sum_by_rate",
    "promql_topk_ratio",
    "promql_subquery",
    "promql_cmp_unless",
    "promql_deriv_predict",
    "tsdb_instant_vector",
    "tsdb_lookback_buffer",
    "docs_dedup_minhash",
    "emb_semdedup",
    "emb_ann_lsh",
    "docs_cross_dedup",
    "docs_cross_dedup_indexed",
    "emb_pq_codes",
    "tsdb_histogram_quantile",
    "tsdb_holt_winters",
    "docs_sample_stratified",
    "docs_keywords",
    "docs_decontaminate",
    "docs_chunk_windows",
    "docs_repetition",
]


def main():
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from tsdb_spark import get_spark
    from tsdb_spark.queries import QUERIES
    import tsdb_spark.pipeline.queries  # noqa: F401
    import tsdb_spark.promql_queries  # noqa: F401

    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name].spark_fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"{OUT}/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {n_ex} Exchange -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
