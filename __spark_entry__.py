"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query smoke check at sf0.001.
queries()      — one (spark, sf_dir) -> DataFrame per implemented
                 operator from SURVEY.md §2 (registry: tsdb_spark/queries.py).
oracle_sql()   — matching DuckDB SQL; omitted keys get rows-only checks.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tsdb_spark.session import configure  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full read lifecycle (matcher select over the events
    time-series mapping) at sf0.001."""
    configure(spark)
    from tsdb_spark.queries import QUERIES

    return QUERIES["tsdb_select_regex_set"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from tsdb_spark.queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(q.spark_fn) for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from tsdb_spark.queries import QUERIES

    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
