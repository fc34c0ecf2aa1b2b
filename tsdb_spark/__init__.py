"""tsdb_spark — a PySpark-native time-series analytics engine.

A brand-new engine with the query and data-processing capabilities of
prometheus/tsdb (the storage engine of Prometheus 2.x), re-expressed on
the public PySpark DataFrame/SQL API:

- data model: ``samples(series_id, t, v)`` + ``series(series_id, labels)``
  over time-bucket-partitioned Parquet (SURVEY.md §1)
- label matchers with Prometheus missing-label==""-semantics compiled to
  native Column expressions (reference: querier.go:326-489,
  labels/selector.go)
- sorted-merge / vertical-dedup / tombstone semantics as declarative
  DataFrame plans optimized by Catalyst (reference: querier.go:536-1204)
- batch + streaming ingest, leveled compaction, time/size retention,
  snapshots, checkpoints, read-only opens, and federated multi-store
  reads (reference: head.go, compact.go, db.go, checkpoint.go)

plus large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) on the same engine.
"""

from tsdb_spark.labels import (
    Matcher,
    parse_selector,
    eq,
    neq,
    re_match,
    re_not_match,
    compile_matchers,
    labels_str_expr,
    series_id_expr,
)
from tsdb_spark.db import DB
from tsdb_spark.session import get_spark, configure

__all__ = [
    "DB",
    "Matcher",
    "parse_selector",
    "eq",
    "neq",
    "re_match",
    "re_not_match",
    "compile_matchers",
    "labels_str_expr",
    "series_id_expr",
    "get_spark",
    "configure",
]

__version__ = "0.1.0"
