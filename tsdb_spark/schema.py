"""Schemas and layout constants (SURVEY.md §1).

The reference's data model (db.go:14: "time series storage for float64
sample data"; head.go:1582-1593 sample{t int64, v float64}) maps to two
DataFrames plus a small tombstones side table:

- ``samples(series_id long, t long, v double, ingest_seq long)``
  partitioned by ``t_bucket`` (= floor(t/width)*width, db.go:1198-1200),
  clustered (series_id, t) within files — the Parquet analog of
  chunk-per-series locality (chunkenc/xor.go).
- ``series(series_id long, labels map<string,string>, labels_str string)``
  — the label index; postings (index/postings.go:38-42) are a filter or
  semi-join over this table (or its exploded view).
- ``tombstones(series_id long, mint long, maxt long)`` — closed intervals,
  tombstones.go:237-257.
"""

from __future__ import annotations

from pyspark.sql import types as T

# block geometry (db.go:48-55): 2h base width in ms
DEFAULT_BLOCK_WIDTH_MS = 2 * 60 * 60 * 1000
# ExponentialBlockRanges(2h, steps=3, stepSize=5) → 2h, 10h, 50h (db.go:51, compact.go:41-50)
DEFAULT_BLOCK_RANGES_MS = [
    DEFAULT_BLOCK_WIDTH_MS,
    DEFAULT_BLOCK_WIDTH_MS * 5,
    DEFAULT_BLOCK_WIDTH_MS * 25,
]

SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.LongType(), False),
        T.StructField("t", T.LongType(), False),
        T.StructField("v", T.DoubleType(), False),
        # total order of sources for vertical-dedup precedence: the
        # reference relies on argument order "b wins" (querier.go:1039-1043,
        # chunks/chunks.go:242-244); we make it an explicit column.
        T.StructField("ingest_seq", T.LongType(), False),
    ]
)

# the shape ingest sources (batch appends, streaming file sources)
# deliver: raw label sets before series-id assignment
INGEST_SCHEMA = T.StructType(
    [
        T.StructField("labels", T.MapType(T.StringType(), T.StringType(), False), False),
        T.StructField("t", T.LongType(), False),
        T.StructField("v", T.DoubleType(), False),
    ]
)

SERIES_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.LongType(), False),
        T.StructField("labels", T.MapType(T.StringType(), T.StringType(), False), False),
        T.StructField("labels_str", T.StringType(), False),
    ]
)

TOMBSTONES_SCHEMA = T.StructType(
    [
        T.StructField("series_id", T.LongType(), False),
        T.StructField("mint", T.LongType(), False),  # closed interval, tombstones.go:242
        T.StructField("maxt", T.LongType(), False),
    ]
)


def bucket_of(t_ms: int, width_ms: int = DEFAULT_BLOCK_WIDTH_MS) -> int:
    """Bucket lower bound for a timestamp; blocks are half-open [lo, lo+width)
    (rangeForTimestamp db.go:1198-1200 returns the *upper* bound; we key
    partitions by the lower bound, same alignment)."""
    return (t_ms // width_ms) * width_ms
