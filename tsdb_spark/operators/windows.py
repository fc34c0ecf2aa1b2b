"""Ordered per-series iteration operators.

The reference exposes per-series sample iterators (SeriesIterator
querier.go:879-891) with:

- Seek(t): advance to the first sample with t' >= t (querier.go:880-884)
- BufferedSeriesIterator + sampleRing: a trailing lookback window of width
  delta behind the cursor, with PeekBack() = previous sample
  (tsdbutil/buffer.go:34-111, ring buffer :126-236). This is the
  range-vector / staleness-lookback primitive PromQL builds on.

Spark-first: these are window functions over (series_id) ordered by t —
rangeBetween(-delta, 0) IS the sample ring; lag() IS PeekBack. No state,
no UDFs; the per-series sort is one shuffle reused by all the frames.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def series_window(delta_ms: int | None = None):
    """Window spec for per-series ordered iteration; with delta_ms, the
    trailing closed range [t - delta, t] (buffer semantics,
    tsdbutil/buffer.go:95-111)."""
    w = Window.partitionBy("series_id").orderBy("t")
    if delta_ms is not None:
        return w.rangeBetween(-delta_ms, 0)
    return w


def with_lookback(
    samples: DataFrame,
    delta_ms: int,
    aggs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """Attach trailing-window aggregates + PeekBack to each sample.

    Default aggregates mirror what consumers of Buffer() compute over the
    trailing range (count/sum/min/max of the ring) plus prev_t/prev_v =
    PeekBack (tsdbutil/buffer.go:77-87).
    """
    ring = series_window(delta_ms)
    seq = series_window()
    if aggs is None:
        aggs = {
            "buf_count": F.count("v").over(ring),
            "buf_sum": F.sum("v").over(ring),
            "buf_min": F.min("v").over(ring),
            "buf_max": F.max("v").over(ring),
        }
    out = samples
    for name, col in aggs.items():
        out = out.withColumn(name, col)
    out = out.withColumn("prev_t", F.lag("t").over(seq)).withColumn(
        "prev_v", F.lag("v").over(seq)
    )
    return out


def seek_first_at_or_after(samples: DataFrame, t_ms: int) -> DataFrame:
    """Per series, the first sample with t >= t_ms — Seek semantics
    (querier.go:880-884, impl querier.go:1101-1126). Returns
    (series_id, t, v); series with no such sample are absent (iterator
    exhausted).

    min_by keeps this a map-side-combinable aggregation (one shuffle, no
    per-series full sort)."""
    return (
        samples.filter(F.col("t") >= F.lit(t_ms))
        .groupBy("series_id")
        .agg(F.min("t").alias("t"), F.min_by("v", "t").alias("v"))
    )
