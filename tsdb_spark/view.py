"""Logical (storage-free) query pipelines.

The same operator composition as db.Querier.select (SURVEY.md §3.1) but
over any in-memory samples frame carrying its labels — used by the
driver-facing query registry where the source is the raw events table
rather than a materialized warehouse. Semantics are identical; the DB
path adds partition pruning + broadcast series dim on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsdb_spark import labels as L


def select_samples(
    samples: DataFrame,
    matchers: list[L.Matcher],
    mint: int,
    maxt: int,
) -> DataFrame:
    """Matcher + closed-time-range selection over a samples frame that
    carries a `labels` map column (blockQuerier.Select analog,
    querier.go:214-230 + clamp querier.go:1101-1160)."""
    return samples.filter(
        L.compile_matchers(matchers)
        & (F.col("t") >= F.lit(mint))
        & (F.col("t") <= F.lit(maxt))
    )
