"""Sorted-merge & vertical-dedup operators.

The reference merges per-block series streams lazily
(mergedSeriesSet querier.go:536-601); when blocks overlap in time the
vertical variant dedups per (series, t) with "the later input wins"
(querier.go:603-667, tie rule querier.go:1039-1043; chunk-level analog
MergeOverlappingChunks chunks/chunks.go:208-285 "the sample in a is
discarded").

Spark-first: a union of partition scans IS the merge (the shuffle/sort
machinery replaces the hand-built binary tree, querier.go:118-136); the
precedence rule becomes an explicit ``ingest_seq`` column + ``max_by``.
``max_by`` keeps the aggregation map-side combinable (partial aggregation
before the shuffle) — a window/row_number formulation would force a full
sort per partition instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chain_blocks(*blocks: DataFrame) -> DataFrame:
    """Time-concatenate non-overlapping block frames (chainedSeriesIterator
    querier.go:907-962). Ordering is deferred to the consumer: Spark plans
    are set-oriented; callers sort by (labels_str, t) at the edge."""
    out = blocks[0]
    for b in blocks[1:]:
        out = out.unionByName(b)
    return out


def dedup_vertical(
    samples: DataFrame,
    precedence_col: str = "ingest_seq",
    value_col: str = "v",
    key_cols: tuple[str, ...] = ("series_id", "t"),
) -> DataFrame:
    """Resolve duplicate (series, t) across overlapping sources: highest
    precedence (latest ingest) wins — verticalMergeSeriesIterator's
    "b wins" (querier.go:1039-1043) made explicit and order-independent.

    NaN note: v may be NaN and NaN is a legitimate value (db_test.go:366);
    max_by selects by the precedence column only, so NaN values survive.
    """
    other = [c for c in samples.columns if c not in (*key_cols, value_col, precedence_col)]
    aggs = [
        F.max_by(F.col(value_col), F.col(precedence_col)).alias(value_col),
        F.max(F.col(precedence_col)).alias(precedence_col),
    ]
    # carry any extra columns with the same winner-takes-all rule
    aggs += [F.max_by(F.col(c), F.col(precedence_col)).alias(c) for c in other]
    return samples.groupBy(*key_cols).agg(*aggs)
