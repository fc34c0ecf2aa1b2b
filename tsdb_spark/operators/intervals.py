"""Closed-interval algebra for tombstones.

Reference: tombstones.go:237-304 — ``Interval{Mint, Maxt}`` closed ranges,
``Intervals.add`` folds overlapping/adjacent intervals into a canonical
sorted non-overlapping set; deletedIterator (querier.go:1166-1204) skips
samples inside them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coalesce_intervals(
    intervals: DataFrame,
    key_cols: tuple[str, ...] = ("series_id",),
    mint_col: str = "mint",
    maxt_col: str = "maxt",
) -> DataFrame:
    """Fold overlapping/adjacent closed intervals per key into a canonical
    non-overlapping set (Intervals.add tombstones.go:259-304; adjacency
    ``t.Maxt+1 == mint`` merges, tombstones.go:274,289).

    Gaps-and-islands: an interval starts a new island iff its mint exceeds
    the running max of previous maxt by more than 1. Tombstone sets are
    tiny next to samples, but the formulation is fully distributed (window
    partitioned by series) so it also serves generic interval data.
    """
    w = Window.partitionBy(*key_cols).orderBy(mint_col, maxt_col)
    prev_max = F.max(F.col(maxt_col)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    new_island = F.when(prev_max.isNull() | (F.col(mint_col) > prev_max + 1), 1).otherwise(0)
    island = F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        intervals.withColumn("_island", island)
        .groupBy(*key_cols, "_island")
        .agg(F.min(mint_col).alias(mint_col), F.max(maxt_col).alias(maxt_col))
        .drop("_island")
    )


def subtract_intervals(
    samples: DataFrame,
    tombstones: DataFrame,
    t_col: str = "t",
    broadcast_tombstones: bool = True,
) -> DataFrame:
    """Drop samples falling inside any tombstoned closed interval of their
    series — deletedIterator (querier.go:1166-1204) + the chunk-level
    pre-drop (querier.go:739-749, subsumed here) as one anti-join.

    Tombstones are small (per-series delete requests) ⇒ broadcast the
    build side so the 100TB samples scan never shuffles.
    """
    ts = tombstones.select("series_id", "mint", "maxt")
    if broadcast_tombstones:
        ts = F.broadcast(ts)
    cond = (
        (samples["series_id"] == ts["series_id"])
        & (F.col(t_col) >= ts["mint"])
        & (F.col(t_col) <= ts["maxt"])
    )
    return samples.join(ts, cond, "left_anti")


def total_intervals(tombstones: DataFrame) -> int:
    """TombstoneReader.Total (tombstones.go:213-222)."""
    return tombstones.count()
