"""Cardinality / churn analysis — the full `tsdb analyze` report
(cmd/tsdb/main.go:464-616) as two declarative aggregations.

The reference walks all postings single-threaded accumulating per-label
maps; here the series dim explodes to (name, value, series_id) rows and
every statistic is a map-side-combinable groupBy — the 100 TB version is
the same plan with more executors.

Churn definition (main.go:512-543): for each series, `uncovered` = block
time range − the series' own covered span; a label (pair)'s churn is
sum(uncovered over series carrying it) / range — i.e. "how many series
bearing this label exist for only a fraction of the block".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def analyze_labels(series: DataFrame, samples: DataFrame) -> DataFrame:
    """Per label name: value cardinality, cumulative distinct-value
    length, series count, and churn (main.go:538-543 labelsUncovered +
    :553-601 cardinality/length reports).

    Returns (name, n_values, cum_value_len, n_series, churn) sorted by
    name.
    """
    cover = samples.groupBy("series_id").agg(
        (F.max("t") - F.min("t")).alias("cover")
    )
    rng = samples.agg((F.max("t") - F.min("t")).alias("rng"))
    expl = series.select(
        F.explode("labels").alias("name", "value"), F.col("series_id")
    )
    dv = expl.select("name", "value").distinct()
    va = dv.groupBy("name").agg(
        F.count("*").alias("n_values"),
        F.sum(F.length("value")).alias("cum_value_len"),
    )
    sa = (
        expl.join(cover, "series_id")
        .crossJoin(F.broadcast(rng))
        .groupBy("name")
        .agg(
            F.count("*").alias("n_series"),
            F.floor(
                F.sum(F.col("rng") - F.col("cover")) / F.first("rng")
            ).cast("long").alias("churn"),
        )
    )
    return (
        va.join(sa, "name")
        .select("name", "n_values", "cum_value_len", "n_series", "churn")
        .orderBy("name")
    )


def analyze_metrics(samples: DataFrame) -> DataFrame:
    """Per metric name: series count ("Highest cardinality metric
    names", main.go:588-615) and sample count. samples must carry the
    labels map (the events mapping / Querier.select output both do).

    Returns (metric, n_series, n_samples) sorted by metric.
    """
    return (
        samples.select(
            F.col("labels").getItem("__name__").alias("metric"),
            "labels_str",
        )
        .groupBy("metric")
        .agg(
            F.countDistinct("labels_str").alias("n_series"),
            F.count("*").alias("n_samples"),
        )
        .orderBy("metric")
    )
