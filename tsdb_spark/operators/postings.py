"""Materialized inverted-index (postings) path.

The reference's index maps (label name, value) → sorted series IDs
(MemPostings index/postings.go:38-42; on-disk index/index.go:506-557) and
plans matchers as intersect/subtract set algebra over those lists
(PostingsForMatchers querier.go:326-396, Intersect/Merge/Without
index/postings.go:297-589).

For the default path we filter the ``series`` dim directly (labels map →
boolean Column, labels.py) — at up to ~1e8 series that dim is small
relative to 100TB of samples and the filter broadcast-joins. The postings
table below is the scale escape hatch for ultra-high-cardinality
matcher workloads (head_bench_test.go:52-120 shape): an exploded
``(name, value, series_id)`` Parquet table, bucketable by (name, value),
on which equality matchers become partition-prunable scans and the set
algebra becomes semi/anti joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tsdb_spark.labels import Matcher, find_set_matches


def build_postings(series: DataFrame) -> DataFrame:
    """Explode the series dim into the postings relation
    (name, value, series_id) — MemPostings.Add analog
    (index/postings.go:82-101)."""
    return series.select(
        F.explode("labels").alias("name", "value"), F.col("series_id")
    ).select("name", "value", "series_id")


def _postings_ids(postings: DataFrame, m: Matcher, invert: bool = False) -> DataFrame:
    """Series IDs whose *present* label `m.name` (does not / does) match.

    The value-condition mirrors postingsForMatcher (querier.go:398-445):
    equality → direct lookup; set-regex → IN list; general regex → scan
    values. `invert` gives inversePostingsForMatcher (querier.go:447-477).
    """
    vals = postings.filter(F.col("name") == F.lit(m.name))
    v = F.col("value")
    if m.type in ("=", "!="):
        cond = v == F.lit(m.value)
    else:
        lits = find_set_matches(m.value)
        if lits is not None:
            cond = v.isin(*lits) if len(lits) > 1 else (v == F.lit(lits[0]))
        else:
            cond = v.rlike(f"^(?:{m.value})$")
    if m.type in ("!=", "!~"):
        cond = ~cond
    if invert:
        cond = ~cond
    # no distinct: the postings relation is exploded from a MAP, so one
    # series contributes exactly one row per label name — within a single
    # name the series_ids are unique by construction (MemPostings has the
    # same invariant: one ref per (name,value) list, index/postings.go:82)
    return vals.filter(cond).select("series_id")


def postings_for_matchers(
    postings: DataFrame, all_series: DataFrame, matchers: list[Matcher]
) -> DataFrame:
    """PostingsForMatchers (querier.go:326-396) as DataFrame set algebra.

    Classification by Matches(""):
    - matcher rejects missing labels → its postings *intersect*
      (the Intersect/leapfrog analog index/postings.go:297-368);
    - matcher accepts missing labels (l="", l!="x", l=~".*") → series that
      fail it are exactly those *with* the label matching the inverse →
      *subtract* (the Without analog index/postings.go:505-589).
    - no positive matcher → start from all postings (querier.go:365-373).

    Plan shape (r10): the intersect/subtract chain is ONE map-side-
    combinable aggregate over the unioned per-matcher posting lists,
    not a k-deep semi/anti join ladder. Each matcher contributes at
    most one row per series (the postings relation is exploded from a
    MAP — one row per (series, name)), so membership is exact counting:
    a series survives iff it appears in every positive list
    (sum(flag) = #positives) and in no subtract list (no flag-0 row).
    One shuffle on series_id replaces k−1 sort-merge joins — fewer
    stages, no per-join sorts, and no join-side skew at 1e8-series
    cardinalities; the k filtered scans of the postings relation fuse
    into one union stage.

    Returns a 1-column (series_id) DataFrame.
    """
    pos: list[DataFrame] = []
    subtract: list[DataFrame] = []
    for m in matchers:
        if m.matches_empty():
            subtract.append(_postings_ids(postings, m, invert=True))
        else:
            pos.append(_postings_ids(postings, m))
    if not pos:
        ids = all_series.select("series_id")
        for s in subtract:
            ids = ids.join(s, "series_id", "left_anti")
        return ids
    if len(pos) == 1 and not subtract:
        return pos[0]
    parts = [p.select("series_id", F.lit(1).alias("_p")) for p in pos]
    parts += [s.select("series_id", F.lit(0).alias("_p")) for s in subtract]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    agg = u.groupBy("series_id").agg(
        F.sum("_p").alias("_np"), F.count(F.lit(1)).alias("_n")
    )
    return agg.filter(
        (F.col("_np") == len(pos)) & (F.col("_n") == F.col("_np"))
    ).select("series_id")
