"""operators/postings: the materialized inverted-index matcher path must
agree with the default compiled-Column path (labels.compile_matchers) on
every matcher class — same contract the reference holds between
PostingsForMatchers and a full scan (querier_test.go:1830-2083)."""

import pytest
from pyspark.sql import functions as F

from tsdb_spark import labels as L
from tsdb_spark.operators.postings import build_postings, postings_for_matchers
from tsdb_spark.sources.events import events_series

SF_DIR = "/root/testdata/sf0.001"

MATCHER_SETS = {
    "eq": [L.eq("__name__", "click")],
    "eq+eq": [L.eq("__name__", "click"), L.eq("user", "7")],
    "neq-accepts-missing": [L.neq("k_bucket", "high")],
    "eq-empty-missing": [L.eq("__name__", "purchase"), L.eq("k_bucket", "")],
    "neq-empty-has-label": [L.neq("k_bucket", ""), L.neq("user", "3")],
    "set-regex": [L.re_match("__name__", "click|view"), L.re_match("user", "1|2|3")],
    "general-regex+neg": [
        L.re_match("__name__", "c.*k|s.+p"),
        L.re_not_match("user", "1.*"),
    ],
    "only-negative": [L.neq("user", "3")],
    "neg-regex-only": [L.re_not_match("__name__", ".*r.*")],
}


@pytest.fixture(scope="module")
def series(spark):
    return events_series(spark, SF_DIR).cache()


@pytest.fixture(scope="module")
def postings(series):
    return build_postings(series).cache()


@pytest.mark.parametrize("name", MATCHER_SETS)
def test_postings_path_matches_compiled_path(spark, series, postings, name):
    matchers = MATCHER_SETS[name]
    via_postings = {
        r["series_id"]
        for r in postings_for_matchers(postings, series, matchers).collect()
    }
    via_filter = {
        r["series_id"]
        for r in series.filter(L.compile_matchers(matchers)).select("series_id").collect()
    }
    assert via_postings == via_filter
    if name in ("eq", "eq+eq", "set-regex"):
        assert via_postings, f"{name} selected nothing — fixture too weak"


def test_store_materialized_postings_roundtrip(spark, tmp_path):
    from tsdb_spark.db import DB
    from tsdb_spark import labels as L
    import os

    db = DB.create(spark, str(tmp_path / "pdb"), block_width_ms=1000)
    df = spark.createDataFrame(
        [({"m": "cpu", "h": "a"}, 100, 1.0), ({"m": "cpu", "h": "b"}, 200, 2.0),
         ({"m": "mem", "h": "a"}, 300, 3.0)],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
    )
    db.append(df)
    db.materialize_postings()
    # partitioned by label name on disk
    assert sorted(d for d in os.listdir(db._postings_path) if d.startswith("name=")) == [
        "name=h", "name=m"
    ]
    want = {(100, 1.0), (200, 2.0)}
    got = {
        (r["t"], r["v"])
        for r in db.querier(0, 1000).select([L.eq("m", "cpu")], via_postings=True).collect()
    }
    assert got == want
    # subtract path (accepts-empty matcher) through the index
    got2 = {
        (r["t"], r["v"])
        for r in db.querier(0, 1000)
        .select([L.eq("m", "cpu"), L.neq("h", "b")], via_postings=True)
        .collect()
    }
    assert got2 == {(100, 1.0)}
    # staleness: a new append invalidates the materialized table; the
    # reader must fall back to the dim-derived postings and still see
    # the new series
    db.append(spark.createDataFrame(
        [({"m": "cpu", "h": "c"}, 400, 4.0)],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
    ))
    got3 = {
        (r["t"], r["v"])
        for r in db.querier(0, 1000).select([L.eq("m", "cpu")], via_postings=True).collect()
    }
    assert got3 == want | {(400, 4.0)}
