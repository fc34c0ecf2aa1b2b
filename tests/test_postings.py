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
