"""Matcher-dialect parity:

1. the full TestPostingsForMatchers table (querier_test.go:1830-2083)
   evaluated through compile_matchers over the reference's exact
   5-series head — engine parity with the reference's own expectations;
2. RE2-vs-Java agreement pins: the engine evaluates regex matchers with
   Java `rlike` while the reference (and our DuckDB oracles) use RE2.
   Adversarial corner patterns are run through BOTH engines on the same
   values and must agree — this is what keeps every oracle hash
   comparison in selfcheck/CORRECTNESS honest;
3. constructs RE2 rejects (lookaround, backreference, possessive
   quantifiers) are refused by re_match up front (_check_re2_subset) —
   silently giving them Java semantics would diverge from the reference.
"""

import duckdb
import pytest

from pyspark.sql import functions as F

import tsdb_spark.labels as L


# the reference head: app.Add calls at querier_test.go:1838-1843
HEAD = [
    {"n": "1"},
    {"n": "1", "i": "a"},
    {"n": "1", "i": "b"},
    {"n": "2"},
    {"n": "2.5"},
]

# (matchers, expected label sets) — querier_test.go:1846-2052, verbatim
CASES = [
    ([L.eq("n", "1")], [0, 1, 2]),
    ([L.eq("n", "1"), L.eq("i", "a")], [1]),
    ([L.eq("n", "1"), L.eq("i", "missing")], []),
    ([L.eq("missing", "")], [0, 1, 2, 3, 4]),
    ([L.neq("n", "1")], [3, 4]),
    ([L.neq("i", "")], [1, 2]),
    ([L.neq("missing", "")], []),
    ([L.eq("n", "1"), L.neq("i", "a")], [0, 2]),
    ([L.eq("n", "1"), L.neq("i", "")], [1, 2]),
    ([L.re_match("n", "^1$")], [0, 1, 2]),
    ([L.eq("n", "1"), L.re_match("i", "^a$")], [1]),
    ([L.eq("n", "1"), L.re_match("i", "^a?$")], [0, 1]),
    ([L.re_match("i", "^$")], [0, 3, 4]),
    ([L.eq("n", "1"), L.re_match("i", "^$")], [0]),
    ([L.eq("n", "1"), L.re_match("i", "^.*$")], [0, 1, 2]),
    ([L.eq("n", "1"), L.re_match("i", "^.+$")], [1, 2]),
    ([L.re_not_match("n", "^1$")], [3, 4]),
    ([L.eq("n", "1"), L.re_not_match("i", "^a$")], [0, 2]),
    ([L.eq("n", "1"), L.re_not_match("i", "^a?$")], [2]),
    ([L.eq("n", "1"), L.re_not_match("i", "^$")], [1, 2]),
    ([L.eq("n", "1"), L.re_not_match("i", "^.*$")], []),
    ([L.eq("n", "1"), L.re_not_match("i", "^.+$")], [0]),
    ([L.eq("n", "1"), L.neq("i", ""), L.eq("i", "a")], [1]),
    ([L.eq("n", "1"), L.neq("i", "b"), L.re_match("i", "^(b|a).*$")], [1]),
    ([L.re_match("n", "^(?:1|2)$")], [0, 1, 2, 3]),
    ([L.re_match("i", "^(?:a|b)$")], [1, 2]),
    ([L.re_match("n", "^(?:x1|2)$")], [3]),
    ([L.re_match("n", "^(?:2|2\\.5)$")], [3, 4]),
    ([L.re_match("i", "^(?:c||d)$")], [0, 3, 4]),
]


def test_postings_for_matchers_reference_table(spark):  # noqa: F811
    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(HEAD)], "idx INT, labels MAP<STRING,STRING>"
    ).cache()
    for matchers, exp in CASES:
        got = sorted(
            r["idx"] for r in df.filter(L.compile_matchers(matchers)).collect()
        )
        assert got == sorted(exp), f"matchers={matchers}"
    df.unpersist()


# corner patterns where the dialects COULD plausibly differ: empty
# alternation branches, optional-empty, dot-vs-newline, char-class
# corners, escaped metachars, nested non-capturing groups, bounded
# repetition, inline case-insensitivity
PATTERNS = [
    "a?",
    "",
    ".*",
    ".+",
    "c||d",
    "(b|a).*",
    "2|2\\.5",
    "[a-c]+",
    "[^a-c]+",
    "a{0,2}",
    "(?:a|)(?:b|)",
    "\\.",
    "\\d+\\.\\d+",
    "(?i)ab",
    "a.c",
    "[.]",
    "x|",
]

VALUES = ["", "a", "b", "ab", "aa", "abc", "a\nb", "2.5", "25", "AB", "a.c", ".", "-"]


def test_re2_java_agreement_on_corners(spark):  # noqa: F811
    df = spark.createDataFrame([(v,) for v in VALUES], "v STRING").cache()
    con = duckdb.connect()
    for pat in PATTERNS:
        anchored = f"^(?:{pat})$"
        java = {
            r["v"]
            for r in df.filter(F.col("v").rlike(anchored)).collect()
        }
        re2 = {
            v
            for v in VALUES
            if con.execute(
                "SELECT regexp_matches(?, ?)", [v, anchored]
            ).fetchone()[0]
        }
        assert java == re2, f"dialect divergence on {pat!r}: java={java} re2={re2}"
    df.unpersist()


@pytest.mark.parametrize(
    "pattern",
    ["(a)\\1", "a*+", "a++b", "a?+", "a{2}+", "(?=a)b", "(?!a)b", "(?<=a)b", "(?<!a)b"],
)
def test_java_only_constructs_are_refused(pattern):
    with pytest.raises(ValueError):
        L.re_match("x", pattern)


@pytest.mark.parametrize(
    "pattern",
    ["\\0", "[+]+", "a+\\+", "\\\\1", "(?:a)+", "a(?i)"],
)
def test_re2_legal_lookalikes_are_accepted(pattern):
    # escaped/boundary cases that a naive scanner would misflag
    L.re_match("x", pattern)
