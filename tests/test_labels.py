"""Matcher semantics suite — transcribes the load-bearing cases of the
reference's TestPostingsForMatchers (querier_test.go:1830-2083) and
selector tests onto the Column compiler."""

import pytest
from pyspark.sql import functions as F

from tsdb_spark import labels as L

# the reference's test universe (querier_test.go:1838-1845):
SERIES = [
    {"n": "1"},
    {"n": "1", "i": "a"},
    {"n": "1", "i": "b"},
    {"n": "2"},
    {"n": "2.5"},
]


@pytest.fixture(scope="module")
def series_df(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(SERIES)], "id INT, labels MAP<STRING,STRING>"
    )


def ids(series_df, matchers):
    rows = series_df.filter(L.compile_matchers(matchers)).select("id").collect()
    return sorted(r["id"] for r in rows)


# each case: (matchers, expected ids) — mirrors querier_test.go:1846-2023
CASES = [
    # simple equals
    ([L.eq("n", "1")], [0, 1, 2]),
    ([L.eq("n", "1"), L.eq("i", "a")], [1]),
    ([L.eq("n", "1"), L.eq("i", "missing")], []),
    ([L.eq("missing", "")], [0, 1, 2, 3, 4]),  # missing label == ""
    # not equals
    ([L.neq("n", "1")], [3, 4]),
    ([L.eq("n", "1"), L.neq("i", "a")], [0, 2]),
    ([L.eq("n", "1"), L.neq("i", "")], [1, 2]),  # i!="" → series WITH i
    ([L.eq("n", "1"), L.eq("i", "")], [0]),      # i=""  → series WITHOUT i
    # regex
    ([L.re_match("n", "^1$")], [0, 1, 2]),
    ([L.eq("n", "1"), L.re_match("i", "^a$")], [1]),
    ([L.eq("n", "1"), L.re_match("i", "^a?$")], [0, 1]),
    ([L.re_match("n", "^$")], []),
    ([L.eq("n", "1"), L.re_match("i", "^$")], [0]),
    ([L.eq("n", "1"), L.re_match("i", "^.*$")], [0, 1, 2]),
    ([L.eq("n", "1"), L.re_match("i", "^.+$")], [1, 2]),
    # not regex
    ([L.re_not_match("n", "^1$")], [3, 4]),
    ([L.eq("n", "1"), L.re_not_match("i", "^a$")], [0, 2]),
    ([L.eq("n", "1"), L.re_not_match("i", "^a?$")], [2]),
    ([L.eq("n", "1"), L.re_not_match("i", "^$")], [1, 2]),
    ([L.eq("n", "1"), L.re_not_match("i", "^.*$")], []),
    ([L.eq("n", "1"), L.re_not_match("i", "^.+$")], [0]),
    # combinations
    ([L.eq("n", "1"), L.neq("i", ""), L.eq("i", "a")], [1]),
    ([L.eq("n", "1"), L.neq("i", "b"), L.re_match("i", "^(b|a).*$")], [1]),
    # set matches (alternations)
    ([L.re_match("n", "1|2")], [0, 1, 2, 3]),
    ([L.re_match("i", "a|b")], [1, 2]),
    ([L.re_match("n", "x2|2")], [3]),
    ([L.re_match("n", "2|2\\.5")], [3, 4]),
    # empty alternative matches missing label (querier_test.go:2012-2017)
    ([L.re_match("i", "a|")], [0, 1, 3, 4]),
]


@pytest.mark.parametrize("matchers,expected", CASES, ids=lambda x: str(x))
def test_matcher_cases(series_df, matchers, expected):
    if isinstance(matchers, list):
        assert ids(series_df, matchers) == expected


def test_find_set_matches():
    # querier_test.go:1775-1828 TestFindSetMatches (semantics, unanchored form)
    assert L.find_set_matches("foo") == ["foo"]
    assert L.find_set_matches("foo|bar|baz") == ["foo", "bar", "baz"]
    assert L.find_set_matches("foo|bar|") == ["foo", "bar", ""]
    assert L.find_set_matches("fo\\.o|bar?|^baz") is None
    assert L.find_set_matches("foo.+") is None
    assert L.find_set_matches(".*foo") is None
    assert L.find_set_matches("fo\\|o|bar") == ["fo|o", "bar"]
    assert L.find_set_matches("\\d|x") is None  # regex class, not literal


def test_matches_empty_classification():
    assert L.eq("l", "").matches_empty()
    assert not L.eq("l", "x").matches_empty()
    assert L.neq("l", "x").matches_empty()
    assert not L.neq("l", "").matches_empty()
    assert L.re_match("l", ".*").matches_empty()
    assert not L.re_match("l", ".+").matches_empty()
    assert L.re_not_match("l", ".+").matches_empty()


def test_labels_str_canonical(spark):
    df = spark.createDataFrame(
        [({"b": "2", "a": "1", "_z": "0"},)], "labels MAP<STRING,STRING>"
    )
    out = df.select(L.labels_str_expr("labels").alias("s")).collect()[0]["s"]
    assert out == '{_z="0",a="1",b="2"}'


def test_labels_str_injective_no_series_id_collision(spark):
    # the VERDICT.md round-1 defect: {a: 'b",c="d'} vs {a: 'b', c: 'd'}
    # rendered identically without escaping → series_id collision. The
    # reference prevents this with strconv.Quote + \xff-separated hashing
    # (labels/labels.go:43-71).
    tricky = [
        {"a": 'b",c="d'},
        {"a": "b", "c": "d"},
        {"a": "b\\", "c": "d"},
        {"a": 'b\\",c=\\"d'},
        {'a="x': "1", "b": "y"},
    ]
    df = spark.createDataFrame([(l,) for l in tricky], "labels MAP<STRING,STRING>")
    out = df.select(
        L.labels_str_expr("labels").alias("s"),
        L.series_id_expr("labels").alias("sid"),
    ).collect()
    strs = [r["s"] for r in out]
    sids = [r["sid"] for r in out]
    assert len(set(strs)) == len(tricky), strs
    assert len(set(sids)) == len(tricky), sids


def test_strip_empty_labels(spark):
    df = spark.createDataFrame([({"a": "1", "b": ""},)], "labels MAP<STRING,STRING>")
    out = df.select(L.strip_empty_labels("labels").alias("l")).collect()[0]["l"]
    assert out == {"a": "1"}


def test_matcher_compiler_equivalence_exhaustive(spark):
    """Property check: the Column compiler agrees with a direct Python
    evaluation of Prometheus matcher semantics (missing label == "",
    fully-anchored regex) over an exhaustive label-set universe x ~140
    matcher combinations — all evaluated in ONE Spark job."""
    import itertools
    import re as pyre

    rows = []
    for n_v, i_v in itertools.product([None, "a", "ab", "b"], [None, "a", "b"]):
        lbl = {}
        if n_v is not None:
            lbl["n"] = n_v
        if i_v is not None:
            lbl["i"] = i_v
        rows.append(lbl)
    df = spark.createDataFrame(
        [(i, r) for i, r in enumerate(rows)], "id INT, labels MAP<STRING,STRING>"
    )

    eq_vals = ["", "a", "ab", "c"]
    re_pats = ["", "a", "a.*", "a|b", "[ab]", ".*", "a.*b", "(a)(b)?"]
    singles = []
    for nm in ("n", "i", "j"):
        singles += [L.eq(nm, v) for v in eq_vals]
        singles += [L.neq(nm, v) for v in eq_vals]
        singles += [L.re_match(nm, p) for p in re_pats]
        singles += [L.re_not_match(nm, p) for p in re_pats]
    core = [
        L.eq("n", "a"),
        L.eq("i", ""),
        L.neq("n", ""),
        L.re_match("i", "a|b"),
        L.re_not_match("i", "a.*"),
        L.re_match("n", ".*"),
    ]
    cases = [[m] for m in singles] + [list(c) for c in itertools.combinations(core, 2)]

    conds = [L.compile_matchers(ms).alias(f"c{k}") for k, ms in enumerate(cases)]
    got = {r["id"]: r for r in df.select("id", *conds).collect()}

    def ref_one(m, lbl):
        v = lbl.get(m.name, "")
        if m.type == "=":
            return v == m.value
        if m.type == "!=":
            return v != m.value
        if m.type == "=~":
            return pyre.fullmatch(m.value, v) is not None
        return pyre.fullmatch(m.value, v) is None

    for rid, lbl in enumerate(rows):
        for k, ms in enumerate(cases):
            want = all(ref_one(m, lbl) for m in ms)
            have = bool(got[rid][f"c{k}"])
            assert have == want, (lbl, [str(m) for m in ms], have, want)


# ---------------------------------------------------------------- parser

def test_parse_selector_forms():
    from tsdb_spark.labels import parse_selector

    assert parse_selector("up") == [L.eq("__name__", "up")]
    assert parse_selector('{job="api"}') == [L.eq("job", "api")]
    got = parse_selector('click{user=~"1|2", k_bucket!="high", x!~"a.*"}')
    assert got == [
        L.eq("__name__", "click"),
        L.re_match("user", "1|2"),
        L.neq("k_bucket", "high"),
        L.re_not_match("x", "a.*"),
    ]


def test_parse_selector_escapes():
    from tsdb_spark.labels import parse_selector

    # escaped quote and backslash inside a value; \\n is backslash + n,
    # NOT a newline (single-pass unescape)
    (m,) = parse_selector(r'{a="q\"v\\n"}')
    assert m.value == 'q"v\\n'
    (m2,) = parse_selector(r'{a="tab\there"}')
    assert m2.value == "tab\there"


def test_parse_selector_rejects_garbage():
    import pytest

    from tsdb_spark.labels import parse_selector

    for bad in ("", "{}", '{a="b"', '{a=b}', '{a="b"} trailing', '{a=="b"}'):
        with pytest.raises(ValueError):
            parse_selector(bad)


def test_parse_selector_metric_name_grammar_and_trailing_comma():
    import pytest

    from tsdb_spark import labels as L
    from tsdb_spark.labels import parse_selector

    # PromQL allows one trailing comma before '}'
    assert parse_selector('{a="b",}') == [L.eq("a", "b")]
    assert parse_selector('m{a="b", }') == [
        L.eq("__name__", "m"),
        L.eq("a", "b"),
    ]
    # recording-rule colons are legal metric-name chars
    assert parse_selector("job:rate:5m") == [L.eq("__name__", "job:rate:5m")]
    # ADVICE r3: a bare name must satisfy the metric-name grammar
    for bad in ("m}", "1up", "a-b", "m{,}", '{,a="b"}'):
        with pytest.raises(ValueError):
            parse_selector(bad)


def test_series_id_strip_invariant_and_structural(spark):
    # identity must ignore empty-valued labels (head.go:832-833) and be
    # computed from entries, staying injective across the render-level
    # ambiguity cases without ever building the string
    df = spark.createDataFrame(
        [
            ({"a": "b", "junk": ""},),
            ({"a": "b"},),
            ({"a": "b", "junk": "x"},),
        ],
        "labels MAP<STRING,STRING>",
    )
    sids = [r["sid"] for r in df.select(L.series_id_expr("labels").alias("sid")).collect()]
    assert sids[0] == sids[1] != sids[2]


def test_parse_selector_utf8_quoted_names():
    # Prometheus 3.x quoted-name grammar (model/labels + promql/parser):
    # a bare quoted string in the braces is the metric name; quoted
    # matcher LHS is an arbitrary UTF-8 label name
    import pytest

    from tsdb_spark import labels as L
    from tsdb_spark.labels import parse_selector

    assert parse_selector('{"my.metric"}') == [L.eq("__name__", "my.metric")]
    assert parse_selector('{"metric with spaces", "label name"="v"}') == [
        L.eq("__name__", "metric with spaces"),
        L.eq("label name", "v"),
    ]
    assert parse_selector('foo{"a.b"=~"x.*"}') == [
        L.eq("__name__", "foo"),
        L.re_match("a.b", "x.*"),
    ]
    # escapes inside quoted names
    assert parse_selector('{"m\\"q"}') == [L.eq("__name__", 'm"q')]
    # the metric name must not be set twice (upstream parse error)
    for bad in ('{"a", "b"}', 'foo{"bar"}'):
        with pytest.raises(ValueError):
            parse_selector(bad)
    with pytest.raises(ValueError):
        parse_selector('{""="v"}')  # empty label name
