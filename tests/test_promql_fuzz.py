"""Grammar fuzz for the PromQL evaluator: hypothesis composes random
valid expressions from the supported surface and asserts the evaluation
contract holds for every one — parse succeeds, the plan executes, the
output lands on the query grid with a (t, value) schema, and ordering
wrappers never change the result multiset.

Values are checked elsewhere (tests/test_promql.py model tests and the
oracle-paired registry entries); this suite guards the long tail of
COMPOSITIONS those targeted tests don't enumerate."""

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tsdb_spark import promql as P

START, END, STEP = 10_000, 40_000, 7_000
LOOKBACK = 9_000

_sel = st.sampled_from(
    ["click", "gauge", 'click{user="1"}', '{__name__=~"click|gauge"}']
)
_dur = st.sampled_from(["10s", "14s", "21s"])
_rangefn = st.sampled_from(
    ["rate", "increase", "delta", "avg_over_time", "count_over_time",
     "max_over_time", "changes", "last_over_time"]
)
_valuefn = st.sampled_from(["abs", "ceil", "floor", "sgn", "exp", "sin", "round"])
_agg = st.sampled_from(["sum", "min", "max", "count", "avg", "group"])
_num = st.sampled_from(["2", "0.5", "10"])
_mod = st.sampled_from(["", " offset 7s", " offset -7s", " @ 25", " @ end()"])


def _vector(depth: int):
    base = st.one_of(
        st.tuples(_sel, _mod).map(lambda t: t[0] + t[1]),
        st.tuples(_rangefn, _sel, _dur, _mod).map(
            lambda t: f"{t[0]}({t[1]}[{t[2]}]{t[3]})"
        ),
    )
    if depth <= 0:
        return base
    inner = _vector(depth - 1)
    return st.one_of(
        base,
        st.tuples(_valuefn, inner).map(lambda t: f"{t[0]}({t[1]})"),
        st.tuples(_agg, inner).map(lambda t: f"{t[0]} by (user) ({t[1]})"),
        st.tuples(_agg, inner).map(lambda t: f"{t[0]} without () ({t[1]})"),
        st.tuples(inner, st.sampled_from(["+", "*", "-", "atan2", "%"]), _num).map(
            lambda t: f"({t[0]}) {t[1]} {t[2]}"
        ),
        # NaN-producing arithmetic composed with comparisons (the IEEE
        # rule: false except !=) and unary negation
        st.tuples(inner, st.sampled_from([">", "<=", "!="]), _num).map(
            lambda t: f"(({t[0]}) % 0) {t[1]} bool {t[2]}"
        ),
        st.tuples(inner).map(lambda t: f"-({t[0]})"),
        st.tuples(inner, st.sampled_from([">", "<="]), _num).map(
            lambda t: f"({t[0]}) {t[1]} bool -{t[2]}"
        ),
        st.tuples(inner).map(lambda t: f"sort_desc({t[0]})"),
        st.tuples(inner).map(lambda t: f'count_values("cv", {t[0]})'),
        st.tuples(inner, inner).map(
            lambda t: f"({t[0]}) / scalar(sum({t[1]}))"
        ),
        # r6 surfaces: quoted (UTF-8) grouping names, absent() over
        # arbitrary expressions, vector(<scalar expr>), group_left
        # include labels against a label_replace'd grouped one side
        st.tuples(inner).map(lambda t: f'sum by ("user") ({t[0]})'),
        st.tuples(inner).map(lambda t: f"absent({t[0]})"),
        st.tuples(inner, inner).map(
            lambda t: f"vector(scalar(sum({t[0]}))) + on() "
            f"vector(scalar(count({t[1]})))"
        ),
        # the many side must keep unique output identities after the
        # name drop + include copy — a multi-metric selector would
        # (correctly, like upstream) raise 'must ensure unique matches'
        st.tuples(
            st.sampled_from(["click", 'click{user="1"}', "gauge"]), inner
        ).map(
            lambda t: f"({t[0]}) + on(user) group_left(zz) "
            f'label_replace(max by (user) ({t[1]}), "zz", "1", "", "")'
        ),
    )


@pytest.fixture(scope="module")
def fuzz_frame(spark):
    from tsdb_spark import labels as L

    rows = []
    for name, user, pts in (
        ("click", "1", [(1, 0.0), (6, 5.0), (11, 2.0), (16, 7.0), (29, 12.25), (38, 1.5)]),
        ("click", "2", [(9, 100.0), (19, 100.0), (20, 90.0), (31, 95.0)]),
        ("gauge", "1", [(5, -3.5), (15, 4.25), (25, -1.0), (35, 8.0)]),
    ):
        rows.extend(
            ({"__name__": name, "user": user}, t * 1000, v) for t, v in pts
        )
    df = spark.createDataFrame(rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE")
    return df.withColumn("labels_str", L.labels_str_expr("labels"))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(expr=_vector(2))
@pytest.mark.slow
def test_fuzz_eval_contract(spark, fuzz_frame, expr):
    node = P.parse_expr(expr)  # must parse
    q = P.RangeQuery(fuzz_frame, START, END, STEP, lookback_ms=LOOKBACK)
    out = q.run(node)
    assert "t" in out.columns and "value" in out.columns
    rows = out.collect()
    grid = set(range(START, END + 1, STEP))
    for r in rows:
        assert r["t"] in grid, (expr, r["t"])
        assert r["value"] is None or isinstance(r["value"], float)
    # ordering wrappers are presentation-only: same multiset (compare
    # reprs — tuple == is NaN-blind, repr('nan') is not)
    sorted_rows = q.run(f"sort({expr})").collect()
    key = lambda r: repr((r["t"], r["value"]))
    assert sorted(key(r) for r in rows) == sorted(
        key(r) for r in sorted_rows
    ), expr
