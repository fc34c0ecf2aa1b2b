"""Conformance harness: the upstream promqltest script format.

prometheus/prometheus keeps its PromQL engine's own conformance suite
in a script format (promql/promqltest/test.go, *.test files): `load`
blocks in the expanding series notation, `eval instant|range` blocks
with expected samples, `eval_fail` / `eval_ordered` variants, `clear`.
tests/promqltest/*.test is this repo's corpus in that exact format —
a user can drop their own upstream-style .test files next to them (or
run `python -m tsdb_spark test-promql <file>`) and they execute against
this engine's evaluator unchanged.
"""

import glob
import os

import pytest

from tsdb_spark.promtool import run_promql_tests

_DIR = os.path.join(os.path.dirname(__file__), "promqltest")
_FILES = sorted(glob.glob(os.path.join(_DIR, "*.test")))


def test_corpus_nonempty():
    assert len(_FILES) >= 9


# corpus files above ~20s each (measured r11, /tmp/pytest_durations.txt)
# run in the opt-in slow lane; every promql feature keeps default-lane
# coverage via the remaining corpus files + tests/test_promql.py
_SLOW_FILES = {
    "nonfinite_windows.test",
    "native_hist_binops.test",
    "rate.test",
    "binops.test",
    "over_time.test",
    "nan_inf.test",
    "functions.test",
    "aggregations.test",
    "group_modifiers.test",
    "operators_algebra.test",
    "functions_math.test",
    "nhcb.test",
    "regressions.test",
    "offset_range_fns.test",
    "native_histograms.test",
    "aggregators_algebra.test",
    "annotations.test",
    "utf8_names.test",
    "subquery_at.test",
    "selectors.test",
}


@pytest.mark.parametrize(
    "path",
    [
        pytest.param(
            p,
            marks=[pytest.mark.slow]
            if os.path.basename(p) in _SLOW_FILES
            else [],
        )
        for p in _FILES
    ],
    ids=[os.path.basename(p) for p in _FILES],
)
def test_promqltest_file(spark, tmp_path, path):
    failures = run_promql_tests(spark, path, tmp_dir=str(tmp_path))
    assert failures == []
