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


@pytest.mark.parametrize("path", _FILES, ids=[os.path.basename(p) for p in _FILES])
def test_promqltest_file(spark, tmp_path, path):
    failures = run_promql_tests(spark, path, tmp_dir=str(tmp_path))
    assert failures == []
