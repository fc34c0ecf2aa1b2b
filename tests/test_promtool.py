"""promtool parity (promtool.py): rule-file loading (model/rulefmt),
`check rules` static validation, the promql-test-file series notation
(ParseSeriesDesc), and the `test rules` unit-test runner
(cmd/promtool/unittest.go) end to end."""

import textwrap

from tsdb_spark.promtool import (
    check_rules,
    load_rule_file,
    parse_series_labels,
    parse_series_values,
    run_rule_tests,
)
from tsdb_spark.rules import AlertRule, Rule

RULES_YML = textwrap.dedent("""
    groups:
      - name: example
        interval: 1m
        rules:
          - record: job:req:sum1h
            expr: sum by (job) (sum_over_time(req[1h]))
            labels:
              tier: gold
          - alert: ManyRequests
            expr: job:req:sum1h{job="api"} > 20
            for: 2m
            keep_firing_for: 1m
            labels:
              severity: page
            annotations:
              summary: too many requests
""")


def test_load_rule_file(tmp_path):
    p = tmp_path / "rules.yml"
    p.write_text(RULES_YML)
    (g,) = load_rule_file(str(p))
    assert g["name"] == "example" and g["interval_ms"] == 60_000
    rec, al = g["rules"]
    assert rec == Rule(
        name="job:req:sum1h",
        expr="sum by (job) (sum_over_time(req[1h]))",
        labels=(("tier", "gold"),),
    )
    assert isinstance(al, AlertRule)
    assert al.for_ms == 120_000 and al.keep_firing_ms == 60_000
    assert al.labels == (("severity", "page"),)
    assert al.annotations == (("summary", "too many requests"),)


def test_check_rules_good_and_bad(tmp_path):
    good = tmp_path / "good.yml"
    good.write_text(RULES_YML)
    assert check_rules(str(good)) == []

    bad = tmp_path / "bad.yml"
    bad.write_text(textwrap.dedent("""
        groups:
          - name: g
            rules:
              - record: not a metric name
                expr: up
              - record: dup
                expr: up
              - record: dup
                expr: up
              - alert: BadExpr
                expr: sum by (job (up
    """))
    errs = check_rules(str(bad))
    assert any("invalid recording rule name" in e for e in errs)
    assert any("duplicate rule" in e for e in errs)
    assert any("bad expr" in e for e in errs)
    # unreadable/unparseable file is a report, not a crash
    assert check_rules(str(tmp_path / "missing.yml"))


def test_series_notation():
    # promql test files: `0+10x5` = six samples 0..50
    assert parse_series_values("0+10x5") == [0, 10, 20, 30, 40, 50]
    assert parse_series_values("10-2x3") == [10, 8, 6, 4]
    assert parse_series_values("5x2") == [5, 5, 5]
    assert parse_series_values("1 _ 3 stale 5") == [1, None, 3, None, 5]
    assert parse_series_values("1.5 -2 3e2") == [1.5, -2.0, 300.0]
    assert parse_series_labels('up{job="a",env="p"}') == {
        "__name__": "up", "job": "a", "env": "p",
    }


TESTS_YML = textwrap.dedent("""
    rule_files:
      - rules.yml
    evaluation_interval: 1m
    tests:
      - interval: 1m
        input_series:
          - series: 'req{job="api", instance="0"}'
            values: '0+10x10'
          - series: 'req{job="web", instance="0"}'
            values: '0+1x10'
        promql_expr_test:
          - expr: req
            eval_time: 2m
            exp_samples:
              - labels: 'req{job="api", instance="0"}'
                value: 20
              - labels: 'req{job="web", instance="0"}'
                value: 2
          - expr: sum by (job) (req)
            eval_time: 3m
            exp_samples:
              - labels: '{job="api"}'
                value: 30
              - labels: '{job="web"}'
                value: 3
        alert_rule_test:
          # recording rule feeds the alert: job:req:sum1h{job="api"}
          # crosses 20 at t=2m (0+10+20=30); `for: 2m` ⇒ firing at 4m
          - eval_time: 1m
            alertname: ManyRequests
            exp_alerts: []
          - eval_time: 4m
            alertname: ManyRequests
            exp_alerts:
              - exp_labels:
                  job: api
                  severity: page
                  tier: gold
                exp_annotations:
                  summary: too many requests
""")


def test_run_rule_tests_pass(spark, tmp_path):
    (tmp_path / "rules.yml").write_text(RULES_YML)
    p = tmp_path / "tests.yml"
    p.write_text(TESTS_YML)
    assert run_rule_tests(spark, str(p)) == []


def test_run_rule_tests_reports_failures(spark, tmp_path):
    (tmp_path / "rules.yml").write_text(RULES_YML)
    p = tmp_path / "tests.yml"
    p.write_text(textwrap.dedent("""
        rule_files: [rules.yml]
        evaluation_interval: 1m
        tests:
          - interval: 1m
            input_series:
              - series: 'req{job="api"}'
                values: '1 1 1'
            promql_expr_test:
              - expr: req
                eval_time: 1m
                exp_samples:
                  - labels: 'req{job="api"}'
                    value: 999
    """))
    fails = run_rule_tests(spark, str(p))
    assert len(fails) == 1 and "want" in fails[0]


def test_run_rule_tests_range_form_and_templates(spark, tmp_path):
    """Range-form promql_expr_test (eval_range + values notation) and
    external_labels/external_url template expansion in alert labels
    and annotations ({{ $labels.x }}, {{ $value }} too)."""
    (tmp_path / "rules.yml").write_text(textwrap.dedent("""
        groups:
          - name: t
            interval: 1m
            rules:
              - alert: Hot
                expr: req > 15
                labels:
                  severity: page
                annotations:
                  summary: '{{ $labels.job }} at {{ $value }} in {{ $externalLabels.cluster }}'
                  runbook: '{{ $externalURL }}/runbook'
    """))
    p = tmp_path / "tests.yml"
    p.write_text(textwrap.dedent("""
        rule_files: [rules.yml]
        evaluation_interval: 1m
        tests:
          - interval: 1m
            external_labels:
              cluster: eu-1
            external_url: https://prom.example
            input_series:
              - series: 'req{job="api"}'
                values: '0+10x10'
            promql_expr_test:
              - expr: sum(req)
                eval_range: {from: 0m, to: 4m, step: 2m}
                exp_samples:
                  - labels: '{}'
                    values: '0+20x2'
              - expr: req
                eval_time: 2m
                exp_samples:
                  - labels: 'req{job="api"}'
                    value: 20
            alert_rule_test:
              - eval_time: 3m
                alertname: Hot
                exp_alerts:
                  - exp_labels:
                      job: api
                      severity: page
                    exp_annotations:
                      summary: 'api at 30 in eu-1'
                      runbook: 'https://prom.example/runbook'
    """))
    assert run_rule_tests(spark, str(p)) == []


def test_run_rule_tests_range_form_mismatch(spark, tmp_path):
    (tmp_path / "rules.yml").write_text("groups: []\n")
    p = tmp_path / "tests.yml"
    p.write_text(textwrap.dedent("""
        rule_files: [rules.yml]
        evaluation_interval: 1m
        tests:
          - interval: 1m
            input_series:
              - series: 'req{job="api"}'
                values: '0+10x10'
            promql_expr_test:
              - expr: sum(req)
                eval_range: {from: 0m, to: 4m, step: 2m}
                exp_samples:
                  - labels: '{}'
                    values: '0 20 41'
    """))
    fails = run_rule_tests(spark, str(p))
    assert len(fails) == 1 and "want" in fails[0]


def test_surplus_expectation_values_fail_loudly(spark, tmp_path):
    """ADVICE r7: an expectation carrying MORE values than the eval
    grid must fail, not pass vacuously with the surplus truncated —
    in both the promqltest range compare and the rule-test range form."""
    from tsdb_spark.promtool import run_promql_tests

    p = tmp_path / "surplus.test"
    p.write_text(
        "load 1m\n"
        "    m 0 10 20\n"
        "\n"
        "eval range from 0m to 2m step 1m m\n"
        "    m 0 10 20 30 40\n"
    )
    fails = run_promql_tests(spark, str(p))
    assert len(fails) == 1 and "grid has only" in fails[0]

    (tmp_path / "rules.yml").write_text("groups: []\n")
    y = tmp_path / "tests.yml"
    y.write_text(textwrap.dedent("""
        rule_files: [rules.yml]
        evaluation_interval: 1m
        tests:
          - interval: 1m
            input_series:
              - series: 'req'
                values: '0 10 20'
            promql_expr_test:
              - expr: sum(req)
                eval_range: {from: 0m, to: 2m, step: 1m}
                exp_samples:
                  - labels: '{}'
                    values: '0 10 20 30 40'
    """))
    fails = run_rule_tests(spark, str(y))
    assert len(fails) == 1


def test_collect_annotations_bad_bucket_le(spark, tmp_path):
    """BadBucketLabelWarning: classic histogram_quantile over buckets
    where a series' `le` is missing or unparseable (annotations.go
    NewBadBucketLabelWarning)."""
    from tsdb_spark import DB
    from tsdb_spark.promql import collect_annotations

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=3_600_000)
    rows = [
        ({"__name__": "reqs_bucket", "le": "0.1"}, 0, 1.0),
        ({"__name__": "reqs_bucket", "le": "+Inf"}, 0, 2.0),
        ({"__name__": "bad_bucket", "le": "abc"}, 0, 1.0),
        ({"__name__": "bad_bucket", "le": "+Inf"}, 0, 2.0),
    ]
    db.append(
        spark.createDataFrame(
            rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
        )
    )
    ok = collect_annotations(
        db, "histogram_quantile(0.9, reqs_bucket)", 0, 0, 60_000
    )
    assert ok == []
    bad = collect_annotations(
        db, "histogram_quantile(0.9, bad_bucket)", 0, 0, 60_000
    )
    assert bad == [
        (
            "warn",
            'bucket label "le" is missing or has a malformed value of '
            '"abc" for metric name "bad_bucket"',
        )
    ]
