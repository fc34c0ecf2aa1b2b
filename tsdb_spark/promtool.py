"""promtool-parity rule tooling: rule files, `check rules`, `test rules`.

The upstream operator workflow around rules lives in promtool
(prometheus/prometheus cmd/promtool): rule files in YAML
(model/rulefmt), static validation (`promtool check rules`), and the
rule unit-test framework (`promtool test rules`, cmd/promtool/
unittest.go) where input series are declared in the expanding notation
of promql's own test files (promql/parser ParseSeriesDesc) and
expressions/alerts are asserted at fixed instants. This module brings
all three over the engine's evaluator + rules machinery, so a user's
existing rules.yml and tests.yml run here unchanged.

Spark split: test stores are built with one `DB.append` per test case
and every assertion is one bounded range evaluation — the framework is
driver-orchestrated (inputs are test-sized by construction), but each
evaluation is the same distributed plan production queries run.
"""

from __future__ import annotations

import os
import re

from tsdb_spark.rules import AlertRule, Rule

# ------------------------------------------------------------ durations


def _duration_ms(v) -> int:
    """rulefmt durations: "5m"/"1h30m" strings or bare numbers
    (seconds, promtool accepts both)."""
    if v is None:
        return 0
    if isinstance(v, (int, float)):
        return int(v * 1000)
    from tsdb_spark.promql import parse_duration

    return parse_duration(str(v))


# ------------------------------------------------------------ rule files


def load_rule_file(path: str) -> list[dict]:
    """Parse an upstream rules YAML (model/rulefmt RuleGroups) into the
    engine's group dicts: {"name", "file", "interval_ms", "rules":
    [Rule | AlertRule]} — the shape api.rules_payload / alerts_payload
    serve."""
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    groups = []
    for g in doc.get("groups", []):
        rules: list = []
        for r in g.get("rules", []):
            labels = tuple(sorted((str(k), str(v)) for k, v in (r.get("labels") or {}).items()))
            if "alert" in r:
                rules.append(
                    AlertRule(
                        name=str(r["alert"]),
                        expr=str(r["expr"]),
                        for_ms=_duration_ms(r.get("for")),
                        keep_firing_ms=_duration_ms(r.get("keep_firing_for")),
                        labels=labels,
                        annotations=tuple(sorted(
                            (str(k), str(v))
                            for k, v in (r.get("annotations") or {}).items()
                        )),
                    )
                )
            elif "record" in r:
                rules.append(Rule(name=str(r["record"]), expr=str(r["expr"]), labels=labels))
            else:
                raise ValueError(f"rule needs `record:` or `alert:`: {r}")
        groups.append(
            {
                "name": g.get("name", ""),
                "file": path,
                "interval_ms": _duration_ms(g.get("interval")) or 60_000,
                "rules": rules,
            }
        )
    return groups


_METRIC_RE = re.compile(r"[a-zA-Z_:][a-zA-Z0-9_:]*$")


def check_rules(path: str) -> list[str]:
    """`promtool check rules`: static validation — YAML shape, metric
    names, duplicate rule identity within a group, and every expression
    parses under the engine's PromQL grammar. Returns error strings
    (empty = valid)."""
    from tsdb_spark.promql import parse_expr

    errors: list[str] = []
    try:
        groups = load_rule_file(path)
    except Exception as e:  # yaml/shape errors are the report, not a crash
        return [f"{path}: {e}"]
    seen_groups = set()
    for g in groups:
        if g["name"] in seen_groups:
            errors.append(f"group {g['name']!r}: duplicate group name")
        seen_groups.add(g["name"])
        seen = set()
        for r in g["rules"]:
            where = f"group {g['name']!r}, rule {r.name!r}"
            if isinstance(r, Rule) and not _METRIC_RE.match(r.name):
                errors.append(f"{where}: invalid recording rule name")
            ident = (type(r).__name__, r.name, r.labels)
            if ident in seen:
                errors.append(f"{where}: duplicate rule")
            seen.add(ident)
            try:
                parse_expr(r.expr)
            except Exception as e:
                errors.append(f"{where}: bad expr: {e}")
    return errors


# --------------------------------------------------- series notation

_EXPAND_RE = re.compile(
    r"^(?P<start>-?[0-9.eE+]+?)(?:(?P<sign>[+-])(?P<step>[0-9.eE+]+))?x(?P<n>\d+)$"
)


def parse_series_values(spec: str) -> list[float | None]:
    """promql/parser ParseSeriesDesc's value notation: space-separated
    entries, each a literal number, `_` (no sample at that step),
    `stale` (staleness marker — treated as a gap here; the engine has
    no stale NaN encoding), or the expanding form `A+BxN` / `A-BxN` /
    `AxN` which emits N+1 samples A, A±B, A±2B, ... (promql test files'
    `0+10x10` = eleven samples)."""
    out: list[float | None] = []
    for tok in spec.split():
        if tok == "_":
            out.append(None)
            continue
        if tok == "stale":
            out.append(None)
            continue
        m = _EXPAND_RE.match(tok)
        if m:
            start = float(m.group("start"))
            step = float(m.group("step") or 0.0)
            if m.group("sign") == "-":
                step = -step
            n = int(m.group("n"))
            out.extend(start + i * step for i in range(n + 1))
            continue
        out.append(float(tok))
    return out


def parse_series_labels(series: str) -> dict[str, str]:
    """'up{job="a"}' → {'__name__': 'up', 'job': 'a'} (equality matchers
    only — a series DESCRIPTION, not a selector)."""
    from tsdb_spark import labels as L

    out: dict[str, str] = {}
    for m in L.parse_selector(series):
        if m.type != "=":
            raise ValueError(f"series description needs '=' matchers: {series!r}")
        out[m.name] = m.value
    return out


# --------------------------------------------------- unit-test runner


def _build_store(spark, tmp_dir: str, input_series: list[dict], interval_ms: int):
    """input_series → one DB with samples at i*interval (t starts at 0,
    unittest.go's clock)."""
    from tsdb_spark.db import DB

    rows = []
    for s in input_series:
        labels = parse_series_labels(s["series"])
        for i, v in enumerate(parse_series_values(str(s["values"]))):
            if v is None:
                continue
            rows.append((labels, i * interval_ms, float(v)))
    db = DB.create(spark, os.path.join(tmp_dir, "db"), block_width_ms=3_600_000)
    if rows:
        db.append(
            spark.createDataFrame(
                rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
            )
        )
    return db


def _labels_key(d: dict) -> tuple:
    return tuple(sorted((k, v) for k, v in d.items() if v))


def run_rule_tests(spark, path: str, tmp_dir: str | None = None) -> list[str]:
    """`promtool test rules` (cmd/promtool/unittest.go): for each test
    case, build a store from `input_series`, materialize every
    recording rule of the referenced rule files over [0, max eval_time]
    at the group interval (rules can read rules — same layering as
    upstream's sequential group evaluation), then check
    `promql_expr_test` instant expectations and `alert_rule_test`
    firing expectations. Returns failure strings (empty = pass)."""
    import tempfile

    import yaml

    from tsdb_spark.promql import eval_range_db
    from tsdb_spark.rules import alerts_frame, record

    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    base = os.path.dirname(os.path.abspath(path))
    groups: list[dict] = []
    for rf in doc.get("rule_files", []):
        groups.extend(load_rule_file(os.path.join(base, rf)))
    default_interval = _duration_ms(doc.get("evaluation_interval")) or 60_000

    failures: list[str] = []
    for ti, test in enumerate(doc.get("tests", [])):
        interval = _duration_ms(test.get("interval")) or default_interval
        expr_tests = test.get("promql_expr_test", []) or []
        alert_tests = test.get("alert_rule_test", []) or []
        horizon = max(
            [_duration_ms(t.get("eval_time")) for t in expr_tests + alert_tests]
            or [0]
        )
        root = tempfile.mkdtemp(prefix="promtool_t_", dir=tmp_dir)
        db = _build_store(spark, root, test.get("input_series", []), interval)

        # recording rules land first, file order (unittest.go evaluates
        # groups per tick; batch-materializing over the whole horizon is
        # equivalent for rules whose inputs are append-only)
        for g in groups:
            recs = [r for r in g["rules"] if isinstance(r, Rule)]
            if recs and horizon >= 0:
                record(db, recs, 0, horizon, interval)

        for et in expr_tests:
            t = _duration_ms(et.get("eval_time"))
            expr = et["expr"]
            got = {}
            out = eval_range_db(db, expr, t, t, max(interval, 1))
            cols = out.columns
            for row in out.collect():
                if "labels" in cols:
                    key = _labels_key(dict(row["labels"]))
                else:
                    key = _labels_key(
                        {
                            c: str(row[c])
                            for c in cols
                            if c not in ("t", "value", "labels_str")
                        }
                    )
                got[key] = row["value"]
            want = {}
            for s in et.get("exp_samples", []) or []:
                want[_labels_key(parse_series_labels(s["labels"]))] = float(
                    s["value"]
                )
            # unittest.go compares with almostEqual, not bit equality
            import math

            ok = set(got) == set(want) and all(
                (math.isnan(got[k]) and math.isnan(want[k]))
                or math.isclose(got[k], want[k], rel_tol=1e-6, abs_tol=1e-9)
                for k in want
            )
            if not ok:
                failures.append(
                    f"test {ti}, expr {expr!r} @ {t}ms: got {got}, want {want}"
                )

        for at in alert_tests:
            t = _duration_ms(at.get("eval_time"))
            name = at["alertname"]
            rules = [
                r
                for g in groups
                for r in g["rules"]
                if isinstance(r, AlertRule) and r.name == name
            ]
            firing: list[dict] = []
            for rule in rules:
                frame = alerts_frame(db, rule, 0, t, interval)
                for row in frame.collect():
                    lab = dict(row["labels"])
                    if (
                        row["t"] == t
                        and lab.get("alertstate") == "firing"
                    ):
                        lab.pop("alertstate", None)
                        lab.pop("__name__", None)
                        firing.append(
                            {
                                "labels": lab,
                                "annotations": dict(rule.annotations),
                            }
                        )
            want_alerts = []
            for e in at.get("exp_alerts", []) or []:
                lab = {
                    str(k): str(v)
                    for k, v in (e.get("exp_labels") or {}).items()
                }
                lab["alertname"] = name
                want_alerts.append(
                    {
                        "labels": lab,
                        "annotations": {
                            str(k): str(v)
                            for k, v in (e.get("exp_annotations") or {}).items()
                        },
                    }
                )
            key = lambda a: (_labels_key(a["labels"]), _labels_key(a["annotations"]))  # noqa: E731
            if sorted(firing, key=key) != sorted(want_alerts, key=key):
                failures.append(
                    f"test {ti}, alert {name!r} @ {t}ms: "
                    f"got {sorted(firing, key=key)}, want {sorted(want_alerts, key=key)}"
                )
    return failures
