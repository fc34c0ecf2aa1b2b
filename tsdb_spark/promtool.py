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


def load_rule_file(path: str, default_interval_ms: int = 60_000) -> list[dict]:
    """Parse an upstream rules YAML (model/rulefmt RuleGroups) into the
    engine's group dicts: {"name", "file", "interval_ms", "rules":
    [Rule | AlertRule]} — the shape api.rules_payload / alerts_payload
    serve. Groups without their own `interval:` inherit
    `default_interval_ms` (the config's global evaluation_interval,
    like upstream's Group defaulting)."""
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
                "interval_ms": _duration_ms(g.get("interval"))
                or default_interval_ms,
                "rules": rules,
            }
        )
    return groups


def backfill_rules(
    spark,
    rules_path: str,
    source: str,
    output: str | None = None,
    start_ms: int = 0,
    end_ms: int = 0,
    eval_interval_ms: int | None = None,
    block_width_ms: int = 2 * 3600 * 1000,
) -> dict[str, int]:
    """`promtool tsdb create-blocks-from rules` (cmd/promtool/tsdb.go +
    cmd/promtool/rules.go ruleImporter): evaluate each group's RECORDING
    rules over the historical range [start, end] at the group's interval
    (overridable via eval_interval_ms, upstream's --eval-interval) against
    the source store, appending the result series into the output store.

    Default output is the source store itself — which, because a group's
    rules record sequentially (rules.record), also lets a later rule read
    an earlier rule's backfilled output. Upstream's separate-output-dir
    design documents that layered case as a limitation; pointing `output`
    at a different store reproduces that upstream behavior (later rules
    see only the source). Alerting rules are skipped — backfill produces
    samples, not alert state (upstream importer evaluates rule
    expressions only). The first evaluation timestamp aligns UP to the
    interval grid (rules/manager.go Group.EvalTimestamp).

    Returns {"groups", "rules", "skipped_alerts", "samples"} counts."""
    from tsdb_spark.db import DB
    from tsdb_spark.rules import record

    groups = load_rule_file(rules_path)
    src = DB.open(spark, source)
    dst = src
    if output and os.path.abspath(output) != os.path.abspath(source):
        dst = (
            DB.open(spark, output)
            if os.path.exists(os.path.join(output, "_meta.json"))
            else DB.create(spark, output, block_width_ms=block_width_ms)
        )
    report = {"groups": 0, "rules": 0, "skipped_alerts": 0, "samples": 0}
    for g in groups:
        interval = eval_interval_ms or g["interval_ms"] or 60_000
        t0 = ((start_ms + interval - 1) // interval) * interval
        recs = [r for r in g["rules"] if isinstance(r, Rule)]
        report["skipped_alerts"] += len(g["rules"]) - len(recs)
        if not recs or t0 > end_ms:
            continue
        reps = record(src, recs, t0, end_ms, interval, dst=dst, report=True)
        report["groups"] += 1
        report["rules"] += len(recs)
        report["samples"] += sum(r.appended for r in reps.values())
    return report


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
    only — a series DESCRIPTION, not a selector). The empty set renders
    as '{}' (an aggregate-to-nothing expectation)."""
    from tsdb_spark import labels as L

    if series.strip() in ("", "{}"):
        return {}
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


#: the documented subset of Go template actions real-world rule files
#: use in alert labels/annotations: {{ $labels.x }}, {{ $value }},
#: {{ $externalLabels.x }}, {{ $externalURL }} (template/template.go
#: AlertTemplateData) — expanded by plain substitution, not a Go
#: template engine
_TMPL_RE = re.compile(
    r"\{\{\s*\$(?:(labels|externalLabels)\.([A-Za-z_][A-Za-z0-9_]*)"
    r"|(value|externalURL))\s*\}\}"
)


def expand_alert_template(
    text: str,
    labels: dict[str, str] | None = None,
    value: float | None = None,
    external_labels: dict[str, str] | None = None,
    external_url: str = "",
) -> str:
    """Expand the template-variable subset of Go's alert templating."""

    def _sub(m: re.Match) -> str:
        kind, name, bare = m.group(1), m.group(2), m.group(3)
        if kind == "labels":
            return (labels or {}).get(name, "")
        if kind == "externalLabels":
            return (external_labels or {}).get(name, "")
        if bare == "externalURL":
            return external_url
        return _fmt_go_value(value) if value is not None else ""

    return _TMPL_RE.sub(_sub, text)


def _fmt_go_value(v: float) -> str:
    """Go %v rendering of the alert $value (strconv-style: integers
    drop the decimal point)."""
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def run_rule_tests(spark, path: str, tmp_dir: str | None = None) -> list[str]:
    """`promtool test rules` (cmd/promtool/unittest.go): for each test
    case, build a store from `input_series`, materialize every
    recording rule of the referenced rule files over [0, max eval_time]
    at the group interval (rules can read rules — same layering as
    upstream's sequential group evaluation), then check
    `promql_expr_test` instant expectations and `alert_rule_test`
    firing expectations. Returns failure strings (empty = pass).

    Beyond upstream's instant-only promql_expr_test, an entry may carry
    `eval_range: {from, to, step}` with per-sample `values` in the
    expanding notation — the range form:

        promql_expr_test:
          - expr: sum(m)
            eval_range: {from: 0m, to: 10m, step: 5m}
            exp_samples:
              - labels: '{}'
                values: '0+50x2'

    Per-test `external_labels` / `external_url` (unittest.go testGroup)
    feed alert template expansion: {{ $labels.x }}, {{ $value }},
    {{ $externalLabels.x }} and {{ $externalURL }} in alert labels and
    annotations expand before comparison."""
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

        ext_labels = {
            str(k): str(v)
            for k, v in (test.get("external_labels") or {}).items()
        }
        ext_url = str(test.get("external_url") or "")

        for et in expr_tests:
            expr = et["expr"]
            rng = et.get("eval_range")
            if rng:  # range form (this engine's extension; see docstring)
                t_lo = _duration_ms(rng.get("from"))
                t_hi = _duration_ms(rng.get("to"))
                step = max(_duration_ms(rng.get("step")) or interval, 1)
            else:
                t_lo = t_hi = _duration_ms(et.get("eval_time"))
                step = max(interval, 1)
            grid = list(range(t_lo, t_hi + 1, step))
            got: dict[tuple, dict[int, float]] = {}
            out = eval_range_db(db, expr, t_lo, t_hi, step)
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
                got.setdefault(key, {})[int(row["t"])] = row["value"]
            want: dict[tuple, list[float | None]] = {}
            for s in et.get("exp_samples", []) or []:
                k = _labels_key(parse_series_labels(s["labels"]))
                if "values" in s:  # expanding notation, range form
                    want[k] = parse_series_values(str(s["values"]))
                else:
                    want[k] = [float(s["value"])]
            # unittest.go compares with almostEqual, not bit equality
            import math

            def _eq(a: float | None, b: float | None) -> bool:
                if a is None or b is None:
                    return a is None and b is None
                return (math.isnan(a) and math.isnan(b)) or math.isclose(
                    a, b, rel_tol=1e-6, abs_tol=1e-9
                )

            ok = set(got) == set(want)
            if ok:
                for k, evs in want.items():
                    if len(evs) > len(grid):
                        # surplus expectation values beyond the eval
                        # grid must fail, not be silently truncated
                        ok = False
                        break
                    padded = list(evs) + [None] * (len(grid) - len(evs))
                    series = got.get(k, {})
                    ok = ok and all(
                        _eq(series.get(tt), padded[i])
                        for i, tt in enumerate(grid)
                    )
            if not ok:
                failures.append(
                    f"test {ti}, expr {expr!r} @ {grid}ms: "
                    f"got {got}, want {want}"
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
                ann_src = dict(rule.annotations)
                needs_value = any(
                    "$value" in s
                    for s in list(ann_src.values()) + [v for _, v in rule.labels]
                )
                vals: dict[tuple, float] | None = None
                if needs_value:
                    # {{ $value }} is the alert EXPR's sample value —
                    # re-evaluate it once at t keyed by the expr labels
                    vout = eval_range_db(db, rule.expr, t, t, max(interval, 1))
                    vc = vout.columns
                    vals = {}
                    for r2 in vout.collect():
                        if "labels" in vc:
                            k2 = dict(r2["labels"])
                            k2.pop("__name__", None)
                        else:
                            k2 = {
                                c: str(r2[c])
                                for c in vc
                                if c not in ("t", "value", "labels_str")
                            }
                        vals[_labels_key(k2)] = r2["value"]
                for row in frame.collect():
                    lab = dict(row["labels"])
                    if (
                        row["t"] == t
                        and lab.get("alertstate") == "firing"
                    ):
                        lab.pop("alertstate", None)
                        lab.pop("__name__", None)
                        value = None
                        if vals is not None:
                            statics = {k for k, _ in rule.labels}
                            k2 = {
                                k: v
                                for k, v in lab.items()
                                if k != "alertname" and k not in statics
                            }
                            value = vals.get(_labels_key(k2))

                        def _x(s: str) -> str:
                            return expand_alert_template(
                                s, lab, value, ext_labels, ext_url
                            )

                        firing.append(
                            {
                                "labels": {k: _x(v) for k, v in lab.items()},
                                "annotations": {
                                    k: _x(v) for k, v in ann_src.items()
                                },
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


# --------------------------------------- promqltest script-format runner
#
# Upstream keeps a second, older test format next to the YAML rule
# tests: the promqltest script files (prometheus/prometheus
# promql/promqltest/test.go, *.test) that the PromQL engine's own
# conformance suite is written in. Commands start at column 0,
# expectations/series are indented:
#
#   load 5m
#       http_requests{job="api", group="canary"}  0+10x10
#
#   eval instant at 50m sum by (group) (http_requests)
#       {group="canary"} 100
#
#   eval range from 0 to 10m step 5m sum(http_requests)
#       {} 0 50 100
#
#   eval_fail instant at 1m http_requests + on(job) http_requests
#       expected_fail_regexp (duplicate|many-to-many)
#
#   eval_ordered instant at 50m sort(http_requests)
#       ...expectations in required order...
#
#   clear
#
# Values use the same expanding notation as the rule tests
# (parse_series_values). Comparison is upstream's almostEqual, with
# NaN==NaN and exact ±Inf.

_EVAL_CMD_RE = re.compile(
    r"^(?P<cmd>eval_fail|eval_ordered|eval)\s+"
    r"(?:instant\s+at\s+(?P<at>\S+)"
    r"|range\s+from\s+(?P<from>\S+)\s+to\s+(?P<to>\S+)\s+step\s+(?P<step>\S+))"
    r"\s+(?P<expr>.+)$"
)


def _split_series_line(line: str) -> tuple[str, str]:
    """'m{a="b c"} 1 2' → ('m{a="b c"}', '1 2'): the label set may hold
    spaces inside quoted values, so split after the matching '}'."""
    line = line.strip()
    head = line.split(None, 1)[0]
    if "{" not in head and not line.startswith("{"):
        parts = line.split(None, 1)
        return parts[0], (parts[1] if len(parts) > 1 else "")
    in_q = False
    for i, ch in enumerate(line):
        if ch == '"' and (i == 0 or line[i - 1] != "\\"):
            in_q = not in_q
        elif not in_q and ch == "}":
            return line[: i + 1], line[i + 1 :].strip()
    raise ValueError(f"unterminated label set: {line!r}")


def _desc_key(desc: str) -> tuple:
    if desc in ("", "{}"):
        return ()
    return _labels_key(parse_series_labels(desc))


def _row_key(row, cols) -> tuple:
    if "labels" in cols:
        return _labels_key(dict(row["labels"]))
    return _labels_key(
        {
            c: str(row[c])
            for c in cols
            if c not in ("t", "value", "labels_str") and row[c] is not None
        }
    )


def _fmt_key(key: tuple) -> str:
    return "{" + ",".join(f'{k}="{v}"' for k, v in key) + "}"


def _almost_equal(a: float, b: float) -> bool:
    import math

    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    if math.isinf(a) or math.isinf(b):
        return a == b
    return math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-9)


# upstream promqltest's native-histogram literal, e.g.
#   {{schema:0 sum:12 count:4 z_bucket:1 offset:0 buckets:[1 2 1]}}x5
_HIST_TOK_RE = re.compile(r"\{\{[^}]*\}\}(?:x\d+)?|\S+")


def _parse_hist_literal(tok: str) -> tuple[dict, int]:
    """'{{schema:0 sum:12 count:4 buckets:[1 2 1]}}x5' → (h struct dict,
    repeat count). Supported fields (the engine's positive-bucket
    subset, nativehist.py): schema, sum, count, z_bucket (zero_count),
    offset (index of the first bucket), buckets:[...], and NHCB
    custom_values:[...] (schema -53 — promqltest's
    `{{schema:-53 custom_values:[...] buckets:[...]}}` form, where
    buckets index the custom bounds 0-based)."""
    m = re.fullmatch(r"\{\{([^}]*)\}\}(?:x(\d+))?", tok)
    if m is None:
        raise ValueError(f"bad histogram literal: {tok!r}")
    # like the float expanding notation, xN emits N+1 samples
    body, rep = m.group(1), int(m.group(2) or 0) + 1
    h = {"count": 0.0, "sum": 0.0, "zero_count": 0.0, "schema": 0,
         "custom_values": None}
    buckets: list[float] = []
    offset = 0
    for fm in re.finditer(r"(\w+):(\[[^\]]*\]|\S+)", body):
        key, val = fm.group(1), fm.group(2)
        if key == "buckets":
            buckets = [float(x) for x in val[1:-1].split()]
        elif key == "custom_values":
            h["custom_values"] = [float(x) for x in val[1:-1].split()]
        elif key == "schema":
            h["schema"] = int(val)
        elif key == "offset":
            offset = int(val)
        elif key == "sum":
            h["sum"] = float(val)
        elif key == "count":
            h["count"] = float(val)
        elif key == "z_bucket":
            h["zero_count"] = float(val)
        else:
            raise ValueError(f"unsupported histogram field {key!r} in {tok!r}")
    h["buckets"] = [
        (offset + k, c) for k, c in enumerate(buckets) if c != 0.0
    ]
    if h["custom_values"] is not None and h["schema"] != -53:
        raise ValueError(f"custom_values requires schema:-53 in {tok!r}")
    return h, rep


def run_promql_tests(spark, path: str, tmp_dir: str | None = None) -> list[str]:
    """Run one promqltest script file against the engine; returns
    failure strings (empty = pass). Each `load` appends to the current
    store; `clear` starts a fresh one; every eval is a bounded
    eval_range_db plan — the exact production read path."""
    import math  # noqa: F401  (used via _almost_equal)
    import tempfile

    from tsdb_spark.db import DB
    from tsdb_spark.promql import eval_hist_range_db, eval_range_db

    with open(path) as f:
        raw = f.read().splitlines()

    # group into (lineno, command, [body lines])
    blocks: list[tuple[int, str, list[str]]] = []
    for ln, line in enumerate(raw, 1):
        if not line.strip() or line.lstrip().startswith("#"):
            continue
        if line[0] not in (" ", "\t"):
            blocks.append((ln, line.strip(), []))
        else:
            if not blocks:
                raise ValueError(f"{path}:{ln}: body line before any command")
            blocks[-1][2].append(line.strip())

    root = tempfile.mkdtemp(prefix="promqltest_", dir=tmp_dir)
    n_db = 0
    db = DB.create(spark, os.path.join(root, f"db{n_db}"), block_width_ms=3_600_000)
    failures: list[str] = []
    # stores that received native-histogram samples evaluate through
    # the histograms table (eval_hist_range_db); float and histogram
    # series don't mix within one store section. Keyed on the store
    # INDEX n_db — id(db) can be reused by CPython after a `clear`
    # garbage-collects the previous DB object
    has_hist: set[int] = set()

    for ln, cmd_line, body in blocks:
        where = f"{os.path.basename(path)}:{ln}"
        if cmd_line == "clear":
            n_db += 1
            db = DB.create(
                spark, os.path.join(root, f"db{n_db}"), block_width_ms=3_600_000
            )
            continue
        if cmd_line.startswith("load"):
            interval = _duration_ms(cmd_line.split(None, 1)[1])
            rows = []
            hrows = []
            for b in body:
                desc, vals = _split_series_line(b)
                labels = parse_series_labels(desc)
                i = 0
                for tok in _HIST_TOK_RE.findall(vals):
                    if tok.startswith("{{"):
                        h, rep = _parse_hist_literal(tok)
                        for _ in range(rep):
                            hrows.append(
                                (
                                    labels,
                                    i * interval,
                                    (
                                        h["count"],
                                        h["sum"],
                                        h["zero_count"],
                                        h["schema"],
                                        h["buckets"],
                                        h.get("custom_values"),
                                    ),
                                )
                            )
                            i += 1
                        continue
                    for v in parse_series_values(tok):
                        if v is not None:
                            rows.append((labels, i * interval, float(v)))
                        i += 1
            if rows:
                db.append(
                    spark.createDataFrame(
                        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
                    )
                )
            if hrows:
                from tsdb_spark.nativehist import HIST_TYPE

                db.append_histograms(
                    spark.createDataFrame(
                        hrows,
                        f"labels MAP<STRING,STRING>, t LONG, h {HIST_TYPE}",
                    )
                )
                has_hist.add(n_db)
            continue
        m = _EVAL_CMD_RE.match(cmd_line)
        if m is None:
            raise ValueError(f"{where}: unrecognized command: {cmd_line!r}")
        cmd, expr = m.group("cmd"), m.group("expr").strip()
        # the newer upstream `expect` directive form (promqltest 3.x):
        # indented `expect fail [msg:|regexp: ...]` / `expect ordered` /
        # `expect [no_]warn|[no_]info [msg:|regexp: ...]` lines under a
        # plain `eval` — fail/ordered map onto the classic command
        # variants; warn/info assert against the annotation channel
        # (promql.collect_annotations).
        exp_fail_want: tuple[str, str] | None = None
        # (kind, want_present, matcher) — matcher None = any
        ann_expects: list[tuple[str, bool, tuple[str, str] | None]] = []
        directives = [b for b in body if b.startswith("expect ")]
        body = [b for b in body if not b.startswith("expect ")]
        for d in directives:
            kind = d.split()[1] if len(d.split()) > 1 else ""
            if kind == "fail":
                cmd = "eval_fail"
                rest = d[len("expect fail"):].strip()
                if rest.startswith("msg:"):
                    exp_fail_want = ("msg", rest[len("msg:"):].strip())
                elif rest.startswith("regexp:"):
                    exp_fail_want = ("regexp", rest[len("regexp:"):].strip())
            elif kind == "ordered":
                cmd = "eval_ordered"
            elif kind in ("warn", "info", "no_warn", "no_info"):
                want_present = not kind.startswith("no_")
                ann_kind = kind.removeprefix("no_")
                rest = d.split(None, 2)[2].strip() if len(d.split(None, 2)) > 2 else ""
                matcher: tuple[str, str] | None = None
                if rest.startswith("msg:"):
                    matcher = ("msg", rest[len("msg:"):].strip())
                elif rest.startswith("regexp:"):
                    matcher = ("regexp", rest[len("regexp:"):].strip())
                elif rest:
                    raise ValueError(
                        f"{where}: unsupported expect annotation form: {d!r}"
                    )
                ann_expects.append((ann_kind, want_present, matcher))
            else:
                raise ValueError(
                    f"{where}: unsupported expect directive: {d!r}"
                )
        if m.group("at") is not None:
            start = end = _duration_ms(m.group("at"))
            step = 60_000
        else:
            start = _duration_ms(m.group("from"))
            end = _duration_ms(m.group("to"))
            step = max(_duration_ms(m.group("step")), 1)
        grid = list(range(start, end + 1, step))

        try:
            ev = eval_hist_range_db if n_db in has_hist else eval_range_db
            out = ev(db, expr, start, end, step)
            rows = out.collect()
        except Exception as e:  # noqa: BLE001 — eval_fail asserts on this
            if cmd == "eval_fail":
                msg = str(e)
                checks = [
                    (
                        "msg"
                        if b.startswith("expected_fail_message")
                        else "regexp",
                        b.split(None, 1)[1],
                    )
                    for b in body
                    if b.startswith(
                        ("expected_fail_message", "expected_fail_regexp")
                    )
                ]
                if exp_fail_want is not None:
                    checks.append(exp_fail_want)
                for kind, want in checks:
                    if kind == "msg" and want not in msg:
                        failures.append(
                            f"{where}: fail message {msg!r} "
                            f"does not contain {want!r}"
                        )
                    elif kind == "regexp" and re.search(want, msg) is None:
                        failures.append(
                            f"{where}: fail message {msg!r} "
                            f"does not match /{want}/"
                        )
                continue
            failures.append(f"{where}: {expr!r} raised {e!r}")
            continue
        if cmd == "eval_fail":
            failures.append(f"{where}: {expr!r} succeeded, expected failure")
            continue

        if ann_expects:
            from tsdb_spark.promql import collect_annotations

            anns = collect_annotations(db, expr, start, end, step)
            for ann_kind, want_present, matcher in ann_expects:
                hits = [msg for k, msg in anns if k == ann_kind]
                if matcher is not None:
                    mk, mv = matcher
                    hits = [
                        msg
                        for msg in hits
                        if (mv in msg if mk == "msg" else re.search(mv, msg))
                    ]
                if want_present and not hits:
                    failures.append(
                        f"{where}: {expr!r} expected a {ann_kind} annotation"
                        + (f" matching {matcher[1]!r}" if matcher else "")
                        + f", got {anns!r}"
                    )
                elif not want_present and hits:
                    failures.append(
                        f"{where}: {expr!r} expected no {ann_kind} "
                        f"annotations, got {hits!r}"
                    )

        cols = out.columns
        if cmd == "eval_ordered":
            got_seq = [(_row_key(r, cols), float(r["value"])) for r in rows]
            want_seq = []
            for b in body:
                desc, vals = _split_series_line(b)
                v = parse_series_values(vals)
                if len(v) != 1 or v[0] is None:
                    raise ValueError(f"{where}: instant expects one value: {b!r}")
                want_seq.append((_desc_key(desc), v[0]))
            ok = len(got_seq) == len(want_seq) and all(
                g[0] == w[0] and _almost_equal(g[1], w[1])
                for g, w in zip(got_seq, want_seq)
            )
            if not ok:
                failures.append(
                    f"{where}: {expr!r} ordered mismatch: "
                    f"got {[(_fmt_key(k), v) for k, v in got_seq]}, "
                    f"want {[(_fmt_key(k), v) for k, v in want_seq]}"
                )
            continue

        # unordered instant/range compare over the grid
        got: dict[tuple, dict[int, float]] = {}
        for r in rows:
            got.setdefault(_row_key(r, cols), {})[int(r["t"])] = float(r["value"])
        want: dict[tuple, list[float | None]] = {}
        for b in body:
            desc, vals = _split_series_line(b)
            # bare scalar expectation: `7` with no label set
            if desc not in ("", "{}") and "{" not in desc:
                try:
                    num = float(desc)
                except ValueError:
                    num = None
                if num is not None:
                    # a bare range expectation row can carry MORE values
                    # after the first (`0 50 100`) — desc holds only the
                    # first number, the rest still sit in vals
                    rest = parse_series_values(vals) if vals.strip() else []
                    want.setdefault((), []).extend([num] + rest)
                    continue
            want[_desc_key(desc)] = parse_series_values(vals)
        if start == end:
            for k, v in want.items():
                if len(v) != 1:
                    failures.append(f"{where}: instant expects one value per series")
        extra = set(got) - set(want)
        missing = set(want) - set(got)
        if extra or missing:
            failures.append(
                f"{where}: {expr!r} series mismatch: unexpected "
                f"{[_fmt_key(k) for k in sorted(extra)]}, missing "
                f"{[_fmt_key(k) for k in sorted(missing)]} "
                f"(got {[(_fmt_key(k), got[k]) for k in sorted(got)]})"
            )
            continue
        for k, exp_vals in want.items():
            series = got.get(k, {})
            if len(exp_vals) > len(grid):
                # a mis-stepped expectation must fail loudly, not pass
                # vacuously with its surplus values truncated
                failures.append(
                    f"{where}: {expr!r} {_fmt_key(k)}: expectation has "
                    f"{len(exp_vals)} values but the eval grid has only "
                    f"{len(grid)} steps"
                )
                continue
            padded = list(exp_vals) + [None] * (len(grid) - len(exp_vals))
            for idx, t in enumerate(grid):
                ev = padded[idx]
                if ev is None:
                    if t in series:
                        failures.append(
                            f"{where}: {expr!r} {_fmt_key(k)} @ {t}ms: "
                            f"unexpected sample {series[t]}"
                        )
                elif t not in series:
                    failures.append(
                        f"{where}: {expr!r} {_fmt_key(k)} @ {t}ms: "
                        f"missing sample, want {ev}"
                    )
                elif not _almost_equal(series[t], ev):
                    failures.append(
                        f"{where}: {expr!r} {_fmt_key(k)} @ {t}ms: "
                        f"got {series[t]}, want {ev}"
                    )
    return failures
