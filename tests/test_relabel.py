"""Relabeling parity fixture (upstream model/relabel/relabel.go
semantics per action, including rule chaining and the `__tmp` scratch
convention). Expected values derive from the documented upstream
behavior: anchored regex, $1/${1} group expansion, md5-tail hashmod,
empty-value strip, sample dropped when the label set empties."""

import hashlib

import pytest
from pyspark.sql import functions as F

from tsdb_spark.relabel import RelabelConfig, apply_relabel, load_relabel_file


def _frame(spark, *label_dicts):
    rows = [(d, i, float(i)) for i, d in enumerate(label_dicts)]
    return spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
    )


def _labels(df):
    return [dict(r["labels"]) for r in df.orderBy("t").collect()]


def test_replace_group_expansion(spark):
    df = _frame(spark, {"a": "foo", "b": "bar", "__name__": "m"})
    out = apply_relabel(
        df,
        [
            RelabelConfig(
                action="replace",
                source_labels=("a", "b"),
                regex="f(.*);(.*)r",
                target_label="d",
                replacement="ch${1}-ch$2",
            )
        ],
    )
    assert _labels(out) == [
        {"a": "foo", "b": "bar", "__name__": "m", "d": "choo-chba"}
    ]


def test_replace_no_match_is_noop(spark):
    df = _frame(spark, {"a": "boo", "d": "keepme"})
    out = apply_relabel(
        df,
        [
            RelabelConfig(
                action="replace",
                source_labels=("a",),
                regex="f(.*)",
                target_label="d",
                replacement="x$1",
            )
        ],
    )
    assert _labels(out) == [{"a": "boo", "d": "keepme"}]


def test_replace_empty_result_deletes_target(spark):
    df = _frame(spark, {"a": "foo", "d": "gone"})
    out = apply_relabel(
        df,
        [
            RelabelConfig(
                action="replace",
                source_labels=("a",),
                regex="foo",
                target_label="d",
                replacement="",
            )
        ],
    )
    assert _labels(out) == [{"a": "foo"}]


def test_replace_dynamic_target_label(spark):
    # target_label itself expands capture groups (relabel.go expands
    # the TargetLabel template too)
    df = _frame(spark, {"module": "http_2xx", "a": "1"})
    out = apply_relabel(
        df,
        [
            RelabelConfig(
                action="replace",
                source_labels=("module",),
                regex="(.*)_(.*)",
                target_label="probe_$2",
                replacement="$1",
            )
        ],
    )
    assert _labels(out) == [
        {"module": "http_2xx", "a": "1", "probe_2xx": "http"}
    ]


def test_keep_and_drop(spark):
    df = _frame(spark, {"job": "api"}, {"job": "batch"}, {"job": "apix"})
    kept = apply_relabel(
        df, [RelabelConfig(action="keep", source_labels=("job",), regex="api")]
    )
    # anchored: "apix" does NOT match "api"
    assert _labels(kept) == [{"job": "api"}]
    dropped = apply_relabel(
        df, [RelabelConfig(action="drop", source_labels=("job",), regex="api.*")]
    )
    assert _labels(dropped) == [{"job": "batch"}]


def test_keep_missing_source_label_joins_empty(spark):
    # a missing source label contributes "", like upstream's Get()
    df = _frame(spark, {"a": "x"}, {"a": "x", "b": "y"})
    out = apply_relabel(
        df,
        [
            RelabelConfig(
                action="keep", source_labels=("a", "b"), regex="x;"
            )
        ],
    )
    assert _labels(out) == [{"a": "x"}]


def test_keepequal_dropequal(spark):
    df = _frame(
        spark,
        {"a": "v", "b": "v", "__name__": "m"},
        {"a": "v", "b": "w", "__name__": "m"},
    )
    ke = apply_relabel(
        df,
        [
            RelabelConfig(
                action="keepequal", source_labels=("a",), target_label="b"
            )
        ],
    )
    assert [d["b"] for d in _labels(ke)] == ["v"]
    de = apply_relabel(
        df,
        [
            RelabelConfig(
                action="dropequal", source_labels=("a",), target_label="b"
            )
        ],
    )
    assert [d["b"] for d in _labels(de)] == ["w"]


def test_hashmod_matches_upstream_md5_tail(spark):
    # relabel.go: binary.BigEndian.Uint64(md5(val)[8:]) % modulus
    val = "api;i-123"
    want = int.from_bytes(hashlib.md5(val.encode()).digest()[8:], "big") % 7
    df = _frame(spark, {"job": "api", "instance": "i-123"})
    out = apply_relabel(
        df,
        [
            RelabelConfig(
                action="hashmod",
                source_labels=("job", "instance"),
                modulus=7,
                target_label="__tmp_shard",
            )
        ],
    )
    assert _labels(out)[0]["__tmp_shard"] == str(want)


def test_labelmap(spark):
    df = _frame(
        spark,
        {"__meta_kubernetes_pod": "p1", "__meta_kubernetes_ns": "ns1",
         "job": "k8s"},
    )
    out = apply_relabel(
        df,
        [
            RelabelConfig(
                action="labelmap", regex="__meta_kubernetes_(.*)",
                replacement="k8s_$1",
            )
        ],
    )
    assert _labels(out) == [
        {
            "__meta_kubernetes_pod": "p1",
            "__meta_kubernetes_ns": "ns1",
            "job": "k8s",
            "k8s_pod": "p1",
            "k8s_ns": "ns1",
        }
    ]


def test_labeldrop_labelkeep(spark):
    df = _frame(spark, {"__meta_a": "1", "job": "j", "instance": "i"})
    ld = apply_relabel(df, [RelabelConfig(action="labeldrop", regex="__meta_.*")])
    assert _labels(ld) == [{"job": "j", "instance": "i"}]
    lk = apply_relabel(
        df, [RelabelConfig(action="labelkeep", regex="job|instance")]
    )
    assert _labels(lk) == [{"job": "j", "instance": "i"}]


def test_lowercase_uppercase(spark):
    df = _frame(spark, {"env": "ProD", "__name__": "m"})
    lo = apply_relabel(
        df,
        [
            RelabelConfig(
                action="lowercase", source_labels=("env",), target_label="env"
            )
        ],
    )
    assert _labels(lo)[0]["env"] == "prod"
    up = apply_relabel(
        df,
        [
            RelabelConfig(
                action="uppercase", source_labels=("env",), target_label="ENV"
            )
        ],
    )
    assert _labels(up)[0]["ENV"] == "PROD"


def test_rule_chaining_with_tmp_convention(spark):
    # the canonical sharding chain: hashmod into __tmp, keep shard 0,
    # drop the scratch label — each rule sees the previous one's output
    df = _frame(
        spark,
        {"job": "api", "instance": "i-1"},
        {"job": "api", "instance": "i-2"},
        {"job": "api", "instance": "i-3"},
    )
    rules = [
        RelabelConfig(
            action="hashmod", source_labels=("instance",), modulus=2,
            target_label="__tmp_hash",
        ),
        RelabelConfig(action="keep", source_labels=("__tmp_hash",), regex="0"),
        RelabelConfig(action="labeldrop", regex="__tmp_.*"),
    ]
    out = _labels(apply_relabel(df, rules))
    want = [
        i
        for i in ("i-1", "i-2", "i-3")
        if int.from_bytes(hashlib.md5(i.encode()).digest()[8:], "big") % 2 == 0
    ]
    assert [d["instance"] for d in out] == want
    assert all("__tmp_hash" not in d for d in out)


def test_empty_value_strip_and_empty_set_drop(spark):
    df = _frame(spark, {"a": "x", "b": "y"})
    # replace b's value with "" via a matched empty replacement on a
    # DIFFERENT target, then drop every label → the sample itself drops
    out = apply_relabel(
        df,
        [
            RelabelConfig(
                action="replace", source_labels=("a",), regex="x",
                target_label="b", replacement="",
            )
        ],
    )
    assert _labels(out) == [{"a": "x"}]
    gone = apply_relabel(df, [RelabelConfig(action="labeldrop", regex=".*")])
    assert gone.count() == 0


def test_validation_errors():
    with pytest.raises(ValueError):
        RelabelConfig(action="nope")
    with pytest.raises(ValueError):
        RelabelConfig(action="hashmod", target_label="t")  # no modulus
    with pytest.raises(ValueError):
        RelabelConfig(action="replace")  # no target_label


def test_load_relabel_file(tmp_path):
    p = tmp_path / "relabel.yml"
    p.write_text(
        """
- action: keep
  source_labels: [job]
  regex: api
- source_labels: [instance]
  target_label: node
"""
    )
    rules = load_relabel_file(str(p))
    assert rules[0].action == "keep"
    assert rules[0].source_labels == ("job",)
    assert rules[1].action == "replace"  # upstream default
    assert rules[1].replacement == "$1"
    assert rules[1].target_label == "node"


def test_scrape_pass_applies_metric_relabeling(spark, tmp_path):
    """End-to-end: a live scrape with relabel_configs drops a metric
    and rewrites a label, while the `up` synthetic stays exempt."""
    import http.server
    import threading

    from tsdb_spark import DB
    from tsdb_spark.scrape import Target, scrape_pass

    body = (
        'reqs{path="/a"} 1 1000\n'
        'reqs{path="/b"} 2 1000\n'
        'noise_total{x="1"} 9 1000\n'
    )

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            data = body.encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        db = DB.create(spark, str(tmp_path / "db"), block_width_ms=3_600_000)
        rules = [
            RelabelConfig(
                action="drop", source_labels=("__name__",), regex="noise_.*"
            ),
            RelabelConfig(
                action="replace", source_labels=("path",),
                regex="/(.*)", target_label="route", replacement="$1",
            ),
            RelabelConfig(action="labeldrop", regex="path"),
        ]
        scrape_pass(
            spark,
            db,
            [Target(url=f"http://127.0.0.1:{port}/metrics", job="t")],
            scrape_time_ms=1_000,
            relabel_configs=rules,
        )
        rows = (
            db.querier(0, 10_000)
            .select([])
            .select("labels", "v")
            .collect()
        )
        by_name = {}
        for r in rows:
            by_name.setdefault(dict(r["labels"])["__name__"], []).append(
                (dict(r["labels"]), r["v"])
            )
        assert "noise_total" not in by_name
        assert sorted(d["route"] for d, _ in by_name["reqs"]) == ["a", "b"]
        assert all("path" not in d for d, _ in by_name["reqs"])
        # up synthetic exempt from the metric relabel chain
        assert by_name["up"][0][1] == 1.0
    finally:
        srv.shutdown()


def test_relabel_targets_drop_and_rewrite(spark):
    """Target relabeling (SD-time relabel_configs): keep/drop decides
    which targets are scraped at all; rewrites land on job/instance and
    the extra label set."""
    from tsdb_spark.relabel import relabel_targets
    from tsdb_spark.scrape import Target

    targets = [
        Target(url="http://a:9100/metrics", job="node", instance="a:9100"),
        Target(url="http://b:9100/metrics", job="node", instance="b:9100"),
        Target(url="http://c:8080/metrics", job="api", instance="c:8080"),
    ]
    rules = [
        RelabelConfig(action="drop", source_labels=("instance",), regex="b:.*"),
        RelabelConfig(
            action="replace", source_labels=("job",), regex="(.*)",
            target_label="env", replacement="prod-$1",
        ),
        RelabelConfig(
            action="replace", source_labels=("instance",),
            regex="([^:]+):.*", target_label="instance", replacement="$1",
        ),
    ]
    out = relabel_targets(spark, targets, rules)
    assert [(t.job, t.instance, dict(t.labels)) for t in out] == [
        ("node", "a", {"env": "prod-node"}),
        ("api", "c", {"env": "prod-api"}),
    ]


def test_tmpl_re2_expand_parity():
    """RE2 Expand template semantics survive the Java rewrite
    (relabel.go uses regexp.ExpandString): out-of-range and undeclared
    group references expand to '' (Java regexp_replace would THROW at
    runtime on a config that is valid under Prometheus), `$$` and
    dangling `$` are literal, backslashes are not Java escapes."""
    from tsdb_spark.relabel import _tmpl

    assert _tmpl("$1-${2}", "(a)(b)") == "$1-$2"
    assert _tmpl("$2", "(a)") == ""            # out-of-range → ''
    assert _tmpl("x${3}y", "(a)") == "xy"
    assert _tmpl("$$1", "(a)") == "\\$1"       # $$ → literal $
    assert _tmpl("a$", "(a)") == "a\\$"        # dangling $ → literal
    assert _tmpl("${foo}", "(?P<foo>a)") == "${foo}"
    assert _tmpl("$foo", "(?P<foo>a)") == "${foo}"
    assert _tmpl("$bar", "(a)") == ""          # undeclared name → ''
    assert _tmpl("$1x", "(a)") == ""           # name '1x', not $1+x
    assert _tmpl("a\\b", "(a)") == "a\\\\b"    # literal backslash
    # pattern Python can't parse → references pass through unvalidated
    assert _tmpl("$1 ${nm}", "(?<nm>a)") == "$1 ${nm}"


def test_replace_with_out_of_range_group_is_empty(spark):
    """End-to-end: replacement '$2' against a one-group regex deletes
    the target label (empty expansion ⇒ '' ⇒ delete) instead of
    throwing inside Spark's regexp_replace."""
    df = spark.createDataFrame(
        [({"__name__": "m", "path": "/x"},)], "labels MAP<STRING,STRING>"
    )
    rules = [
        RelabelConfig(
            action="replace", source_labels=("path",), regex="(/.*)",
            target_label="extra", replacement="$2",
        ),
        RelabelConfig(
            action="replace", source_labels=("path",), regex="(/.*)",
            target_label="kept", replacement="p=$1 lit=$$",
        ),
    ]
    [row] = apply_relabel(df, rules).collect()
    lab = dict(row["labels"])
    assert "extra" not in lab
    assert lab["kept"] == "p=/x lit=$"


def test_process_labels_parity_with_column_engine(spark):
    """The pure-Python interpreter (process_labels — the alert-batch
    path) and the Column engine (apply_relabel — the scrape hot path)
    are the SAME semantics: every action, template expansion quirks,
    chaining, empty-strip, and set-drop, over a grid of label sets.
    This parity pin is what lets the notifier evaluate
    alert_relabel_configs without launching a Spark job per tick."""
    from tsdb_spark.relabel import process_labels

    chains = [
        [RelabelConfig(action="replace", source_labels=("a", "b"),
                       regex="(.*);(.*)", target_label="ab",
                       replacement="$1-$2")],
        [RelabelConfig(action="replace", source_labels=("a",),
                       regex="f(o+)", target_label="t_$1",
                       replacement="${1}x$9")],  # dynamic tgt, $9 -> ''
        [RelabelConfig(action="replace", source_labels=("a",),
                       regex="nomatch.*", target_label="t",
                       replacement="v")],
        [RelabelConfig(action="replace", source_labels=("a",),
                       regex="(.*)", target_label="a",
                       replacement="")],  # empty result deletes
        [RelabelConfig(action="keep", source_labels=("__name__",),
                       regex="m|k.*")],
        [RelabelConfig(action="drop", source_labels=("__name__", "a"),
                       regex="m;foo")],
        [RelabelConfig(action="keepequal", source_labels=("a",),
                       target_label="b")],
        [RelabelConfig(action="dropequal", source_labels=("a",),
                       target_label="b")],
        [RelabelConfig(action="lowercase", source_labels=("mixed",),
                       target_label="lc"),
         RelabelConfig(action="uppercase", source_labels=("mixed",),
                       target_label="uc")],
        [RelabelConfig(action="hashmod", source_labels=("a",),
                       modulus=7, target_label="shard"),
         RelabelConfig(action="keep", source_labels=("shard",),
                       regex="[0-3]")],
        [RelabelConfig(action="labelmap", regex="__meta_(.+)",
                       replacement="$1")],
        [RelabelConfig(action="labeldrop", regex="__meta_.*")],
        [RelabelConfig(action="labelkeep", regex="__name__|a")],
        # chaining with the __tmp scratch convention
        [RelabelConfig(action="replace", source_labels=("a",),
                       regex="(.*)", target_label="__tmp",
                       replacement="$1!"),
         RelabelConfig(action="replace", source_labels=("__tmp",),
                       regex="(.*)", target_label="out",
                       replacement="<$1>"),
         RelabelConfig(action="labeldrop", regex="__tmp")],
    ]
    labelsets = [
        {"__name__": "m", "a": "foo", "b": "bar", "mixed": "AbC",
         "__meta_dc": "east"},
        {"__name__": "keep_me", "a": "foo", "b": "foo", "mixed": "x"},
        {"__name__": "m", "a": "fooo", "mixed": "Y",
         "__meta_rack": "r1", "__meta_dc": "west"},
        {"a": ""},  # empty-valued label strips; set may empty -> drop
        {"__name__": "m"},
    ]
    for chain in chains:
        df = spark.createDataFrame(
            list(enumerate(labelsets)), "idx LONG, labels MAP<STRING,STRING>"
        )
        col = {r["idx"]: dict(r["labels"])
               for r in apply_relabel(df, chain).collect()}
        for i, lab in enumerate(labelsets):
            want = col.get(i)
            got = process_labels(lab, chain)
            assert got == want, (
                f"parity break: chain={chain!r} labels={lab!r} "
                f"column={want!r} python={got!r}"
            )


def test_notifier_alert_relabel_without_spark():
    """Alert relabeling is driver-side pure Python: a Notifier with
    alert_relabel_configs works with NO SparkSession at all — notify()
    ticks launch zero Spark jobs."""
    from tsdb_spark.notifier import Notifier
    from tsdb_spark.relabel import RelabelConfig

    n = Notifier(
        [],  # no AMs: state machine only
        external_labels={"cluster": "east"},
        alert_relabel=[
            RelabelConfig(action="drop", source_labels=("alertname",),
                          regex="Noisy.*"),
            RelabelConfig(action="replace", source_labels=("cluster",),
                          regex="(.*)", target_label="site",
                          replacement="site-$1"),
        ],
        spark=None,
    )
    sent = n.notify(
        [{"labels": {"alertname": "Hot"}, "annotations": {}},
         {"labels": {"alertname": "NoisyDisk"}, "annotations": {}}],
        60_000,
    )
    assert sent == 1
    [key] = n.active
    assert dict(key)["site"] == "site-east"
