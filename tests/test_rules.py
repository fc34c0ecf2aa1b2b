"""Recording rules: evaluate → append → re-select round trip, static
label override, and rule layering (rules/recording.go semantics on
DB.append)."""

import pytest
from pyspark.sql import functions as F

from tsdb_spark import DB, eq
from tsdb_spark.promql import eval_range_db
from tsdb_spark.rules import Rule, record, rule_frame

WIDTH = 3_600_000


@pytest.fixture()
def store(spark, tmp_path):
    rows = []
    for s in ("a", "b"):
        for i in range(40):
            rows.append(({"__name__": "m", "s": s}, i * 60_000,
                         float(i if s == "a" else 2 * i)))
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    db.append(spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))
    return db


def test_rule_roundtrip_matches_direct_eval(store):
    rule = Rule("job:m:sum10m", "sum_over_time(m[10m])")
    record(store, [rule], 600_000, 2_000_000, 300_000)
    back = {
        (r["labels_str"], r["t"]): r["v"]
        for r in store.querier(0, 3_000_000)
        .select([eq("__name__", "job:m:sum10m")])
        .select("labels_str", "t", "v")
        .collect()
    }
    # the range fn drops __name__ (upstream semantics); the recording
    # rule stamps the rule name back on, so re-insert it for comparison
    direct = {
        (r["labels_str"].replace("{", '{__name__="job:m:sum10m",', 1), r["t"]): r["value"]
        for r in eval_range_db(store, "sum_over_time(m[10m])", 600_000, 2_000_000, 300_000).collect()
    }
    assert back == direct and back


def test_static_labels_override_and_grouped_shape(store):
    rule = Rule(
        "job:m:total",
        "sum by (s) (sum_over_time(m[10m]))",
        labels=(("s", "forced"), ("env", "prod")),
    )
    frame = rule_frame(store, rule, 600_000, 1_200_000, 300_000)
    rows = frame.collect()
    assert rows
    for r in rows:
        lab = r["labels"]
        assert lab["__name__"] == "job:m:total"
        assert lab["s"] == "forced" and lab["env"] == "prod"


def test_layered_rules_sequential(store):
    record(
        store,
        [
            Rule("l1", "sum by (s) (count_over_time(m[10m]))"),
            Rule("l2", 'sum({__name__="l1"})'),
        ],
        600_000,
        1_200_000,
        300_000,
    )
    l2 = store.querier(0, 2_000_000).select([eq("__name__", "l2")]).collect()
    assert l2 and all(r["v"] == 20.0 for r in l2)  # 2 series x 10 samples


def test_alert_rule_states(store):
    # series a: v = i at t = i*60s (40 samples); alert when
    # avg_over_time(m[5m]) > threshold chosen so series a fires late
    # and series b (v = 2i) fires earlier — check pending → firing
    from tsdb_spark.rules import AlertRule, alerts_frame

    rule = AlertRule(
        "hi_m",
        "avg_over_time(m[5m]) > 40",
        for_ms=600_000,  # 2 steps on the 5m grid → need 3 consecutive
        labels=(("severity", "page"),),
    )
    rows = alerts_frame(store, rule, 300_000, 2_400_000, 300_000).collect()
    assert rows
    by_key = {}
    for r in rows:
        lab = r["labels"]
        assert lab["__name__"] == "ALERTS"
        assert lab["alertname"] == "hi_m" and lab["severity"] == "page"
        assert r["v"] == 1.0
        by_key[(lab["s"], r["t"])] = lab["alertstate"]
    # model: active at T iff avg of window > 40; firing iff active at
    # T, T-5m, T-10m
    import statistics

    pts = {
        "a": [(i * 60_000, float(i)) for i in range(40)],
        "b": [(i * 60_000, float(2 * i)) for i in range(40)],
    }

    def active(s, T):
        w = [round(v * 100) for t, v in pts[s] if T - 300_000 < t <= T]
        return bool(w) and (sum(w) / len(w) / 100.0) > 40.0

    want = {}
    for s in ("a", "b"):
        for T in range(300_000, 2_400_001, 300_000):
            if active(s, T):
                cont = all(
                    active(s, T - k * 300_000) and T - k * 300_000 >= 300_000
                    for k in (1, 2)
                )
                want[(s, T)] = "firing" if cont else "pending"
    assert by_key == want
    assert "pending" in want.values() and "firing" in want.values()


def test_record_alerts_roundtrip(store):
    from tsdb_spark.rules import AlertRule, record_alerts

    record_alerts(
        store,
        [AlertRule("any_m", "count_over_time(m[5m]) > 0")],
        300_000,
        1_200_000,
        300_000,
    )
    back = store.querier(0, 3_000_000).select([eq("__name__", "ALERTS")]).collect()
    assert back and all(r["v"] == 1.0 for r in back)
    assert all('alertstate="firing"' in r["labels_str"] for r in back)


def test_keep_firing_for_state_machine(spark, tmp_path):
    # oscillating condition: m > 0 toggles per the pattern below; the
    # engine's closed-form grid reading must reproduce the sequential
    # rules/alerting.go machine (pending -> firing -> keep-firing through
    # short gaps -> resolve after keep_firing_for of inactivity)
    from tsdb_spark.rules import AlertRule, alerts_frame

    pattern = [1, 1, 1, 0, 1, 1, 0, 0, 0, 1, 1, 1, 1, 0, 0, 1, 0, 0, 0, 0,
               1, 1, 1, 1, 1]
    step = 60_000
    rows = [({"__name__": "m", "s": "x"}, k * step, float(v))
            for k, v in enumerate(pattern)]
    db = DB.create(spark, str(tmp_path / "kf"), block_width_ms=WIDTH)
    db.append(spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))

    rule = AlertRule("osc", "m > 0", for_ms=2 * step,
                     keep_firing_ms=2 * step)
    got = {
        r["t"]: dict(r["labels"])["alertstate"]
        for r in alerts_frame(
            db, rule, 0, (len(pattern) - 1) * step, step
        ).collect()
    }

    # sequential upstream model
    need, keep = 3, 2 * step
    want, state, run, keep_since = {}, None, 0, None
    for k, act in enumerate(pattern):
        T = k * step
        if act:
            if state != "firing":
                run += 1
                state = "firing" if run >= need else "pending"
            keep_since = None
            want[T] = state
        else:
            run = 0
            if state == "firing":
                if keep_since is None:
                    keep_since = T
                if T - keep_since >= keep:
                    state, keep_since = None, None
                else:
                    want[T] = "firing"
            else:
                state = None
    assert got == want
    assert "pending" in want.values() and "firing" in want.values()
    # keep-firing rows exist at grid points where the expr is INACTIVE
    inactive_firing = [k * step for k, v in enumerate(pattern)
                       if not v and want.get(k * step) == "firing"]
    assert inactive_firing and all(got[t] == "firing" for t in inactive_firing)


def test_keep_firing_zero_unchanged(spark, tmp_path):
    # keep_firing_ms=0 must take the original (cheaper) path: no rows at
    # inactive grid points
    from tsdb_spark.rules import AlertRule, alerts_frame

    step = 60_000
    pattern = [1, 1, 1, 0, 1]
    rows = [({"__name__": "m"}, k * step, float(v))
            for k, v in enumerate(pattern)]
    db = DB.create(spark, str(tmp_path / "kf0"), block_width_ms=WIDTH)
    db.append(spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))
    got = {
        r["t"]: dict(r["labels"])["alertstate"]
        for r in alerts_frame(
            db, AlertRule("osc", "m > 0", for_ms=2 * step), 0, 4 * step, step
        ).collect()
    }
    assert got == {0: "pending", step: "pending", 2 * step: "firing",
                   4 * step: "pending"}


def test_record_alerts_batches_rules_into_one_append(store):
    from tsdb_spark.rules import AlertRule, record_alerts

    rules = [
        AlertRule(name="HighA", expr="sum(m) > 0"),
        AlertRule(name="HighB", expr="sum(m) > 1"),
    ]
    seq = store.meta["next_ingest_seq"]
    record_alerts(store, rules, 600_000, 1_200_000, 300_000)
    # one commit for the whole group, not one per rule
    assert store.meta["next_ingest_seq"] == seq + 1
    names = {
        r.labels["alertname"]
        for r in store.querier(0, 10**13)
        .select([])
        .filter("labels['__name__'] = 'ALERTS'")
        .collect()
    }
    assert names == {"HighA", "HighB"}
