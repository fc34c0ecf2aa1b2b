"""Alertmanager notification sending (notifier/notifier.go semantics;
Alertmanager api/v2 JSON schema)."""

import http.server
import json
import threading

from tsdb_spark.notifier import Notifier


class _CapturingAM:
    """Minimal Alertmanager stub: records every api/v2/alerts POST."""

    def __init__(self) -> None:
        self.batches: list[list[dict]] = []
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n)
                assert self.path == "/api/v2/alerts"
                outer.batches.append(json.loads(body))
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def log_message(self, *a):
                pass

        self.srv = http.server.HTTPServer(("127.0.0.1", 0), H)
        self.url = f"http://127.0.0.1:{self.srv.server_address[1]}"
        threading.Thread(target=self.srv.serve_forever, daemon=True).start()

    def stop(self):
        self.srv.shutdown()


def test_firing_resolved_lifecycle():
    am = _CapturingAM()
    try:
        n = Notifier([am.url], external_labels={"cluster": "east"})
        fire = [{"labels": {"alertname": "Hi", "sev": "page"},
                 "annotations": {"summary": "too high"}}]
        # tick 1: new firing alert
        assert n.notify(fire, 60_000, interval_ms=60_000) == 1
        [batch1] = am.batches
        [a] = batch1
        assert a["labels"] == {"alertname": "Hi", "sev": "page",
                               "cluster": "east"}
        assert a["annotations"] == {"summary": "too high"}
        assert a["startsAt"] == "1970-01-01T00:01:00Z"
        # validity window: now + 4 intervals
        assert a["endsAt"] == "1970-01-01T00:05:00Z"

        # tick 2: still firing — startsAt stays the FIRST-seen time
        n.notify(fire, 120_000, interval_ms=60_000)
        [a2] = am.batches[1]
        assert a2["startsAt"] == "1970-01-01T00:01:00Z"
        assert a2["endsAt"] == "1970-01-01T00:06:00Z"

        # tick 3: gone — one RESOLVED notification (endsAt = now),
        # registry emptied
        n.notify([], 180_000, interval_ms=60_000)
        [a3] = am.batches[2]
        assert a3["endsAt"] == "1970-01-01T00:03:00Z"
        assert a3["startsAt"] == "1970-01-01T00:01:00Z"
        # RESOLVED carries the alert's annotations like upstream
        # (notifier.go keeps the full alert; Alertmanager templates
        # them into the resolved page)
        assert a3["annotations"] == {"summary": "too high"}
        assert n.active == {}

        # tick 4: nothing active, nothing sent
        assert n.notify([], 240_000) == 0
        assert len(am.batches) == 3
        assert n.send_errors == 0
    finally:
        am.stop()


def test_failing_alertmanager_counts_not_raises():
    n = Notifier(["http://127.0.0.1:1"])  # nothing listens there
    sent = n.notify([{"labels": {"alertname": "x"}}], 1_000)
    assert sent == 1 and n.send_errors == 1


def test_manager_ticks_notify(spark, tmp_path):
    """End-to-end: the rule manager evaluates an alert group and the
    firing set reaches the (stub) Alertmanager; when the condition
    clears, the next tick resolves it."""
    from pyspark.sql import functions as F  # noqa: F401

    from tsdb_spark import DB
    from tsdb_spark.manager import Manager
    from tsdb_spark.rules import AlertRule

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=3_600_000)
    rows = [({"__name__": "m", "job": "api"}, t * 60_000, 10.0)
            for t in range(5)]
    db.append(
        spark.createDataFrame(
            rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
        )
    )
    am = _CapturingAM()
    try:
        notif = Notifier([am.url])
        groups = [{
            "name": "g",
            "interval_ms": 60_000,
            "rules": [AlertRule(name="High", expr="m > 5",
                                annotations=(("summary", "m is high"),))],
        }]
        mgr = Manager(db, groups, notifier=notif)
        mgr.run_pending(4 * 60_000)
        assert len(am.batches) == 1
        labels = {a["labels"]["alertname"] for a in am.batches[0]}
        assert labels == {"High"}
        assert am.batches[0][0]["annotations"] == {"summary": "m is high"}

        # condition clears: later samples below the threshold
        db.append(
            spark.createDataFrame(
                [({"__name__": "m", "job": "api"}, t * 60_000, 1.0)
                 for t in range(5, 10)],
                "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
            )
        )
        mgr.run_pending(9 * 60_000)
        resolved = am.batches[-1]
        assert len(resolved) == 1
        assert resolved[0]["endsAt"] == "1970-01-01T00:09:00Z"
        assert resolved[0]["annotations"] == {"summary": "m is high"}
        assert notif.active == {}
    finally:
        am.stop()


def test_alert_relabel_configs(spark):
    """alerting.alert_relabel_configs (notifier.go relabelAlerts): the
    chain runs over outgoing alerts AFTER external_labels attach — a
    dropped label set silences the alert entirely (no RESOLVED later,
    it was never active), and rewrites land on the wire."""
    from tsdb_spark.relabel import RelabelConfig

    am = _CapturingAM()
    try:
        n = Notifier(
            [am.url],
            external_labels={"cluster": "east"},
            alert_relabel=[
                RelabelConfig(action="drop", source_labels=("alertname",),
                              regex="Noisy.*"),
                RelabelConfig(action="replace", source_labels=("cluster",),
                              regex="(.*)", target_label="site",
                              replacement="site-$1"),
            ],
            spark=spark,
        )
        sent = n.notify(
            [{"labels": {"alertname": "Hot"}, "annotations": {}},
             {"labels": {"alertname": "NoisyDisk"}, "annotations": {}}],
            60_000,
        )
        assert sent == 1
        [batch] = am.batches
        [a] = batch
        assert a["labels"]["alertname"] == "Hot"
        assert a["labels"]["site"] == "site-east"  # relabel saw externals
        # the dropped alert never entered the registry — nothing to
        # resolve at the next tick
        assert len(n.active) == 1
        n.notify([], 120_000)
        assert len(am.batches[-1]) == 1  # one RESOLVED, for Hot only
    finally:
        am.stop()
