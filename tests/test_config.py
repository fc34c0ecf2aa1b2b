"""Full prometheus.yml configuration surface (config/config.go):
global / scrape_configs (static + file SD) / rule_files / alerting /
remote_write — parsed by config.load_config and wired end-to-end by
`serve --config`."""

import http.server
import json
import os
import threading
import time
import urllib.request

import pytest

from tsdb_spark import DB
from tsdb_spark.config import (
    PrometheusConfig,
    RemoteWriteConfig,
    load_config,
)

WIDTH = 3_600_000


class _MetricsEndpoint:
    """Tiny exposition endpoint: serves whatever text the test sets."""

    def __init__(self, text: str) -> None:
        self.text = text
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                body = outer.text.encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self.srv = http.server.HTTPServer(("127.0.0.1", 0), H)
        self.port = self.srv.server_address[1]
        self.addr = f"127.0.0.1:{self.port}"
        threading.Thread(target=self.srv.serve_forever, daemon=True).start()

    def stop(self):
        self.srv.shutdown()


class _CapturingReceiver:
    """Records POST bodies (remote-write receiver / Alertmanager)."""

    def __init__(self) -> None:
        self.posts: list[tuple[str, bytes]] = []
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                n = int(self.headers.get("Content-Length") or 0)
                outer.posts.append((self.path, self.rfile.read(n)))
                self.send_response(204)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def log_message(self, *a):
                pass

        self.srv = http.server.HTTPServer(("127.0.0.1", 0), H)
        self.port = self.srv.server_address[1]
        self.url = f"http://127.0.0.1:{self.port}"
        threading.Thread(target=self.srv.serve_forever, daemon=True).start()

    def stop(self):
        self.srv.shutdown()


def _write_full_config(tmp_path, sd_file="sd_targets.json") -> str:
    (tmp_path / "rules_a.yml").write_text(
        "groups:\n"
        "- name: g1\n"
        "  rules:\n"
        "  - record: job:one\n"
        "    expr: vector(1)\n"
        "- name: g2\n"
        "  interval: 5m\n"
        "  rules:\n"
        "  - alert: Always\n"
        "    expr: vector(1)\n"
    )
    (tmp_path / sd_file).write_text(json.dumps(
        [{"targets": ["10.0.0.9:9100"], "labels": {"rack": "r1"}}]
    ))
    cfg = tmp_path / "prometheus.yml"
    cfg.write_text(
        "global:\n"
        "  scrape_interval: 30s\n"
        "  evaluation_interval: 45s\n"
        "  external_labels:\n"
        "    cluster: east\n"
        "    replica: a\n"
        "scrape_configs:\n"
        "- job_name: node\n"
        "  static_configs:\n"
        "  - targets: ['10.0.0.1:9100']\n"
        "    labels: {env: prod}\n"
        "- job_name: dyn\n"
        "  scrape_interval: 5s\n"
        f"  file_sd_configs:\n"
        f"  - files: ['{sd_file}']\n"
        "    refresh_interval: 1s\n"
        "rule_files:\n"
        "- 'rules_*.yml'\n"
        "alerting:\n"
        "  alertmanagers:\n"
        "  - scheme: http\n"
        "    path_prefix: /am\n"
        "    static_configs:\n"
        "    - targets: ['am1:9093', 'am2:9093']\n"
        "remote_write:\n"
        "- url: http://rw1/api/v1/write\n"
        "- url: http://rw2/api/v1/write\n"
        "  protobuf_message: io.prometheus.write.v2.Request\n"
    )
    return str(cfg)


def test_load_config_full_surface(spark, tmp_path):
    """All five top-level prometheus.yml blocks parse (config.go):
    global defaults flow into jobs and rule groups, rule_files glob
    relative to the config file, alertmanagers build URLs from
    scheme/path_prefix/static targets, remote_write carries the wire
    version."""
    cfg = load_config(spark, _write_full_config(tmp_path))
    assert isinstance(cfg, PrometheusConfig)
    assert cfg.scrape_interval_ms == 30_000
    assert cfg.evaluation_interval_ms == 45_000
    assert cfg.external_labels == {"cluster": "east", "replica": "a"}

    node, dyn = cfg.scrape_jobs
    assert node.name == "node"
    assert node.interval_ms == 30_000  # inherits global
    [t] = node.targets
    assert t.url == "http://10.0.0.1:9100/metrics"
    assert dict(t.labels) == {"env": "prod"}
    assert dyn.interval_ms == 5_000  # job override
    assert dyn.targets == [] and len(dyn.file_sd) == 1
    assert dyn.file_sd[0].refresh_ms == 1_000
    # file-SD patterns resolve against the config dir
    assert dyn.file_sd[0].files[0].startswith(str(tmp_path))

    assert len(cfg.rule_files) == 1 and cfg.rule_files[0].endswith("rules_a.yml")
    g1, g2 = cfg.rule_groups
    assert g1["interval_ms"] == 45_000  # inherits evaluation_interval
    assert g2["interval_ms"] == 300_000  # own interval wins

    assert cfg.alertmanager_urls == ["http://am1:9093/am", "http://am2:9093/am"]
    rw1, rw2 = cfg.remote_writes
    assert not rw1.v2 and rw2.v2


def test_file_sd_edit_lands_next_resolve(spark, tmp_path):
    """file_sd_configs (discovery/file): a target-file edit is picked
    up on the NEXT resolve (mtime check), added targets go through the
    job's SD-time relabel chain, and removed targets disappear."""
    from tsdb_spark.scrape import FileSD, ScrapeJob
    from tsdb_spark.relabel import RelabelConfig

    sd = tmp_path / "targets.yml"
    sd.write_text(json.dumps([{"targets": ["a:1"], "labels": {"dc": "x"}}]))
    job = ScrapeJob(
        name="dyn",
        targets=[],
        file_sd=[FileSD(files=(str(sd),), refresh_ms=3_600_000)],
        target_relabel=[RelabelConfig(
            action="replace", source_labels=("dc",), regex="(.*)",
            target_label="zone", replacement="zone-$1",
        )],
    )
    t0 = 1_000_000
    [t] = job.resolve_targets(spark, t0)
    assert t.url == "http://a:1/metrics" and dict(t.labels)["zone"] == "zone-x"

    # refresh FAR in the future, but the mtime change forces a re-read
    os.utime(sd)  # ensure a distinct mtime even on coarse clocks
    sd.write_text(json.dumps([
        {"targets": ["a:1"], "labels": {"dc": "x"}},
        {"targets": ["b:2"], "labels": {"dc": "y"}},
    ]))
    urls = {t.url for t in job.resolve_targets(spark, t0 + 1_000)}
    assert urls == {"http://a:1/metrics", "http://b:2/metrics"}

    sd.write_text(json.dumps([{"targets": ["b:2"], "labels": {"dc": "y"}}]))
    [t] = job.resolve_targets(spark, t0 + 2_000)
    assert t.url == "http://b:2/metrics" and dict(t.labels)["zone"] == "zone-y"


def test_file_sd_bad_file_keeps_last_good(spark, tmp_path):
    """An unparseable SD file keeps serving the last good read
    (upstream file discovery keeps the previous target groups)."""
    from tsdb_spark.scrape import FileSD

    sd = tmp_path / "targets.json"
    sd.write_text(json.dumps([{"targets": ["a:1"]}]))
    fsd = FileSD(files=(str(sd),), refresh_ms=0)
    assert fsd.groups(1_000) == [{"targets": ["a:1"], "labels": {}}]
    sd.write_text("{ not: [ yaml")
    assert fsd.groups(2_000) == [{"targets": ["a:1"], "labels": {}}]
    sd.write_text(json.dumps([{"targets": ["b:2"]}]))
    assert fsd.groups(3_000) == [{"targets": ["b:2"], "labels": {}}]


@pytest.mark.slow  # wall-clock scrape/serve soak (r11 lane split)
def test_serve_config_end_to_end(spark, tmp_path):
    """`serve --config prometheus.yml` drives the single-process mode
    with NO other flags: file-SD scrape → store → rules → notifier +
    remote-write forwarding, external_labels on /federate and on
    outgoing alerts; a target-file edit lands in the next scrape pass
    and /api/v1/targets reflects it."""
    import tsdb_spark.api as api_mod
    from tsdb_spark.__main__ import main

    metrics = _MetricsEndpoint(
        "# TYPE temp gauge\ntemp 21.5\n"
    )
    metrics2 = _MetricsEndpoint("# TYPE temp gauge\ntemp 9.0\n")
    am = _CapturingReceiver()
    rw = _CapturingReceiver()
    sd = tmp_path / "sd.json"
    sd.write_text(json.dumps([{"targets": [metrics.addr]}]))
    (tmp_path / "r.yml").write_text(
        "groups:\n"
        "- name: g\n"
        "  interval: 15s\n"
        "  rules:\n"
        "  - record: job:up:count\n"
        "    expr: count(up)\n"
        "  - alert: TargetUp\n"
        "    expr: up == 1\n"
        "    annotations: {summary: it is up}\n"
    )
    cfg = tmp_path / "prometheus.yml"
    cfg.write_text(
        "global:\n"
        "  scrape_interval: 2s\n"
        "  evaluation_interval: 5s\n"
        "  external_labels: {cluster: east}\n"
        "scrape_configs:\n"
        "- job_name: dyn\n"
        "  file_sd_configs:\n"
        "  - files: ['sd.json']\n"
        "    refresh_interval: 1s\n"
        "rule_files: ['r.yml']\n"
        "alerting:\n"
        "  alertmanagers:\n"
        f"  - static_configs: [{{targets: ['127.0.0.1:{am.port}']}}]\n"
        "remote_write:\n"
        f"- url: http://127.0.0.1:{rw.port}/api/v1/write\n"
    )

    # run main() for real, but intercept the blocking serve_forever:
    # the wrapper runs the real server in a thread and blocks main's
    # call until the test finishes, then raises KeyboardInterrupt so
    # main's own shutdown path (stop.set + srv.shutdown) executes.
    real_serve = api_mod.serve
    finished = threading.Event()
    state: dict = {}

    def patched_serve(db, host, port, **kw):
        srv = real_serve(db, host, port, **kw)
        state["db"] = db
        state["port"] = srv.server_address[1]
        threading.Thread(target=srv.serve_forever, daemon=True).start()

        class _Blocking:
            def serve_forever(self_inner):
                finished.wait()
                raise KeyboardInterrupt

            def shutdown(self_inner):
                srv.shutdown()

        return _Blocking()

    api_mod.serve = patched_serve
    store = str(tmp_path / "db")
    t = threading.Thread(
        target=main,
        args=(["serve", store, "--config", str(cfg), "--port", "0"],),
        daemon=True,
    )
    t.start()
    try:
        def wait_for(pred, what, budget_s=120):
            deadline = time.time() + budget_s
            last_err = None
            while time.time() < deadline:
                try:
                    if pred():
                        return
                except Exception as e:  # noqa: BLE001 — poll until deadline
                    last_err = e
                time.sleep(0.5)
            raise AssertionError(
                f"timed out waiting for {what} (last error: {last_err})"
            )

        wait_for(lambda: "port" in state, "server start")
        port = state["port"]

        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=10
            ) as r:
                return r.read().decode()

        # scrape landed: the target's metric is queryable
        wait_for(
            lambda: json.loads(get("/api/v1/query?query=temp"))["data"][
                "result"
            ],
            "scraped sample",
        )
        res = json.loads(get("/api/v1/query?query=temp"))["data"]["result"]
        assert res[0]["metric"]["job"] == "dyn"

        # external_labels flow into /federate where absent
        fed = get("/federate?match[]=temp")
        assert 'cluster="east"' in fed

        # rules evaluate: the recording rule series exists
        wait_for(
            lambda: json.loads(
                get("/api/v1/query?query=job:up:count")
            )["data"]["result"],
            "recording rule output",
        )

        # the alert reached the Alertmanager with the external label
        wait_for(lambda: am.posts, "alertmanager notification")
        path0, body0 = am.posts[0]
        assert path0 == "/api/v2/alerts"
        alerts = json.loads(body0)
        assert any(
            a["labels"].get("alertname") == "TargetUp"
            and a["labels"].get("cluster") == "east"
            for a in alerts
        )

        # remote-write forwarding: the receiver got v1 WriteRequests
        # containing the scraped series
        wait_for(lambda: rw.posts, "remote-write forward")
        from tsdb_spark.sources.remotewrite import decode_write_request

        names = set()
        for path1, body1 in rw.posts:
            assert path1 == "/api/v1/write"
            for labels, _samps in decode_write_request(body1):
                names.add(labels.get("__name__"))
        assert "temp" in names and "up" in names

        # file-SD edit: add a second target — it is scraped and shows
        # in /api/v1/targets on a later pass
        sd.write_text(json.dumps(
            [{"targets": [metrics.addr]}, {"targets": [metrics2.addr]}]
        ))

        def second_target_active():
            data = json.loads(get("/api/v1/targets"))["data"]
            urls = {t["scrapeUrl"] for t in data["activeTargets"]}
            return f"http://{metrics2.addr}/metrics" in urls

        wait_for(second_target_active, "file-SD target addition")

        # ... and removing it drops it from the active set
        sd.write_text(json.dumps([{"targets": [metrics.addr]}]))
        wait_for(
            lambda: not second_target_active(), "file-SD target removal"
        )
    finally:
        finished.set()
        api_mod.serve = real_serve
        t.join(timeout=30)
        metrics.stop()
        metrics2.stop()
        am.stop()
        rw.stop()


@pytest.mark.slow  # wall-clock scrape/serve soak (r11 lane split)
def test_forwarder_tails_by_ingest_seq(spark, tmp_path):
    """RemoteWriteForwarder ships exactly what was appended after it
    started — by ingest_seq, so a backfill into OLD time ranges still
    forwards — and never re-sends after a successful pass; a down
    endpoint retries the same watermark."""
    from tsdb_spark.sources.remotewrite import decode_write_request

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    db.append(spark.createDataFrame(
        [({"__name__": "pre"}, 1_000, 1.0)],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
    ))
    rx = _CapturingReceiver()
    try:
        from tsdb_spark.config import RemoteWriteForwarder

        fwd = RemoteWriteForwarder(
            db, [RemoteWriteConfig(url=f"{rx.url}/api/v1/write")]
        )
        assert fwd.run_once() == 0  # nothing new since start

        # an append with an OLD timestamp still forwards (seq tail)
        db.append(spark.createDataFrame(
            [({"__name__": "new"}, 500, 2.0),
             ({"__name__": "new2"}, 2_000, 3.0)],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
        ))
        assert fwd.run_once() == 2
        assert fwd.run_once() == 0  # watermark advanced: no re-send
        names = set()
        for _p, body in rx.posts:
            for labels, _s in decode_write_request(body):
                names.add(labels["__name__"])
        assert names == {"new", "new2"}
    finally:
        rx.stop()


def test_forwarder_external_labels_and_write_relabel(spark, tmp_path):
    """Outgoing remote-write samples carry the global external_labels
    (where the series lacks the name — storage/remote does this before
    write relabeling), and a per-endpoint write_relabel_configs chain
    filters/rewrites what ships (queueManager semantics)."""
    from tsdb_spark.config import RemoteWriteForwarder
    from tsdb_spark.relabel import RelabelConfig
    from tsdb_spark.sources.remotewrite import decode_write_request

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    rx = _CapturingReceiver()
    try:
        fwd = RemoteWriteForwarder(
            db,
            [RemoteWriteConfig(
                url=f"{rx.url}/api/v1/write",
                write_relabel=(
                    RelabelConfig(action="drop",
                                  source_labels=("__name__",),
                                  regex="noise.*"),
                    RelabelConfig(action="replace",
                                  source_labels=("cluster",),
                                  regex="(.*)", target_label="region",
                                  replacement="region-$1"),
                ),
            )],
            external_labels={"cluster": "east", "env": "prod"},
        )
        db.append(spark.createDataFrame(
            [({"__name__": "keep", "env": "own"}, 1_000, 1.0),
             ({"__name__": "noise_total"}, 1_000, 2.0)],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
        ))
        assert fwd.run_once() == 1  # the noise series relabel-dropped
        got = {}
        for _p, body in rx.posts:
            for labels, samples in decode_write_request(body):
                got[labels["__name__"]] = labels
        assert set(got) == {"keep"}
        lab = got["keep"]
        assert lab["cluster"] == "east"      # external label attached
        assert lab["env"] == "own"           # series' own value wins
        assert lab["region"] == "region-east"  # relabel saw externals
    finally:
        rx.stop()


def test_forwarder_rw2_relabels_hists_forwards_exemplars_metadata(
    spark, tmp_path
):
    """write_relabel_configs apply to EVERY outgoing series on an rw2
    endpoint — a drop rule suppresses the matched series' float AND
    native-histogram AND exemplar rows (upstream relabels all outgoing
    series) — and the pass forwards exemplars (TimeSeries field 4) and
    the scrape-cache metadata (field 5) the rw2 codec carries."""
    from tsdb_spark.config import RemoteWriteForwarder
    from tsdb_spark.nativehist import HIST_TYPE
    from tsdb_spark.relabel import RelabelConfig
    from tsdb_spark.sources.remotewrite import decode_write_request_v2

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    rx = _CapturingReceiver()
    try:
        fwd = RemoteWriteForwarder(
            db,
            [RemoteWriteConfig(
                url=f"{rx.url}/api/v1/write",
                protobuf_message="io.prometheus.write.v2.Request",
                write_relabel=(
                    RelabelConfig(action="drop",
                                  source_labels=("__name__",),
                                  regex="secret_.*"),
                ),
            )],
            metadata={"keep_hist": {
                "type": "histogram", "help": "kept", "unit": "seconds",
            }},
        )
        hist = (4.0, 10.0, 1.0, 0, [(1, 2.0), (2, 2.0)], None)
        db.append_histograms(spark.createDataFrame(
            [({"__name__": "keep_hist"}, 1_000, hist),
             ({"__name__": "secret_hist"}, 1_000, hist)],
            f"labels MAP<STRING,STRING>, t LONG, h {HIST_TYPE}",
        ))
        db.append(spark.createDataFrame(
            [({"__name__": "keep_f"}, 1_000, 1.0),
             ({"__name__": "secret_f"}, 1_000, 2.0)],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
        ))
        db.append_exemplars(spark.createDataFrame(
            [({"__name__": "keep_f"}, 1_000, 1.0, {"trace_id": "abc"}),
             ({"__name__": "secret_f"}, 1_000, 2.0, {"trace_id": "xyz"})],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE, "
            "exemplar MAP<STRING,STRING>",
        ))
        fwd.run_once()
        got = {}
        for _p, body in rx.posts:
            for e in decode_write_request_v2(body):
                got.setdefault(e["labels"]["__name__"], e)
        # the drop rule suppressed secret_* floats, histograms AND
        # exemplars; nothing secret reached the wire
        assert set(got) == {"keep_hist", "keep_f"}
        assert got["keep_hist"]["histograms"]
        assert got["keep_hist"]["histograms"][0][1]["count"] == 4.0
        assert got["keep_f"]["exemplars"] == [
            ({"trace_id": "abc"}, 1_000, 1.0)
        ]
        assert got["keep_hist"]["metadata"] == {
            "type": "histogram", "help": "kept", "unit": "seconds",
        }
        assert fwd.run_once() == 0  # watermark advanced for all tables
    finally:
        rx.stop()


def test_forwarder_bounds_tail_at_pass_head(spark, tmp_path):
    """The pass reads ingest_seq <= the head it will advance the
    watermark to — an append landing DURING the pass ships on the NEXT
    pass only, never twice (a duplicate-rejecting receiver would stall
    the watermark on a re-send)."""
    from tsdb_spark.config import RemoteWriteForwarder
    from tsdb_spark.sources.remotewrite import decode_write_request

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    rx = _CapturingReceiver()
    try:
        fwd = RemoteWriteForwarder(
            db, [RemoteWriteConfig(url=f"{rx.url}/api/v1/write")]
        )
        db.append(spark.createDataFrame(
            [({"__name__": "a"}, 1_000, 1.0)],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
        ))
        head = int(db.meta["next_ingest_seq"]) - 1
        # an append racing the pass: seq > head at the time the pass
        # snapshotted — the bounded read must exclude it
        db.append(spark.createDataFrame(
            [({"__name__": "b"}, 2_000, 2.0)],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
        ))
        rows = fwd._float_rows_since(0, head)
        assert {r["labels"]["__name__"] for r in rows} == {"a"}
        # full passes ship each sample exactly once across the race
        assert fwd.run_once() == 2
        assert fwd.run_once() == 0
        sent = []
        for _p, body in rx.posts:
            for labels, samples in decode_write_request(body):
                sent += [(labels["__name__"], t, v) for t, v in samples]
        assert sorted(sent) == [("a", 1_000, 1.0), ("b", 2_000, 2.0)]
    finally:
        rx.stop()


def test_scrape_config_scheme_path_params(spark, tmp_path):
    """scrape_configs scheme / metrics_path / params assemble the
    target URL for bare host:port entries (scrape/target.go)."""
    import yaml  # noqa: F401 — config file below

    cfg = tmp_path / "p.yml"
    cfg.write_text(
        "scrape_configs:\n"
        "- job_name: fed\n"
        "  scheme: https\n"
        "  metrics_path: /federate\n"
        "  params:\n"
        "    'match[]': ['up', 'job:.*']\n"
        "  static_configs:\n"
        "  - targets: ['peer:9090']\n"
    )
    from tsdb_spark.scrape import load_scrape_config

    [job] = load_scrape_config(spark, str(cfg))
    [t] = job.targets
    assert t.url == (
        "https://peer:9090/federate?match%5B%5D=up&match%5B%5D=job%3A.%2A"
    )
    assert t.instance == "peer:9090"


def test_http_sd_targets_add_remove_and_relabel(spark, tmp_path):
    """http_sd_configs (discovery/http): the target list GETs from a
    URL on refresh_interval cadence in the upstream JSON target-group
    format; an add/remove in the served list lands on the next pass
    (visible on /api/v1/targets via the scheduler's status pruning);
    discovered targets run the job's SD-time relabel chain like file
    SD; a failed GET keeps the last good list."""
    from tsdb_spark.api import targets_payload
    from tsdb_spark.config import scrape_scheduler_loop
    from tsdb_spark.scrape import scrape_jobs_from

    metrics = _MetricsEndpoint("# TYPE temp gauge\ntemp 1.0\n")
    metrics2 = _MetricsEndpoint("# TYPE temp gauge\ntemp 2.0\n")

    state = {"groups": [{"targets": [metrics.addr],
                         "labels": {"team": "a"}}],
             "fail": False}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if state["fail"]:
                self.send_response(500)
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            body = json.dumps(state["groups"]).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    sd_srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    sd_url = f"http://127.0.0.1:{sd_srv.server_address[1]}/sd"
    threading.Thread(target=sd_srv.serve_forever, daemon=True).start()

    raw = {"scrape_configs": [{
        "job_name": "hsd",
        "scrape_interval": "1s",
        "http_sd_configs": [{"url": sd_url, "refresh_interval": "1ms"}],
        "relabel_configs": [{
            "action": "replace", "source_labels": ["team"],
            "target_label": "squad", "replacement": "squad-$1",
        }],
    }]}
    [job] = scrape_jobs_from(spark, raw)
    assert job.http_sd and job.http_sd[0].refresh_ms == 1
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    status: dict = {}
    stop = threading.Event()
    t = threading.Thread(
        target=scrape_scheduler_loop,
        args=(spark, db, [job], stop),
        kwargs={"status": status, "poll_s": 0.1},
        daemon=True,
    )
    t.start()
    try:
        def wait_for(pred, what, budget_s=90):
            end = time.time() + budget_s
            while time.time() < end:
                if pred():
                    return
                time.sleep(0.2)
            raise AssertionError(f"timed out waiting for {what}")

        wait_for(lambda: metrics.addr in {
            u.split("://")[-1].split("/")[0] for u in status
        }, "initial http-SD target scraped")
        # SD-time relabel chain ran on the discovered target
        [st] = list(status.values())
        assert st["labels"].get("squad") == "squad-a"

        # add a target in the served list → next pass picks it up
        state["groups"] = [
            {"targets": [metrics.addr], "labels": {"team": "a"}},
            {"targets": [metrics2.addr], "labels": {"team": "b"}},
        ]
        wait_for(lambda: len(status) == 2, "http-SD target addition")
        payload = targets_payload(None, status)
        assert len(payload["data"]["activeTargets"]) == 2

        # a failing SD endpoint keeps the last good list
        state["fail"] = True
        time.sleep(1.5)
        assert len(status) == 2

        # removal lands once the endpoint recovers
        state["fail"] = False
        state["groups"] = [
            {"targets": [metrics2.addr], "labels": {"team": "b"}},
        ]
        wait_for(lambda: len(status) == 1, "http-SD target removal")
    finally:
        stop.set()
        t.join(timeout=30)
        sd_srv.shutdown()
        metrics.stop()
        metrics2.stop()


def test_http_client_config_parsing_and_headers(tmp_path):
    """httpauth.HTTPClientConfig — upstream config.go HTTPClientConfig
    semantics: basic_auth and authorization are mutually exclusive,
    authorization defaults to Bearer, *_file secrets are re-read per
    request (rotation applies without reload)."""
    import base64

    import pytest

    from tsdb_spark.httpauth import HTTPClientConfig, http_client_config_from

    hc = http_client_config_from(
        {"basic_auth": {"username": "u", "password": "p"}}
    )
    want = base64.b64encode(b"u:p").decode()
    assert hc.headers() == {"Authorization": f"Basic {want}"}

    hc = http_client_config_from({"authorization": {"credentials": "tok"}})
    assert hc.headers() == {"Authorization": "Bearer tok"}
    hc = http_client_config_from(
        {"authorization": {"type": "ApiKey", "credentials": "k"}}
    )
    assert hc.headers() == {"Authorization": "ApiKey k"}

    with pytest.raises(ValueError):
        HTTPClientConfig(basic_username="u", auth_credentials="t")

    # secret files re-read at call time, relative to the config dir
    sec = tmp_path / "pw.txt"
    sec.write_text("first\n")
    hc = http_client_config_from(
        {"basic_auth": {"username": "u", "password_file": "pw.txt"}},
        base_dir=str(tmp_path),
    )
    first = base64.b64encode(b"u:first").decode()
    assert hc.headers() == {"Authorization": f"Basic {first}"}
    sec.write_text("rotated\n")
    rotated = base64.b64encode(b"u:rotated").decode()
    assert hc.headers() == {"Authorization": f"Basic {rotated}"}

    assert http_client_config_from({}) is None
    assert http_client_config_from({"job_name": "x"}) is None


@pytest.mark.slow  # wall-clock scrape/serve soak (r11 lane split)
def test_http_auth_on_scrape_notifier_and_remote_write(spark, tmp_path):
    """The three outbound HTTP paths honor the config's auth blocks —
    scrape GETs (scrape_configs.basic_auth), Alertmanager POSTs
    (alertmanagers.authorization), and remote-write POSTs
    (remote_write.basic_auth) — parsed from one prometheus.yml
    (config.go HTTPClientConfig, used by scrape/scrape.go and
    notifier.go)."""
    import base64

    from tsdb_spark.config import RemoteWriteForwarder, load_config
    from tsdb_spark.notifier import Notifier
    from tsdb_spark.scrape import scrape_pass

    captured: dict[str, str | None] = {}

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            captured["scrape"] = self.headers.get("Authorization")
            body = b"# TYPE temp gauge\ntemp 4.0\n"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            key = "am" if self.path.startswith("/api/v2") else "rw"
            captured[key] = self.headers.get("Authorization")
            n = int(self.headers.get("Content-Length") or 0)
            self.rfile.read(n)
            self.send_response(204)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    addr = f"127.0.0.1:{srv.server_address[1]}"
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    (tmp_path / "pw.txt").write_text("s3cret\n")
    cfg_file = tmp_path / "prometheus.yml"
    cfg_file.write_text(
        "scrape_configs:\n"
        "- job_name: secured\n"
        "  basic_auth: {username: scraper, password_file: pw.txt}\n"
        "  static_configs:\n"
        f"  - targets: ['{addr}']\n"
        "alerting:\n"
        "  alertmanagers:\n"
        "  - authorization: {credentials: am-tok}\n"
        "    static_configs:\n"
        f"    - targets: ['{addr}']\n"
        "remote_write:\n"
        f"- url: http://{addr}/api/v1/write\n"
        "  basic_auth: {username: writer, password: wpw}\n"
    )
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    try:
        cfg = load_config(spark, str(cfg_file))

        [job] = cfg.scrape_jobs
        assert scrape_pass(
            spark, db, job.targets, http_config=job.http_config
        ) == 1
        basic = base64.b64encode(b"scraper:s3cret").decode()
        assert captured["scrape"] == f"Basic {basic}"

        notif = Notifier(
            cfg.alertmanager_urls, http_configs=cfg.alertmanager_http
        )
        notif.notify([{"labels": {"alertname": "x"}}], 1_000)
        assert notif.send_errors == 0
        assert captured["am"] == "Bearer am-tok"

        fwd = RemoteWriteForwarder(db, cfg.remote_writes)
        db.append(spark.createDataFrame(
            [({"__name__": "m"}, 1_000, 1.0)],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
        ))
        assert fwd.run_once() >= 1
        wbasic = base64.b64encode(b"writer:wpw").decode()
        assert captured["rw"] == f"Basic {wbasic}"
    finally:
        srv.shutdown()


@pytest.mark.slow  # wall-clock scrape/serve soak (r11 lane split)
def test_reload_and_status_config(spark, tmp_path):
    """/api/v1/status/config serves the loaded prometheus.yml verbatim;
    POST /-/reload re-reads the file and the running loops pick up the
    change in place (external_labels here — visible on /federate) —
    web.go's lifecycle surface."""
    import tsdb_spark.api as api_mod
    from tsdb_spark.__main__ import main

    metrics = _MetricsEndpoint("# TYPE temp gauge\ntemp 4.0\n")
    cfg = tmp_path / "prometheus.yml"

    def write_cfg(cluster, nhcb=False):
        cfg.write_text(
            "global:\n"
            "  scrape_interval: 2s\n"
            f"  external_labels: {{cluster: {cluster}}}\n"
            f"otlp: {{convert_histograms_to_nhcb: {str(nhcb).lower()}}}\n"
            "scrape_configs:\n"
            "- job_name: one\n"
            "  static_configs:\n"
            f"  - targets: ['{metrics.addr}']\n"
        )

    write_cfg("east")
    real_serve = api_mod.serve
    finished = threading.Event()
    state: dict = {}

    def patched_serve(db, host, port, **kw):
        srv = real_serve(db, host, port, **kw)
        state["port"] = srv.server_address[1]
        threading.Thread(target=srv.serve_forever, daemon=True).start()

        class _B:
            def serve_forever(self_inner):
                finished.wait()
                raise KeyboardInterrupt

            def shutdown(self_inner):
                srv.shutdown()

        return _B()

    api_mod.serve = patched_serve
    t = threading.Thread(
        target=main,
        args=(["serve", str(tmp_path / "db"), "--config", str(cfg),
               "--port", "0"],),
        daemon=True,
    )
    t.start()
    try:
        deadline = time.time() + 120
        while "port" not in state and time.time() < deadline:
            time.sleep(0.2)
        port = state["port"]

        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}", timeout=10
            ) as r:
                return r.read().decode()

        shown = json.loads(get("/api/v1/status/config"))["data"]["yaml"]
        assert "cluster: east" in shown

        def wait_for(pred, what, budget_s=90):
            end = time.time() + budget_s
            while time.time() < end:
                try:
                    if pred():
                        return
                except Exception:
                    pass
                time.sleep(0.5)
            raise AssertionError(f"timed out waiting for {what}")

        wait_for(
            lambda: 'cluster="east"' in get("/federate?match[]=temp"),
            "east external label on /federate",
        )

        # OTLP explicit-bounds histogram BEFORE the otlp block flips:
        # classic translation (rt1_bucket series appear)
        from tsdb_spark.sources.otlp import encode_otlp_metrics

        def post_otlp(name):
            body = encode_otlp_metrics([{
                "resource": {"service_name": "svc"},
                "metrics": [{
                    "name": name, "unit": "", "kind": "histogram",
                    "temporality": 2,
                    "points": [({}, 5_000, 10, 12.5, [4, 3, 2, 1],
                                [0.1, 0.5, 1.0])],
                }],
            }])
            rq = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/v1/otlp/v1/metrics",
                data=body, method="POST",
                headers={"Content-Type": "application/x-protobuf"},
            )
            with urllib.request.urlopen(rq, timeout=30) as r:
                assert 200 <= r.status < 300

        post_otlp("rt1")
        names = json.loads(get("/api/v1/label/__name__/values"))["data"]
        assert "rt1_bucket" in names  # classic while the flag is off

        write_cfg("west", nhcb=True)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/-/reload", data=b"", method="POST"
        )
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.status == 200
        shown = json.loads(get("/api/v1/status/config"))["data"]["yaml"]
        assert "cluster: west" in shown
        wait_for(
            lambda: 'cluster="west"' in get("/federate?match[]=temp"),
            "west external label after reload",
        )

        # the SAME process now ingests OTLP histograms as NHCB
        # natives — no _bucket series, no restart
        post_otlp("rt2")
        names = json.loads(get("/api/v1/label/__name__/values"))["data"]
        assert "rt2" in names and "rt2_bucket" not in names
    finally:
        finished.set()
        api_mod.serve = real_serve
        t.join(timeout=30)
        metrics.stop()


def test_reload_403_without_config(spark, tmp_path):
    """A serve without --config has no lifecycle surface: /-/reload is
    403 (upstream's 'Lifecycle API is not enabled')."""
    from tsdb_spark.api import serve

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    srv = serve(db, "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/-/reload", data=b"", method="POST"
        )
        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("expected 403")
        except urllib.error.HTTPError as e:
            assert e.code == 403
        # and status/config serves an empty yaml, not an error
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v1/status/config", timeout=10
        ) as r:
            assert json.loads(r.read())["data"]["yaml"] == ""
    finally:
        srv.shutdown()


def test_check_config_valid_and_invalid(tmp_path):
    """`promtool check config` parity: offline lint of prometheus.yml +
    referenced rule files, no SparkSession."""
    from tsdb_spark.config import check_config

    rules = tmp_path / "rules.yml"
    rules.write_text(
        "groups:\n- name: g\n  rules:\n  - record: a:sum\n    expr: sum(a)\n"
    )
    good = tmp_path / "good.yml"
    good.write_text(
        "global:\n  scrape_interval: 15s\n"
        "rule_files: [rules.yml]\n"
        "scrape_configs:\n"
        "- job_name: a\n  static_configs: [{targets: ['h:1']}]\n"
        "remote_write:\n- url: http://x/api/v1/write\n"
        "remote_read:\n- url: http://x/api/v1/read\n  remote_timeout: 10s\n"
    )
    assert check_config(str(good)) == []

    bad = tmp_path / "bad.yml"
    bad.write_text(
        "glooobal: {}\n"
        "global:\n  scrape_interval: fifteen\n"
        "rule_files: [missing-*.yml]\n"
        "scrape_configs:\n"
        "- static_configs: [{targets: ['h:1']}]\n"
        "- job_name: dup\n- job_name: dup\n"
        "remote_write:\n- protobuf_message: bogus.Message\n"
        "remote_read:\n- url: http://x\n  remote_timeout: soon\n"
    )
    errs = check_config(str(bad))
    text = "\n".join(errs)
    assert "unknown top-level field 'glooobal'" in text
    assert "bad duration 'fifteen'" in text
    assert "matches no files" in text
    assert "job_name is required" in text
    assert "duplicate job_name 'dup'" in text
    assert "url is required" in text
    assert "unknown protobuf_message" in text
    assert "bad duration 'soon'" in text

    # a rule file with a broken expression surfaces through the config
    rules.write_text(
        "groups:\n- name: g\n  rules:\n  - record: a:sum\n    expr: sum((\n"
    )
    assert any("rules.yml" in e for e in check_config(str(good)))

    # CLI: exit 0 / 1
    from tsdb_spark.__main__ import main

    rules.write_text(
        "groups:\n- name: g\n  rules:\n  - record: a:sum\n    expr: sum(a)\n"
    )
    assert main(["check-config", str(good)]) == 0
    assert main(["check-config", str(bad)]) == 1


def test_dns_sd_resolves_names_to_targets(spark, monkeypatch):
    """dns_sd_configs (discovery/dns, A/AAAA subset): names resolve via
    the system resolver to one target per address; a failing name keeps
    its last good answer while the others refresh."""
    import socket

    from tsdb_spark.scrape import DNSSD, ScrapeJob

    answers = {
        "app.example": ["10.0.0.1", "10.0.0.2"],
        "db.example": ["10.0.1.9"],
    }

    def fake_getaddrinfo(name, port, family=0, type=0, **kw):
        if name not in answers:
            raise OSError(f"NXDOMAIN {name}")
        return [
            (family, type, 6, "", (a, 0)) for a in answers[name]
        ]

    monkeypatch.setattr(socket, "getaddrinfo", fake_getaddrinfo)
    sd = DNSSD(names=["app.example", "db.example"], port=9100,
               refresh_ms=30_000)
    job = ScrapeJob(name="dns", targets=[], dns_sd=[sd])
    got = {t.url for t in job.resolve_targets(spark, now_ms=0)}
    assert got == {
        "http://10.0.0.1:9100/metrics",
        "http://10.0.0.2:9100/metrics",
        "http://10.0.1.9:9100/metrics",
    }
    # __meta_dns_name rides into the target labels for relabel rules
    metas = {
        dict(t.labels).get("__meta_dns_name")
        for t in job.resolve_targets(spark, now_ms=0)
    }
    assert metas == {"app.example", "db.example"}

    # one name starts failing past the refresh window: its last good
    # answer survives, the other name picks up its new address
    del answers["app.example"]
    answers["db.example"] = ["10.0.1.10"]
    got = {t.url for t in job.resolve_targets(spark, now_ms=60_000)}
    assert got == {
        "http://10.0.0.1:9100/metrics",
        "http://10.0.0.2:9100/metrics",
        "http://10.0.1.10:9100/metrics",
    }


def test_dns_sd_parses_from_config(spark, tmp_path):
    from tsdb_spark.config import load_config

    p = tmp_path / "prometheus.yml"
    p.write_text(
        "scrape_configs:\n"
        "- job_name: dns\n"
        "  dns_sd_configs:\n"
        "  - names: [app.example]\n"
        "    type: A\n"
        "    port: 9100\n"
        "    refresh_interval: 45s\n"
    )
    cfg = load_config(spark, str(p))
    (job,) = cfg.scrape_jobs
    (sd,) = job.dns_sd
    assert sd.names == ["app.example"]
    assert sd.port == 9100
    assert sd.record_type == "A"
    assert sd.refresh_ms == 45_000
