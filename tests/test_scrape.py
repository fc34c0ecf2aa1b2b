"""Scrape loop (scrape.py — the scrape/scrape.go acquisition layer):
target-label attachment, up/down bookkeeping, scrape-time stamping, and
true federation — instance B scrapes instance A's /federate and ends up
with A's samples."""

import threading

import pytest
from pyspark.sql import functions as F

from tsdb_spark import DB
from tsdb_spark.scrape import Target, scrape_pass

WIDTH = 3_600_000
T0 = 1_704_067_200_000


def _serve(db):
    from tsdb_spark.api import serve

    srv = serve(db, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


@pytest.fixture()
def upstream(spark, tmp_path):
    rows = []
    for s in ("a", "b"):
        for i in range(5):
            rows.append(
                ({"__name__": "m", "s": s}, T0 + i * 60_000, float(i))
            )
    db = DB.create(spark, str(tmp_path / "up_db"), block_width_ms=WIDTH)
    db.append(spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))
    return db


def test_federation_roundtrip(spark, tmp_path, upstream):
    """B scrapes A's /federate: every series arrives with its own
    sample timestamp (ms stamps in the exposition body), plus target
    labels and the `up` marker."""
    from urllib.parse import quote

    srv, port = _serve(upstream)
    try:
        url = (f"http://127.0.0.1:{port}/federate?match[]="
               + quote('{__name__="m"}') + f"&time={(T0 + 270_000) // 1000}")
        dst = DB.create(spark, str(tmp_path / "dn_db"), block_width_ms=WIDTH)
        ok = scrape_pass(
            spark, dst,
            [Target(url=url, job="fed", instance="a:9090")],
            scrape_time_ms=T0 + 270_000,
        )
        assert ok == 1
    finally:
        srv.shutdown()

    got = dst.querier(0, 2 * T0).select([]).select("labels", "t", "v").collect()
    by_name = {}
    for r in got:
        by_name.setdefault(r["labels"]["__name__"], []).append(r)
    # /federate serves the latest sample per series (t = T0+4min)
    assert sorted(
        (r["labels"]["s"], r["t"], r["v"]) for r in by_name["m"]
    ) == [("a", T0 + 240_000, 4.0), ("b", T0 + 240_000, 4.0)]
    # target labels attached; up=1 stamped at scrape time
    assert all(
        r["labels"]["job"] == "fed" and r["labels"]["instance"] == "a:9090"
        for r in got
    )
    (up,) = by_name["up"]
    assert up["v"] == 1.0 and up["t"] == T0 + 270_000


def test_down_target_records_up_zero(spark, tmp_path):
    dst = DB.create(spark, str(tmp_path / "down_db"), block_width_ms=WIDTH)
    ok = scrape_pass(
        spark, dst,
        [Target(url="http://127.0.0.1:1/metrics", job="j", instance="i")],
        scrape_time_ms=T0,
    )
    assert ok == 0
    (row,) = dst.querier(0, 2 * T0).select([]).select("labels", "v").collect()
    assert row["labels"]["__name__"] == "up" and row["v"] == 0.0
    assert row["labels"]["job"] == "j" and row["labels"]["instance"] == "i"


def test_label_conflict_rules(spark, tmp_path, upstream):
    """scrape.go mutateSampleLabels: by default the target's job/instance
    win and the sample's conflicting label becomes exported_<name>;
    honor_labels=True keeps the sample's own."""
    from urllib.parse import quote

    # upstream samples already carry job=inner via a static label
    upstream.append(spark.createDataFrame(
        [({"__name__": "q", "job": "inner"}, T0, 7.0)],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))
    srv, port = _serve(upstream)
    try:
        url = (f"http://127.0.0.1:{port}/federate?match[]="
               + quote("q") + f"&time={T0 // 1000 + 60}")
        dflt = DB.create(spark, str(tmp_path / "c1"), block_width_ms=WIDTH)
        scrape_pass(spark, dflt, [Target(url=url, job="outer", instance="x")],
                    scrape_time_ms=T0 + 60_000)
        honor = DB.create(spark, str(tmp_path / "c2"), block_width_ms=WIDTH)
        scrape_pass(spark, honor, [Target(url=url, job="outer", instance="x")],
                    scrape_time_ms=T0 + 60_000, honor_labels=True)
    finally:
        srv.shutdown()

    (r1,) = [r for r in dflt.querier(0, 2 * T0).select([]).select("labels").collect()
             if r["labels"]["__name__"] == "q"]
    assert r1["labels"]["job"] == "outer"
    assert r1["labels"]["exported_job"] == "inner"
    (r2,) = [r for r in honor.querier(0, 2 * T0).select([]).select("labels").collect()
             if r["labels"]["__name__"] == "q"]
    assert r2["labels"]["job"] == "inner"
    assert "exported_job" not in r2["labels"]
    assert r2["labels"]["instance"] == "x"  # absent key still filled


def test_untimestamped_metrics_get_scrape_time(spark, tmp_path):
    """A plain /metrics body (no stamps) lands at the scrape instant —
    served here by a stub HTTP server emitting exposition text."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    body = b'cpu_seconds_total{core="0"} 12.5\ncpu_seconds_total{core="1"} 13\n'

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        dst = DB.create(spark, str(tmp_path / "m_db"), block_width_ms=WIDTH)
        scrape_pass(
            spark, dst,
            [Target(url=f"http://127.0.0.1:{port}/metrics", job="node",
                    instance="n1", timestamps="openmetrics")],
            scrape_time_ms=T0 + 1234,
        )
    finally:
        srv.shutdown()
    rows = dst.querier(0, 2 * T0).select([]).select("labels", "t", "v").collect()
    cpu = sorted(
        (r["labels"]["core"], r["t"], r["v"])
        for r in rows if r["labels"]["__name__"] == "cpu_seconds_total"
    )
    assert cpu == [("0", T0 + 1234, 12.5), ("1", T0 + 1234, 13.0)]


def test_targets_payload_and_route(spark, tmp_path, upstream):
    """/api/v1/targets (api.go TargetDiscovery): per-target health from
    the scrape loop's status dict — up/down, lastScrape, lastError."""
    import json
    import urllib.request

    from tsdb_spark.api import serve, targets_payload

    srv, port = _serve(upstream)
    try:
        good = Target(url=f"http://127.0.0.1:{port}/federate?match[]=m"
                      f"&time={(T0 + 270_000) // 1000}", job="fed")
        bad = Target(url="http://127.0.0.1:1/metrics", job="fed")
        dst = DB.create(spark, str(tmp_path / "tg_db"), block_width_ms=WIDTH)
        status = {}
        scrape_pass(spark, dst, [good, bad],
                    scrape_time_ms=T0 + 270_000, status=status)
    finally:
        srv.shutdown()

    payload = targets_payload([good, bad], status)
    by_url = {a["scrapeUrl"]: a for a in payload["data"]["activeTargets"]}
    assert by_url[good.url]["health"] == "up"
    assert by_url[good.url]["lastScrape"] == (T0 + 270_000) / 1000.0
    assert by_url[bad.url]["health"] == "down"
    assert by_url[bad.url]["lastError"]

    # the route serves it (empty active set without a scrape loop)
    srv2 = serve(dst, "127.0.0.1", 0, scrape_targets=[good, bad],
                 scrape_status=status)
    port2 = srv2.server_address[1]
    import threading as _th
    _th.Thread(target=srv2.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port2}/api/v1/targets"
        ) as r:
            body = json.loads(r.read())
        assert len(body["data"]["activeTargets"]) == 2
        assert body["data"]["droppedTargets"] == []
    finally:
        srv2.shutdown()


def test_concurrent_acquisition_wall_time(spark, tmp_path):
    """Acquisition is a thread pool over the GETs (scrape.go runs one
    goroutine per target): a pass over N slow targets costs ~one target
    latency, never the sum — and down targets still record up=0."""
    import time as _time
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    DELAY = 2.0

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            _time.sleep(DELAY)
            body = b"slow_metric 1\n"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        dst = DB.create(spark, str(tmp_path / "c_db"), block_width_ms=WIDTH)
        targets = [
            Target(url=f"http://127.0.0.1:{port}/m{i}", job="slow",
                   instance=f"s{i}", timestamps="openmetrics")
            for i in range(4)
        ] + [Target(url="http://127.0.0.1:1/none", job="slow", instance="down")]
        # timing leg: a stub sink isolates acquisition from the Spark
        # append — 5 serial GETs would hold the sockets >= 4*DELAY=3.2s;
        # the pool holds them ~DELAY. Plan building adds ~a second.
        class _Sink:
            def append(self, df):
                return None

        # warm pass (untimed): first-use plan building / JIT cost is
        # load-sensitive (measured ~1s idle, ~9s on a degraded box —
        # enough to breach the serial bound and flake); the timed pass
        # below then measures acquisition, not session warm-up
        assert scrape_pass(spark, _Sink(), targets, scrape_time_ms=T0) == 4
        t0 = _time.monotonic()
        ok = scrape_pass(spark, _Sink(), targets, scrape_time_ms=T0)
        fetch_wall = _time.monotonic() - t0
        assert ok == 4
        # serial sockets alone would hold >= 4*DELAY = 8s; concurrent
        # acquisition costs ~DELAY + warm plan building
        assert fetch_wall < 4 * DELAY

        # correctness leg (untimed): real append, up-series bookkeeping
        status: dict = {}
        assert scrape_pass(spark, dst, targets, scrape_time_ms=T0, status=status) == 4
        assert sum(1 for s in status.values() if s["health"] == "down") == 1
        rows = dst.querier(0, 2 * T0).select([]).select("labels", "v").collect()
        ups = sorted(
            (r["labels"]["instance"], r["v"])
            for r in rows if r["labels"]["__name__"] == "up"
        )
        assert ups == [("down", 0.0), ("s0", 1.0), ("s1", 1.0), ("s2", 1.0), ("s3", 1.0)]
    finally:
        srv.shutdown()


def test_scrape_metadata_served(spark, tmp_path):
    """HELP/TYPE/UNIT comments captured at scrape time surface through
    /api/v1/metadata (the upstream scrape-cache metadata path)."""
    import http.server
    import json
    import threading
    import urllib.request

    from tsdb_spark import DB
    from tsdb_spark.api import serve
    from tsdb_spark.scrape import Target, scrape_pass

    body = (
        "# HELP reqs_total The total number of requests.\n"
        "# TYPE reqs_total counter\n"
        "reqs_total 5 1000\n"
        "# TYPE temp gauge\n"
        "# UNIT temp celsius\n"
        "temp 21.5 1000\n"
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

    tsrv = http.server.HTTPServer(("127.0.0.1", 0), H)
    tport = tsrv.server_address[1]
    threading.Thread(target=tsrv.serve_forever, daemon=True).start()
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=3_600_000)
    md: dict = {}
    try:
        scrape_pass(
            spark, db,
            [Target(url=f"http://127.0.0.1:{tport}/metrics", job="t")],
            scrape_time_ms=1_000, metadata=md,
        )
        assert md["reqs_total"]["type"] == "counter"
        assert md["reqs_total"]["help"] == "The total number of requests."
        assert md["temp"] == {"type": "gauge", "unit": "celsius"}

        srv = serve(db, "127.0.0.1", 0, scrape_metadata=md)
        port = srv.server_address[1]
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/api/v1/metadata"
            ) as r:
                data = json.loads(r.read())["data"]
            assert data["reqs_total"] == [
                {"type": "counter",
                 "help": "The total number of requests.", "unit": ""}
            ]
            assert data["temp"] == [
                {"type": "gauge", "help": "", "unit": "celsius"}
            ]
            assert data["up"] == []  # sample-only metric: empty list
        finally:
            srv.shutdown()
    finally:
        tsrv.shutdown()


def test_scrape_configs_yaml_end_to_end(spark, tmp_path):
    """An upstream-style scrape_configs block: two jobs with their own
    cadence/labels, SD-time relabel_configs dropping one target, and
    metric_relabel_configs rewriting at scrape time."""
    import http.server
    import threading

    from tsdb_spark import DB
    from tsdb_spark.scrape import load_scrape_config, scrape_config_pass

    def _server(body):
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
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv

    s1 = _server('m{path="/a"} 1 1000\n')
    s2 = _server("other 9 1000\n")
    try:
        p1, p2 = s1.server_address[1], s2.server_address[1]
        cfg = tmp_path / "prometheus.yml"
        cfg.write_text(f"""
scrape_configs:
  - job_name: api
    scrape_interval: 30s
    static_configs:
      - targets: ["http://127.0.0.1:{p1}/metrics"]
        labels: {{env: prod}}
      - targets: ["http://127.0.0.1:9/metrics"]
        labels: {{env: dead}}
    relabel_configs:
      - action: drop
        source_labels: [env]
        regex: dead
    metric_relabel_configs:
      - action: replace
        source_labels: [path]
        regex: /(.*)
        target_label: route
        replacement: $1
      - action: labeldrop
        regex: path
  - job_name: aux
    static_configs:
      - targets: ["http://127.0.0.1:{p2}/metrics"]
""")
        jobs = load_scrape_config(spark, str(cfg))
        assert [j.name for j in jobs] == ["api", "aux"]
        assert jobs[0].interval_ms == 30_000 and jobs[1].interval_ms == 15_000
        # SD-time drop removed the dead target
        assert len(jobs[0].targets) == 1
        assert dict(jobs[0].targets[0].labels) == {"env": "prod"}

        db = DB.create(spark, str(tmp_path / "db"), block_width_ms=3_600_000)
        ok = scrape_config_pass(spark, db, jobs, scrape_time_ms=1_000)
        assert ok == 2
        rows = db.querier(0, 10_000).select([]).select("labels", "v").collect()
        by = {}
        for r in rows:
            by.setdefault(dict(r["labels"])["__name__"], []).append(dict(r["labels"]))
        [m] = by["m"]
        assert m["route"] == "a" and "path" not in m
        assert m["env"] == "prod" and m["job"] == "api"
        [o] = by["other"]
        assert o["job"] == "aux"
        assert sorted(d["job"] for d in by["up"]) == ["api", "aux"]
    finally:
        s1.shutdown()
        s2.shutdown()


def test_scrape_convert_classic_histograms_to_nhcb(spark, tmp_path):
    """scrape_config `convert_classic_histograms_to_nhcb` (prometheus
    3.x): scraped classic histogram families land as NHCB samples in
    the histograms table — the classic _bucket/_sum/_count series are
    consumed, other metrics (and `up`) stay float samples."""
    from pyspark.sql import functions as F

    from tsdb_spark import DB
    from tsdb_spark.nativehist import hist_quantile
    from tsdb_spark.scrape import Target, scrape_pass

    text = (
        "# TYPE rt histogram\n"
        'rt_bucket{le="0.1"} 4\n'
        'rt_bucket{le="0.5"} 7\n'
        'rt_bucket{le="1"} 9\n'
        'rt_bucket{le="+Inf"} 10\n'
        "rt_sum 12.5\n"
        "rt_count 10\n"
        "temp 21.5\n"
    )
    import http.server

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            data = text.encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    httpd = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}/metrics"
    try:
        db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
        ok = scrape_pass(
            spark, db,
            [Target(url=url, job="j", instance="i")],
            scrape_time_ms=60_000,
            convert_nhcb=True,
        )
        assert ok == 1
        floats = {
            r["labels"]["__name__"]
            for r in db.querier(0, 10**9).select([]).collect()
        }
        assert floats == {"temp", "up"}  # classic family consumed
        [row] = db.hist_frame(0, 10**9).collect()
        h = row["h"]
        assert row["labels"]["__name__"] == "rt"
        assert row["labels"]["job"] == "j"  # target labels attached
        assert h["schema"] == -53
        assert list(h["custom_values"]) == [0.1, 0.5, 1.0]
        assert h["count"] == 10.0 and h["sum"] == 12.5
        # quantile answers the classic block's hand answer (rank 5 ->
        # (0.1,0.5]: 0.1 + 0.4*(5-4)/3)
        [q] = db.hist_frame(0, 10**9).select(
            hist_quantile(0.5, F.col("h")).alias("q")
        ).collect()
        assert abs(q["q"] - (0.1 + 0.4 / 3)) < 1e-12
    finally:
        httpd.shutdown()
