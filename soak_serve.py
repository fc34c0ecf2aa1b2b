#!/usr/bin/env python
"""Config-driven single-process soak: the `serve --config` wiring —
scrape scheduler + rule manager + notifier + remote-write forwarder +
HTTP API, all appending into ONE store from concurrent threads — under
sustained load for N minutes, measuring what a long-running instance
actually experiences:

  - per-loop pass latency (scrape pass, rule tick, forwarder pass)
  - store append-lock contention (how long each mutator WAITED on
    DB._mutex — the single-writer serialization point the reference
    also has, db.go's mtx around Appender commit)

This is the r6 lock finding's territory: the lock is WHY concurrent
scrape/rule appends don't corrupt the Hadoop committer staging dir;
the soak quantifies what that serialization costs at a realistic
multi-job cadence.

Prints ONE JSON line:
  {"metric": "serve_soak", "minutes": N, "loops": {...},
   "lock": {...}, "ingest": {...}}

Usage: python soak_serve.py [--minutes M]   (default 3)
"""

from __future__ import annotations

import argparse
import http.server
import json
import statistics
import tempfile
import threading
import time


class MeterLock:
    """RLock proxy recording how long each acquisition WAITED."""

    def __init__(self, inner):
        self.inner = inner
        self.waits: list[float] = []
        self._wlock = threading.Lock()

    def __enter__(self):
        t0 = time.perf_counter()
        self.inner.acquire()
        w = time.perf_counter() - t0
        with self._wlock:
            self.waits.append(w)
        return self

    def __exit__(self, *exc):
        self.inner.release()

    def acquire(self, *a, **k):
        return self.inner.acquire(*a, **k)

    def release(self):
        return self.inner.release()


class _Metrics:
    """A local exposition endpoint serving `n` gauge series whose
    values move every scrape (so every pass appends fresh samples)."""

    def __init__(self, n: int) -> None:
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_GET(self):
                t = int(time.time())
                lines = ["# TYPE soak_metric gauge"]
                lines += [
                    f'soak_metric{{series="{i}"}} {(t + i) % 1000}.0'
                    for i in range(outer.n)
                ]
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        self.n = n
        self.srv = http.server.HTTPServer(("127.0.0.1", 0), H)
        self.addr = f"127.0.0.1:{self.srv.server_address[1]}"
        threading.Thread(target=self.srv.serve_forever, daemon=True).start()


class _Sink(http.server.BaseHTTPRequestHandler):
    posts = 0

    def do_POST(self):
        n = int(self.headers.get("Content-Length") or 0)
        self.rfile.read(n)
        _Sink.posts += 1
        self.send_response(204)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def log_message(self, *a):
        pass


def _stats(xs: list[float]) -> dict:
    if not xs:
        return {"n": 0}
    xs = sorted(xs)
    return {
        "n": len(xs),
        "mean_s": round(statistics.fmean(xs), 4),
        "p95_s": round(xs[int(0.95 * (len(xs) - 1))], 4),
        "max_s": round(xs[-1], 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=3.0)
    args = ap.parse_args()

    from tsdb_spark import DB, get_spark
    from tsdb_spark import scrape as scrape_mod
    from tsdb_spark.config import (
        RemoteWriteForwarder,
        load_config,
        scrape_scheduler_loop,
    )
    from tsdb_spark.manager import Manager
    from tsdb_spark.notifier import Notifier

    spark = get_spark("soak-serve")
    tmp = tempfile.mkdtemp(prefix="soak_serve_")

    m1, m2, m3 = _Metrics(200), _Metrics(200), _Metrics(50)
    sink = http.server.HTTPServer(("127.0.0.1", 0), _Sink)
    sink_addr = f"127.0.0.1:{sink.server_address[1]}"
    threading.Thread(target=sink.serve_forever, daemon=True).start()

    rules = f"{tmp}/rules.yml"
    with open(rules, "w") as f:
        f.write(
            "groups:\n"
            "- name: soak\n"
            "  interval: 2s\n"
            "  rules:\n"
            "  - record: soak:metric:sum\n"
            "    expr: sum(soak_metric)\n"
            "  - alert: SoakHigh\n"
            "    expr: sum(soak_metric) > 1\n"
        )
    cfg_path = f"{tmp}/prometheus.yml"
    with open(cfg_path, "w") as f:
        f.write(
            "global:\n"
            "  scrape_interval: 2s\n"
            "  evaluation_interval: 2s\n"
            "  external_labels: {soak: 'r10'}\n"
            "rule_files: [rules.yml]\n"
            "scrape_configs:\n"
            "- job_name: fast\n"
            "  scrape_interval: 1s\n"
            f"  static_configs: [{{targets: ['{m1.addr}']}}]\n"
            "- job_name: med\n"
            "  scrape_interval: 2s\n"
            f"  static_configs: [{{targets: ['{m2.addr}']}}]\n"
            "- job_name: slow\n"
            "  scrape_interval: 3s\n"
            f"  static_configs: [{{targets: ['{m3.addr}']}}]\n"
            "alerting:\n"
            "  alertmanagers:\n"
            f"  - static_configs: [{{targets: ['{sink_addr}']}}]\n"
            "remote_write:\n"
            f"- url: http://{sink_addr}/api/v1/write\n"
            f"- url: http://{sink_addr}/api/v1/write\n"
            "  protobuf_message: io.prometheus.write.v2.Request\n"
        )

    db = DB.create(spark, f"{tmp}/db", block_width_ms=3_600_000)
    db._mutex = MeterLock(db._mutex)
    cfg = load_config(spark, cfg_path)

    # instrument the three loops' unit of work
    lat: dict[str, list[float]] = {"scrape": [], "rules": [], "fwd": []}
    real_pass = scrape_mod.scrape_pass

    def timed_pass(*a, **k):
        t0 = time.perf_counter()
        try:
            return real_pass(*a, **k)
        finally:
            lat["scrape"].append(time.perf_counter() - t0)

    scrape_mod.scrape_pass = timed_pass

    notif = Notifier([f"http://{sink_addr}"],
                     external_labels=cfg.external_labels,
                     alert_relabel=cfg.alert_relabel, spark=spark)
    mgr = Manager(db, cfg.rule_groups, notifier=notif)
    real_pending = mgr.run_pending

    def timed_pending(now_ms):
        t0 = time.perf_counter()
        try:
            return real_pending(now_ms)
        finally:
            lat["rules"].append(time.perf_counter() - t0)

    mgr.run_pending = timed_pending

    fwd = RemoteWriteForwarder(db, cfg.remote_writes,
                               external_labels=cfg.external_labels)
    real_once = fwd.run_once

    def timed_once():
        t0 = time.perf_counter()
        try:
            return real_once()
        finally:
            lat["fwd"].append(time.perf_counter() - t0)

    fwd.run_once = timed_once

    stop = threading.Event()
    status: dict = {}
    threads = [
        threading.Thread(target=scrape_scheduler_loop,
                         args=(spark, db, cfg.scrape_jobs, stop),
                         kwargs={"status": status, "poll_s": 0.2},
                         daemon=True),
        threading.Thread(target=mgr.loop, args=(stop,),
                         kwargs={"poll_s": 0.5}, daemon=True),
        threading.Thread(target=fwd.loop, args=(stop,),
                         kwargs={"interval_s": 3.0}, daemon=True),
    ]
    t_start = time.time()
    for t in threads:
        t.start()
    time.sleep(args.minutes * 60)
    stop.set()
    for t in threads:
        t.join(timeout=60)
    wall = time.time() - t_start

    waits = sorted(db._mutex.waits)
    contended = [w for w in waits if w > 0.001]
    samples = db.querier(0, 1 << 62).select([]).count()
    out = {
        "metric": "serve_soak",
        "minutes": round(wall / 60, 2),
        "loops": {k: _stats(v) for k, v in lat.items()},
        "lock": {
            "acquisitions": len(waits),
            "contended_over_1ms": len(contended),
            "total_wait_s": round(sum(waits), 3),
            "max_wait_s": round(waits[-1], 3) if waits else 0.0,
        },
        "ingest": {
            "samples_committed": samples,
            "samples_per_s": round(samples / wall, 1),
            "forwarder_sent": sum(fwd.sent.values()),
            "forwarder_errors": fwd.errors,
            "notifier_errors": notif.send_errors,
            "targets_up": len(status),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
