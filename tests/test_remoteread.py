"""remote_read client + read-through fan-in (prometheus.yml
`remote_read:`; upstream storage/remote/read.go + storage/fanout.go).

The remote store is served by this engine's own /api/v1/read handler —
the same two-instance arrangement the remote-write tests use, pointed
the other way: the LOCAL store holds recent data, the REMOTE holds
history, and a query through ReadThroughDB merges both with local
preferred."""

import threading
import urllib.request

import pytest

from tsdb_spark import DB, eq
from tsdb_spark.api import serve
from tsdb_spark.remoteread import (
    ReadThroughDB,
    RemoteReadClient,
    RemoteReadConfig,
    clients_from,
)

WIDTH = 10_000


def _rows(spark, name, pts, extra=None):
    lbls = {"__name__": name, **(extra or {})}
    return spark.createDataFrame(
        [(lbls, t, v) for t, v in pts],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
    )


@pytest.fixture()
def remote(spark, tmp_path):
    """A store with HISTORY (t < 20_000), served over HTTP."""
    rdb = DB.create(spark, str(tmp_path / "remote"), block_width_ms=WIDTH)
    rdb.append(_rows(spark, "m", [(1_000, 1.0), (11_000, 2.0)]))
    rdb.append(_rows(spark, "hist_only", [(2_000, 7.0)]))
    srv = serve(rdb, "127.0.0.1", 0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/api/v1/read"
    yield rdb, url
    srv.shutdown()


def _local(spark, tmp_path):
    """A store with RECENT data (one live bucket at 20_000)."""
    db = DB.create(spark, str(tmp_path / "local"), block_width_ms=WIDTH)
    db.append(_rows(spark, "m", [(21_000, 10.0), (22_000, 11.0)]))
    return db


def test_fanout_merges_history_with_recent(spark, tmp_path, remote):
    _, url = remote
    db = _local(spark, tmp_path)
    ft = ReadThroughDB(db, clients_from([RemoteReadConfig(url=url,
                                                          read_recent=True)]))
    rows = (
        ft.querier(0, 30_000)
        .select([eq("__name__", "m")])
        .select("t", "v")
        .collect()
    )
    got = {r.t: r.v for r in rows}
    assert got == {1_000: 1.0, 11_000: 2.0, 21_000: 10.0, 22_000: 11.0}
    # matcher-less select (the PromQL full-frame read) sees both too
    names = {
        r.labels["__name__"]
        for r in ft.querier(0, 30_000).select([]).collect()
    }
    assert names == {"m", "hist_only"}


def test_local_wins_on_collision(spark, tmp_path, remote):
    rdb, url = remote
    db = _local(spark, tmp_path)
    # same (series, t) on both sides with different values
    rdb.append(_rows(spark, "m", [(21_000, 99.0)]))
    ft = ReadThroughDB(db, clients_from([RemoteReadConfig(url=url,
                                                          read_recent=True)]))
    got = {
        r.t: r.v
        for r in ft.querier(20_000, 30_000).select([eq("__name__", "m")])
        .select("t", "v").collect()
    }
    assert got[21_000] == 10.0  # the local sample, not the remote 99.0


def test_read_recent_false_clamps_to_local_start(spark, tmp_path, remote):
    rdb, url = remote
    db = _local(spark, tmp_path)  # oldest local bucket lo = 20_000
    # remote has a sample INSIDE the local coverage window; with
    # read_recent=false the client must never even ask for it
    rdb.append(_rows(spark, "m", [(25_000, 99.0)]))
    cfg = RemoteReadConfig(url=url, read_recent=False)
    ft = ReadThroughDB(db, clients_from([cfg]))
    got = {
        r.t: r.v
        for r in ft.querier(0, 30_000).select([eq("__name__", "m")])
        .select("t", "v").collect()
    }
    # history (<20_000) from remote, recent only from local
    assert got == {1_000: 1.0, 11_000: 2.0, 21_000: 10.0, 22_000: 11.0}
    # a window entirely inside local coverage skips the remote read
    client = ft.clients[0]
    before = client.reads
    ft.querier(20_000, 30_000).select([eq("__name__", "m")]).collect()
    assert client.reads == before


def test_required_matchers_gate(spark, tmp_path, remote):
    _, url = remote
    db = _local(spark, tmp_path)
    cfg = RemoteReadConfig(
        url=url, read_recent=True,
        required_matchers=(("cluster", "prod"),),
    )
    ft = ReadThroughDB(db, clients_from([cfg]))
    client = ft.clients[0]
    # query without the required equality matcher: endpoint skipped
    rows = ft.querier(0, 30_000).select([eq("__name__", "m")]).collect()
    assert client.reads == 0
    assert {r.t for r in rows} == {21_000, 22_000}  # local only
    # with it: consulted (the remote filters by its own series, so the
    # fan-in simply adds nothing matching cluster=prod here — the gate
    # is about the REQUEST being made)
    ft.querier(0, 30_000).select(
        [eq("__name__", "m"), eq("cluster", "prod")]
    ).collect()
    assert client.reads == 1


def test_promql_evaluates_over_fanout(spark, tmp_path, remote):
    from tsdb_spark.promql import eval_range_db

    _, url = remote
    db = _local(spark, tmp_path)
    ft = ReadThroughDB(db, clients_from([RemoteReadConfig(url=url,
                                                          read_recent=True)]))
    out = eval_range_db(ft, "sum(m)", 0, 30_000, 1_000).collect()
    by_t = {r.t: r.value for r in out}
    # lookback carries each sample forward; spot-check both regimes
    assert by_t[1_000] == 1.0      # remote history
    assert by_t[22_000] == 11.0    # local recent


def test_config_parses_remote_read_block(spark, tmp_path):
    from tsdb_spark.config import load_config

    p = tmp_path / "prometheus.yml"
    p.write_text(
        "remote_read:\n"
        "- url: http://hist.example/api/v1/read\n"
        "  name: hist\n"
        "  read_recent: true\n"
        "  remote_timeout: 30s\n"
        "  required_matchers: {cluster: prod}\n"
        "  authorization:\n"
        "    credentials: tok123\n"
        "- url: http://cold.example/api/v1/read\n"
    )
    cfg = load_config(spark, str(p))
    assert len(cfg.remote_reads) == 2
    rr = cfg.remote_reads[0]
    assert rr.url == "http://hist.example/api/v1/read"
    assert rr.name == "hist"
    assert rr.read_recent is True
    assert rr.remote_timeout_s == 30.0
    assert rr.required_matchers == (("cluster", "prod"),)
    assert rr.http_config.headers()["Authorization"] == "Bearer tok123"
    assert cfg.remote_reads[1].read_recent is False


def test_client_sends_auth_header(spark, tmp_path):
    """The remote_read block's authorization reaches the wire."""
    import http.server

    from tsdb_spark.httpauth import http_client_config_from
    from tsdb_spark.sources.remotewrite import encode_read_response

    seen = {}

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            seen["auth"] = self.headers.get("Authorization")
            self.rfile.read(int(self.headers.get("Content-Length") or 0))
            body = encode_read_response([[]])
            self.send_response(200)
            self.send_header("Content-Encoding", "snappy")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/read"
    hc = http_client_config_from({"authorization": {"credentials": "sek"}})
    client = RemoteReadClient(RemoteReadConfig(url=url, http_config=hc))
    assert client.read(0, 1_000, [eq("__name__", "m")]) == []
    assert seen["auth"] == "Bearer sek"
    srv.shutdown()


def test_native_histograms_ride_remote_read(spark, tmp_path, remote):
    """Histograms ride the SAMPLED response (prompb TimeSeries field 4)
    and fan into hist_frame local-wins."""
    from tsdb_spark.nativehist import HIST_TYPE

    rdb, url = remote
    h = (10.0, 55.0, 1.0, 0, [(0, 4.0), (2, 5.0)], None)
    rdb.append_histograms(
        spark.createDataFrame(
            [({"__name__": "lat"}, 5_000, h)],
            f"labels MAP<STRING,STRING>, t LONG, h {HIST_TYPE}",
        )
    )
    db = _local(spark, tmp_path)
    ft = ReadThroughDB(db, clients_from([RemoteReadConfig(url=url,
                                                          read_recent=True)]))
    rows = ft.hist_frame(0, 30_000).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.t == 5_000 and r.h["count"] == 10.0 and r.h["sum"] == 55.0
    assert [(b["idx"], b["c"]) for b in r.h["buckets"]] == [(0, 4.0), (2, 5.0)]
    # local histogram at the same (series, t) wins
    h2 = (99.0, 99.0, 0.0, 0, [(0, 99.0)], None)
    db.append_histograms(
        spark.createDataFrame(
            [({"__name__": "lat"}, 5_000, h2)],
            f"labels MAP<STRING,STRING>, t LONG, h {HIST_TYPE}",
        )
    )
    rows = ft.hist_frame(0, 30_000).collect()
    assert len(rows) == 1 and rows[0].h["count"] == 99.0


def test_v1_remote_write_carries_histograms(spark, tmp_path):
    """prompb TimeSeries field 4 on the v1 WRITE wire (upstream sends
    native histograms over v1 since 2.40): encode → /api/v1/write
    receive → hist_frame."""
    from tsdb_spark.api import remote_write
    from tsdb_spark.sources.remotewrite import encode_write_request

    db = DB.create(spark, str(tmp_path / "w"), block_width_ms=WIDTH)
    h = {"count": 7.0, "sum": 12.5, "zero_count": 1.0, "schema": 3,
         "buckets": [(0, 2.0), (1, 5.0)], "custom_values": None}
    body = encode_write_request(
        [({"__name__": "lat"}, [(1_000, 0.5)], (), [(2_000, h)])]
    )
    n = remote_write(db, body)
    assert n == 2  # one float + one histogram sample
    rows = db.hist_frame(0, 10_000).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.t == 2_000 and r.h["count"] == 7.0 and r.h["schema"] == 3
    assert [(b["idx"], b["c"]) for b in r.h["buckets"]] == [(0, 2.0), (1, 5.0)]
    assert db.querier(0, 10_000).select([]).count() == 1
