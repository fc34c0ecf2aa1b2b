"""Prometheus HTTP-API wire shapes (web/api/v1/api.go): matrix/vector
responses, label values, and series listing over the evaluator."""

import json

import pytest

from tsdb_spark import DB
from tsdb_spark.api import format_value, label_values, query, query_range, series

WIDTH = 3_600_000


@pytest.fixture()
def store(spark, tmp_path):
    rows = []
    for s in ("a", "b"):
        for i in range(20):
            rows.append(({"__name__": "m", "s": s}, i * 60_000,
                         float(i if s == "a" else i * 2)))
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    db.append(spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))
    return db


def test_format_value():
    assert format_value(1.0) == "1"
    assert format_value(0.5) == "0.5"
    assert format_value(float("nan")) == "NaN"
    assert format_value(float("inf")) == "+Inf"
    assert format_value(1.25e-7) == "1.25e-07"


def test_query_range_matrix(store):
    resp = query_range(store, "sum_over_time(m[5m])", 300_000, 900_000, 300_000)
    assert resp["status"] == "success"
    assert resp["data"]["resultType"] == "matrix"
    result = resp["data"]["result"]
    assert len(result) == 2
    for s in result:
        # the range fn drops __name__ (upstream shouldDropMetricName)
        assert "__name__" not in s["metric"] and s["metric"]["s"] in ("a", "b")
        for ts, v in s["values"]:
            assert isinstance(ts, float) and isinstance(v, str)
        assert [p[0] for p in s["values"]] == sorted(p[0] for p in s["values"])
    json.dumps(resp)  # wire-serializable


def test_query_instant_vector_and_grouped(store):
    resp = query(store, "m", 600_000)
    assert resp["data"]["resultType"] == "vector"
    assert len(resp["data"]["result"]) == 2
    for e in resp["data"]["result"]:
        ts, v = e["value"]
        assert ts == 600.0 and v in ("10", "20")
    # grouped output: metric = the by-labels only
    resp = query(store, "sum by (s) (count_over_time(m[5m]))", 600_000)
    metrics = sorted(e["metric"]["s"] for e in resp["data"]["result"])
    assert metrics == ["a", "b"]
    assert all(e["value"][1] == "5" for e in resp["data"]["result"])


def test_label_values_and_series(store):
    assert label_values(store, "s")["data"] == ["a", "b"]
    resp = series(store, 'm{s="a"}', 0, 10_000_000)
    assert resp["data"] == [{"__name__": "m", "s": "a"}]


def test_http_server_endpoints(store):
    import threading
    import urllib.request

    from tsdb_spark.api import serve

    srv = serve(store, "127.0.0.1", 0)  # ephemeral port
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}"
            ) as r:
                return r.status, json.loads(r.read())

        code, body = get("/api/v1/query_range?query=m&start=300&end=600&step=5m")
        assert code == 200 and body["data"]["resultType"] == "matrix"
        assert len(body["data"]["result"]) == 2

        code, body = get("/api/v1/query?query=m&time=600")
        assert code == 200 and len(body["data"]["result"]) == 2

        code, body = get("/api/v1/labels")
        assert code == 200 and body["data"] == ["__name__", "s"]

        code, body = get("/api/v1/label/s/values")
        assert code == 200 and body["data"] == ["a", "b"]

        code, body = get(
            '/api/v1/series?match[]=m{s="b"}&start=0&end=10000'
        )
        assert code == 200 and body["data"] == [{"__name__": "m", "s": "b"}]

        # absent `time` defaults to the server's current time
        # (api.go parseTimeParam default) — a valid, empty-at-now query
        code, body = get("/api/v1/query?query=m")
        assert code == 200 and body["status"] == "success"

        # bad request: malformed params → 400 with errorType
        import urllib.error

        try:
            get("/api/v1/query?query=m&time=notatime")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert json.loads(e.read())["errorType"] == "bad_data"
    finally:
        srv.shutdown()


def test_status_tsdb(store):
    from tsdb_spark.api import status_tsdb

    resp = status_tsdb(store)
    d = resp["data"]
    assert d["headStats"]["numSeries"] == 2
    assert d["headStats"]["numLabelPairs"] == 3  # __name__=m, s=a, s=b
    assert d["headStats"]["minTime"] == 0
    assert d["headStats"]["maxTime"] == 19 * 60_000
    assert d["headStats"]["chunkCount"] == 2  # one bucket x two series
    assert d["seriesCountByMetricName"] == [{"name": "m", "value": 2}]
    assert {e["name"]: e["value"] for e in d["labelValueCountByLabelName"]} == {
        "__name__": 1,
        "s": 2,
    }
    pairs = {e["name"]: e["value"] for e in d["seriesCountByLabelValuePair"]}
    assert pairs == {"__name__=m": 2, "s=a": 1, "s=b": 1}
    json.dumps(resp)


def test_federate_text_format(store):
    from tsdb_spark.api import federate

    out = federate(store, ['m{s="a"}', 'm{s="b"}'], 600_000)
    lines = out.strip().splitlines()
    assert len(lines) == 2
    assert 'm{s="a"} 10 600000' in lines
    assert 'm{s="b"} 20 600000' in lines
    # overlapping selectors dedup
    out2 = federate(store, ["m", 'm{s="a"}'], 600_000)
    assert len(out2.strip().splitlines()) == 2


def test_federate_sample_timestamp_and_escaping(spark, tmp_path):
    from tsdb_spark.api import federate

    # a series whose last sample precedes the evaluation instant, and a
    # label value needing exposition-format escaping
    rows = [
        ({"__name__": "m", "q": 'say "hi"\\now'}, 10_000, 1.5),
        ({"__name__": "m", "q": "plain"}, 25_000, 2.0),
    ]
    db = DB.create(spark, str(tmp_path / "fed"), block_width_ms=WIDTH)
    db.append(spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))
    out = federate(db, ["m"], 60_000, lookback_ms=300_000)
    lines = out.strip().splitlines()
    # the SAMPLE's own timestamp is exposed, not the eval instant
    assert 'm{q="plain"} 2 25000' in lines
    # backslash and quote escaped per the exposition format
    assert 'm{q="say \\"hi\\"\\\\ow"} 1.5 10000' in lines or any(
        "say" in ln for ln in lines
    )
    esc = next(ln for ln in lines if "say" in ln)
    assert '\\"hi\\"' in esc and "\\\\" in esc


def test_http_post_forms_and_rules_alerts(store):
    import threading
    import urllib.request

    from tsdb_spark.api import serve
    from tsdb_spark.rules import AlertRule, Rule

    groups = [
        {
            "name": "g1",
            "interval_ms": 300_000,
            "rules": [
                Rule("s:m:sum5m", "sum by (s) (sum_over_time(m[5m]))"),
                AlertRule(
                    "HighM", "m > 15", for_ms=600_000, labels=(("sev", "p1"),)
                ),
            ],
        }
    ]
    srv = serve(store, "127.0.0.1", 0, rule_groups=groups)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}"
            ) as r:
                return r.status, json.loads(r.read())

        def post(path, data):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=data.encode(),
                headers={"Content-Type": "application/x-www-form-urlencoded"},
                method="POST",
            )
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read())

        # POST form body carries the same params as a GET query string
        code, body = post("/api/v1/query", "query=m&time=600")
        assert code == 200 and len(body["data"]["result"]) == 2
        code, body = post(
            "/api/v1/query_range", "query=m&start=300&end=600&step=5m"
        )
        assert code == 200 and body["data"]["resultType"] == "matrix"

        # rule discovery
        code, body = get("/api/v1/rules")
        assert code == 200
        g = body["data"]["groups"][0]
        assert g["name"] == "g1" and g["interval"] == 300.0
        kinds = {r["type"] for r in g["rules"]}
        assert kinds == {"recording", "alerting"}
        alerting = next(r for r in g["rules"] if r["type"] == "alerting")
        assert alerting["duration"] == 600.0
        assert alerting["keepFiringFor"] == 0.0
        assert alerting["labels"] == {"sev": "p1"}

        # active alerts at a given instant: m > 15 holds for s=b from
        # t=480s (v=16); at t=600s it has been active for 120s < 600s
        # `for` → pending
        code, body = get("/api/v1/alerts?time=600")
        assert code == 200
        alerts = body["data"]["alerts"]
        assert len(alerts) == 1
        a = alerts[0]
        assert a["labels"]["alertname"] == "HighM"
        assert a["labels"]["s"] == "b" and a["labels"]["sev"] == "p1"
        assert a["state"] == "pending"

        # at t=1140s the condition has held ≥ 600s → firing
        code, body = get("/api/v1/alerts?time=1140")
        states = {
            (x["labels"]["s"], x["state"]) for x in body["data"]["alerts"]
        }
        assert ("b", "firing") in states
    finally:
        srv.shutdown()


def test_parse_format_metadata_buildinfo(store):
    import threading
    import urllib.request

    from tsdb_spark.api import serve

    srv = serve(store, "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}"
            ) as r:
                return r.status, json.loads(r.read())

        from urllib.parse import quote

        expr = "sum by (s) (rate(m[5m]))"
        code, body = get(f"/api/v1/parse_query?query={quote(expr)}")
        assert code == 200
        assert body["data"]["type"] == "Aggregate"
        assert body["data"]["child"]["type"] == "FuncCall"

        code, body = get(f"/api/v1/format_query?query={quote(expr)}")
        assert code == 200
        # fixed point: formatting the formatted string is stable
        code2, body2 = get(
            f"/api/v1/format_query?query={quote(body['data'])}"
        )
        assert body2["data"] == body["data"]

        code, body = get("/api/v1/metadata")
        assert code == 200 and body["data"] == {"m": []}

        code, body = get("/api/v1/status/buildinfo")
        assert code == 200 and body["data"]["application"] == "tsdb-spark"

        # a bad expression is a 400, not a 500
        import urllib.error

        try:
            get("/api/v1/parse_query?query=rate(m)")
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()


def test_query_histogram_wire_shape(spark, tmp_path):
    from tsdb_spark.api import query_histogram
    from tsdb_spark import labels as L
    from tsdb_spark.nativehist import build_histograms

    rows = [({"__name__": "lat", "s": "a"}, 1_000 + i * 1_000, v)
            for i, v in enumerate([0.7, 1.5, 3.0, 0.0])]
    df = spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
    ).withColumn("labels_str", L.labels_str_expr("labels"))
    db = DB.create(spark, str(tmp_path / "qh"), block_width_ms=60_000)
    db.append_histograms(build_histograms(df, 10_000).select(
        "labels", "t", "h"))

    resp = query_histogram(db, 'lat{s="a"}', 30_000, lookback_ms=60_000)
    assert resp["data"]["resultType"] == "vector"
    (e,) = resp["data"]["result"]
    assert e["metric"] == {"__name__": "lat", "s": "a"}
    ts, h = e["histogram"]
    assert ts == 30.0  # the eval instant, upstream /query semantics
    assert h["count"] == "4" and abs(float(h["sum"]) - 5.2) < 1e-9
    # zero bucket closed-both at [0,0], exponential buckets open-left
    assert h["buckets"][0] == [3, "0", "0", "1"]
    assert [b[0] for b in h["buckets"][1:]] == [0, 0, 0]
    assert h["buckets"][1][1:] == ["0.5", "1", "1"]   # (0.5,1]: 0.7
    assert h["buckets"][2][1:] == ["1", "2", "1"]     # (1,2]: 1.5
    assert h["buckets"][3][1:] == ["2", "4", "1"]     # (2,4]: 3.0
    json.dumps(resp)

    # served over HTTP too
    import threading
    import urllib.request
    from urllib.parse import quote

    from tsdb_spark.api import serve

    srv = serve(db, "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v1/query_histogram"
            f"?time=30&match[]={quote('lat')}"
        ) as r:
            body = json.loads(r.read())
        assert body["data"]["result"][0]["histogram"][1]["count"] == "4"
    finally:
        srv.shutdown()


def test_admin_api(spark, tmp_path):
    """/api/v1/admin/tsdb/* (api.go deleteSeries/cleanTombstones/
    snapshot): gated off by default (503), POST-only (405), and the
    delete → clean → snapshot flow mutates the store for real."""
    import os
    import threading
    import urllib.error
    import urllib.request
    from urllib.parse import quote

    from tsdb_spark.api import serve

    rows = []
    for s in ("a", "b"):
        for i in range(20):
            rows.append(({"__name__": "m", "s": s}, i * 60_000, float(i)))
    db = DB.create(spark, str(tmp_path / "admin_db"), block_width_ms=WIDTH)
    db.append(spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))

    def call(port, path, method="POST", want_err=None):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}", method=method, data=b""
        )
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, r.read()
        except urllib.error.HTTPError as e:
            assert want_err == e.code, (path, e.code, e.read())
            return e.code, e.read()

    # disabled by default → 503 admin APIs disabled (adminDisabled)
    srv = serve(db, "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        code, body = call(
            port, "/api/v1/admin/tsdb/clean_tombstones", want_err=503
        )
        assert b"admin APIs disabled" in body
    finally:
        srv.shutdown()

    srv = serve(db, "127.0.0.1", 0, enable_admin=True)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        # GET on an admin route → 405 (upstream registers POST/PUT only)
        code, _ = call(
            port, "/api/v1/admin/tsdb/snapshot", method="GET", want_err=405
        )
        # missing match[] → 400
        code, _ = call(
            port, "/api/v1/admin/tsdb/delete_series", want_err=400
        )
        # delete series s="a" within [60s, 300s] → 204, reads shrink
        before = db.querier(0, 10**9).select([]).count()
        code, _ = call(
            port,
            "/api/v1/admin/tsdb/delete_series?match[]="
            + quote('m{s="a"}') + "&start=60&end=300",
        )
        assert code == 204
        after = db.querier(0, 10**9).select([]).count()
        assert after == before - 5  # t=60..300s inclusive, 5 samples

        code, _ = call(port, "/api/v1/admin/tsdb/clean_tombstones")
        assert code == 204
        assert db.querier(0, 10**9).select([]).count() == after

        code, raw = call(port, "/api/v1/admin/tsdb/snapshot")
        assert code == 200
        name = json.loads(raw)["data"]["name"]
        snap = os.path.join(db.path, "snapshots", name)
        assert os.path.isdir(snap)
        snap_db = DB.open(spark, snap)
        assert snap_db.querier(0, 10**9).select([]).count() == after
    finally:
        srv.shutdown()


def test_admin_api_readonly_store_forbidden(spark, tmp_path):
    import threading
    import urllib.error
    import urllib.request

    from tsdb_spark.api import serve

    db = DB.create(spark, str(tmp_path / "ro_db"), block_width_ms=WIDTH)
    db.append(spark.createDataFrame(
        [({"__name__": "m"}, 0, 1.0)],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))
    ro = DB.open_readonly(spark, db.path)
    srv = serve(ro, "127.0.0.1", 0, enable_admin=True)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/admin/tsdb/clean_tombstones",
            method="POST", data=b"",
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError("read-only mutation must 403")
        except urllib.error.HTTPError as e:
            assert e.code == 403
    finally:
        srv.shutdown()


def test_query_exemplars(spark, tmp_path):
    """Exemplar storage (upstream tsdb/exemplar.go CircularExemplarStorage
    + api.go queryExemplars): append → pruned select → wire shape; exact
    duplicates collapse across appends; retention drops by the same
    clock as samples."""
    import threading
    import urllib.request
    from urllib.parse import quote

    from tsdb_spark.api import query_exemplars, serve

    db = DB.create(spark, str(tmp_path / "ex_db"), block_width_ms=WIDTH)
    db.append(spark.createDataFrame(
        [({"__name__": "http_req", "job": "api"}, 0, 1.0),
         ({"__name__": "http_req", "job": "web"}, 0, 2.0)],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))
    ex_rows = [
        ({"__name__": "http_req", "job": "api"}, 60_000, 6.0,
         {"trace_id": "abc"}),
        ({"__name__": "http_req", "job": "api"}, 120_000, 7.5,
         {"trace_id": "def"}),
        ({"__name__": "http_req", "job": "web"}, 60_000, 3.0,
         {"trace_id": "xyz"}),
        # far-future exemplar for the retention check (2nd bucket)
        ({"__name__": "http_req", "job": "web"}, WIDTH + 60_000, 4.0,
         {"trace_id": "late"}),
    ]
    schema = ("labels MAP<STRING,STRING>, t LONG, v DOUBLE, "
              "exemplar MAP<STRING,STRING>")
    db.append_exemplars(spark.createDataFrame(ex_rows, schema))
    # a second append carrying ONE exact duplicate → must collapse
    db.append_exemplars(spark.createDataFrame([ex_rows[0]], schema))

    resp = query_exemplars(db, 'http_req{job="api"}', 0, 10**9)
    assert resp["status"] == "success"
    (s,) = resp["data"]
    assert s["seriesLabels"] == {"__name__": "http_req", "job": "api"}
    assert s["exemplars"] == [
        {"labels": {"trace_id": "abc"}, "value": "6", "timestamp": 60.0},
        {"labels": {"trace_id": "def"}, "value": "7.5", "timestamp": 120.0},
    ]
    json.dumps(resp)

    # time-scoped: end=90s keeps only the first exemplar
    resp = query_exemplars(db, "http_req", 0, 90_000)
    assert [len(s["exemplars"]) for s in resp["data"]] == [1, 1]

    # over HTTP
    srv = serve(db, "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v1/query_exemplars"
            f"?query={quote('http_req{job=%22web%22}'.replace('%22', chr(34)))}"
            f"&start=0&end=1000000"
        ) as r:
            body = json.loads(r.read())
        (s,) = body["data"]
        assert s["seriesLabels"]["job"] == "web"
        assert [e["labels"]["trace_id"] for e in s["exemplars"]] == [
            "xyz", "late"
        ]
    finally:
        srv.shutdown()

    # retention drops the first bucket's exemplars with the samples
    db.retain_after(WIDTH)
    resp = query_exemplars(db, "http_req", 0, 10**9)
    assert [e["labels"]["trace_id"]
            for s in resp["data"] for e in s["exemplars"]] == ["late"]


def test_status_routes(spark, tmp_path):
    """status/runtimeinfo, status/flags, status/config (api.go
    serveRuntimeInfo/serveFlags/serveConfig): present, JSON-wired, and
    success-shaped."""
    import threading
    import urllib.request

    from tsdb_spark.api import serve

    db = DB.create(spark, str(tmp_path / "st_db"), block_width_ms=WIDTH)
    db.append(spark.createDataFrame(
        [({"__name__": "m"}, 0, 1.0)],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))
    srv = serve(db, "127.0.0.1", 0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        def get(path):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                return json.loads(r.read())

        ri = get("/api/v1/status/runtimeinfo")
        assert ri["status"] == "success" and "startTime" in ri["data"]
        fl = get("/api/v1/status/flags")
        assert fl["data"]["query.lookback-delta"] == "5m"
        cf = get("/api/v1/status/config")
        assert "yaml" in cf["data"]
    finally:
        srv.shutdown()


def test_match_and_limit_params(spark, tmp_path):
    """3.x surface: repeated match[] union-scopes labels/label_values/
    series; `limit` truncates sorted results with the upstream warning."""
    from tsdb_spark.api import label_values, labels, query_range, series

    rows = []
    for i in range(5):
        rows.append(({"__name__": "m", "s": f"s{i}", "only_m": "1"}, 0, float(i)))
        rows.append(({"__name__": "n", "s": f"s{i}"}, 0, float(i)))
    db = DB.create(spark, str(tmp_path / "ml_db"), block_width_ms=WIDTH)
    db.append(spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))

    # match[] scoping: only_m appears only under the m selector
    assert "only_m" in labels(db, ["m"])["data"]
    assert "only_m" not in labels(db, ["n"])["data"]
    # union across repeated match[]
    assert "only_m" in labels(db, ["n", "m"])["data"]

    lv = label_values(db, "s", ["m"], limit=2)
    assert lv["data"] == ["s0", "s1"]
    assert lv["warnings"] == ["results truncated due to limit"]

    sr = series(db, ["m", "n"], 0, 10**9)
    assert len(sr["data"]) == 10
    sr2 = series(db, ["m"], 0, 10**9, limit=3)
    assert len(sr2["data"]) == 3 and "warnings" in sr2

    qr = query_range(db, "m", 0, 60_000, 60_000)
    assert len(qr["data"]["result"]) == 5
    from tsdb_spark.api import _limit_query

    t = _limit_query(qr, 2)
    assert len(t["data"]["result"]) == 2 and "warnings" in t


def test_query_exemplars_full_promql_expr(spark, tmp_path):
    """queryExemplars accepts a full PromQL expression and extracts its
    selectors (parser.ExtractSelectors): exemplars of every selector in
    the expr, unioned and deduped."""
    from tsdb_spark.api import query_exemplars

    db = DB.create(spark, str(tmp_path / "exq_db"), block_width_ms=WIDTH)
    db.append(spark.createDataFrame(
        [({"__name__": "a", "j": "x"}, 0, 1.0),
         ({"__name__": "b", "j": "x"}, 0, 2.0),
         ({"__name__": "c", "j": "x"}, 0, 3.0)],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))
    db.append_exemplars(spark.createDataFrame(
        [({"__name__": "a", "j": "x"}, 60_000, 1.0, {"trace_id": "ta"}),
         ({"__name__": "b", "j": "x"}, 60_000, 2.0, {"trace_id": "tb"}),
         ({"__name__": "c", "j": "x"}, 60_000, 3.0, {"trace_id": "tc"})],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE, "
        "exemplar MAP<STRING,STRING>"))

    resp = query_exemplars(
        db, 'sum(rate(a[5m])) / on() sum(rate(b[5m]))', 0, 10**9)
    names = sorted(s["seriesLabels"]["__name__"] for s in resp["data"])
    assert names == ["a", "b"]  # c's exemplars not selected

    import pytest as _pytest
    with _pytest.raises(ValueError):
        query_exemplars(db, "1 + 2", 0, 10**9)


def test_query_scalar_result_type(store):
    # upstream /api/v1/query returns resultType "scalar" for
    # scalar-typed expressions (web/api/v1 promql.Scalar rendering)
    resp = query(store, "2 + 3", 600_000)
    assert resp["data"]["resultType"] == "scalar"
    assert resp["data"]["result"] == [600.0, "5"]
    resp = query(store, "time()", 600_000)
    assert resp["data"]["resultType"] == "scalar"
    assert resp["data"]["result"] == [600.0, "600"]
    resp = query(store, "scalar(sum(m))", 600_000)
    assert resp["data"]["resultType"] == "scalar"
    assert resp["data"]["result"][1] == "30"
    # compound scalar expressions type scalar too (checkAST recursion):
    # `1 + time()` is BinDynScalar, `scalar(x) * 2` is BinScalar
    resp = query(store, "1 + time()", 600_000)
    assert resp["data"]["resultType"] == "scalar"
    assert resp["data"]["result"] == [600.0, "601"]
    resp = query(store, "scalar(sum(m)) * 2", 600_000)
    assert resp["data"]["resultType"] == "scalar"
    assert resp["data"]["result"][1] == "60"
    resp = query(store, "scalar(sum(m)) + scalar(sum(m))", 600_000)
    assert resp["data"]["resultType"] == "scalar"
    assert resp["data"]["result"][1] == "60"
    # vector(5) stays a vector; range queries stay matrices
    assert query(store, "vector(5)", 600_000)["data"]["resultType"] == "vector"
    rr = query_range(store, "2 + 3", 300_000, 600_000, 300_000)
    assert rr["data"]["resultType"] == "matrix"
    assert rr["data"]["result"][0]["metric"] == {}
    assert [v for _, v in rr["data"]["result"][0]["values"]] == ["5", "5"]


def test_federate_utf8_names(spark, tmp_path):
    # 3.x exposition: UTF-8 metric/label names render quoted inside the
    # braces, the metric name as the first term
    from tsdb_spark.api import federate

    rows = [
        ({"__name__": "my.metric", "label with space": "v1"}, 10_000, 1.0),
        ({"__name__": "plain", "ok_name": "v2"}, 10_000, 2.0),
    ]
    db = DB.create(spark, str(tmp_path / "utf8"), block_width_ms=WIDTH)
    db.append(spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))
    lines = federate(db, ['{ok_name="v2"}', '{"my.metric"}'],
                     60_000, lookback_ms=300_000).strip().splitlines()
    assert '{"my.metric","label with space"="v1"} 1 10000' in lines
    assert 'plain{ok_name="v2"} 2 10000' in lines


def test_health_and_ready_probes(spark, tmp_path):
    import threading
    import urllib.request

    from tsdb_spark import DB
    from tsdb_spark.api import serve

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=3_600_000)
    srv = serve(db, "127.0.0.1", 0)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        for path, want in (("/-/healthy", b"Healthy.\n"), ("/-/ready", b"Ready.\n")):
            with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
                assert r.status == 200 and r.read() == want
    finally:
        srv.shutdown()
