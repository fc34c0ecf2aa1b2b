"""Prometheus HTTP-API response shapes over the range evaluator.

The reference storage engine serves Prometheus's web/api/v1 layer
(web/api/v1/api.go in prometheus/prometheus), whose wire format is the
contract every dashboard/client in the ecosystem consumes:

    {"status": "success",
     "data": {"resultType": "matrix",
              "result": [{"metric": {...labels...},
                          "values": [[unix_seconds, "value"], ...]}]}}

This module renders the evaluator's DataFrames into exactly that JSON
shape — `query_range` (resultType "matrix") and `query` (instant,
resultType "vector") — so a consumer of the upstream API can read this
engine's answers unchanged.

Driver-side by design: the API layer is a serving surface, collecting
an already-aggregated grid result (rows = series × grid points — the
same volume upstream marshals), never raw samples.
"""

from __future__ import annotations

import math

from tsdb_spark.promql import DEFAULT_LOOKBACK_MS, eval_range_db


def format_value(v: float) -> str:
    """Prometheus renders sample values with Go's shortest round-trip
    float formatting (strconv.FormatFloat(v, 'f', -1, 64)); Python's
    repr is the same shortest-round-trip contract, with integral
    values collapsed to their integer rendering like Go's."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _series_rows(df):
    aux = ("t", "value", "labels", "labels_str")
    has_labels = "labels" in df.columns
    label_cols = [c for c in df.columns if c not in aux]
    out: dict[tuple, dict] = {}
    for row in df.collect():
        metric = (
            dict(row["labels"])
            if has_labels and row["labels"] is not None
            else {k: str(row[k]) for k in label_cols if row[k] is not None}
        )
        # engine convention (F14, head.go:832-833): empty value == absent
        metric = {k: v for k, v in metric.items() if v not in ("", None)}
        key = tuple(sorted(metric.items()))
        entry = out.setdefault(key, {"metric": metric, "values": []})
        entry["values"].append([row["t"] / 1000.0, format_value(row["value"])])
    for entry in out.values():
        entry["values"].sort(key=lambda p: p[0])
    return [out[k] for k in sorted(out)]


def query_range(
    db,
    expr: str,
    start: int,
    end: int,
    step: int,
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
) -> dict:
    """GET /api/v1/query_range — resultType "matrix"."""
    df = eval_range_db(db, expr, start, end, step, lookback_ms)
    return {
        "status": "success",
        "data": {"resultType": "matrix", "result": _series_rows(df)},
    }


def query(
    db,
    expr: str,
    time_ms: int,
    lookback_ms: int = DEFAULT_LOOKBACK_MS,
) -> dict:
    """GET /api/v1/query — one-point grid, resultType "vector"."""
    df = eval_range_db(db, expr, time_ms, time_ms, 1, lookback_ms)
    result = [
        {"metric": s["metric"], "value": s["values"][-1]}
        for s in _series_rows(df)
    ]
    return {
        "status": "success",
        "data": {"resultType": "vector", "result": result},
    }


def labels(db) -> dict:
    """GET /api/v1/labels (api.go labelNames → the engine's A2
    LabelNames)."""
    vals = [r[0] for r in db.label_names().collect()]
    return {"status": "success", "data": sorted(vals)}


def label_values(db, name: str) -> dict:
    """GET /api/v1/label/<name>/values (api.go labelValues → the
    engine's A1 LabelValues)."""
    vals = [r[0] for r in db.label_values(name).collect()]
    return {"status": "success", "data": sorted(vals)}


def series(db, selector: str, mint: int, maxt: int) -> dict:
    """GET /api/v1/series — the label sets matching a selector in a
    range (api.go series → Querier.Select with label projection)."""
    from tsdb_spark.labels import parse_selector

    # Spark cannot set-op on MAP columns; dedup on the canonical
    # labels_str key and keep one map per series.
    dim = (
        db.querier(mint, maxt)
        .select(parse_selector(selector), with_labels=True)
        .select("labels_str", "labels")
        .dropDuplicates(["labels_str"])
    )
    data = sorted(
        (dict(r["labels"]) for r in dim.collect()),
        key=lambda m: sorted(m.items()),
    )
    return {"status": "success", "data": data}


def status_tsdb(db, limit: int = 10) -> dict:
    """GET /api/v1/status/tsdb (api.go serveTSDBStatus): head stats +
    the four top-card cardinality lists. Every statistic is a
    combinable aggregation over the series dim / samples — the same
    plans as `tsdb analyze` (analyze.py), trimmed to top-`limit`."""
    from pyspark.sql import functions as F

    ser = db.series()
    expl = ser.select(F.explode("labels").alias("name", "value"))
    hs = db.samples().agg(
        F.min("t").alias("mint"),
        F.max("t").alias("maxt"),
        F.countDistinct("series_id", "t_bucket").alias("chunks"),
    ).collect()[0]

    def top(df, name_col, value_col):
        return [
            {"name": r[0], "value": int(r[1])}
            for r in df.select(name_col, value_col)
            .orderBy(F.desc(value_col), name_col)
            .limit(limit)
            .collect()
        ]

    by_metric = top(
        expl.filter(F.col("name") == "__name__")
        .groupBy("value")
        .agg(F.count("*").alias("n")),
        "value",
        "n",
    )
    val_count = top(
        expl.groupBy("name").agg(F.countDistinct("value").alias("n")),
        "name",
        "n",
    )
    mem_by_name = top(
        expl.groupBy("name").agg(F.sum(F.length("value")).alias("n")),
        "name",
        "n",
    )
    by_pair = top(
        expl.groupBy(
            F.concat_ws("=", "name", "value").alias("pair")
        ).agg(F.count("*").alias("n")),
        "pair",
        "n",
    )
    return {
        "status": "success",
        "data": {
            "headStats": {
                "numSeries": ser.count(),
                "numLabelPairs": expl.distinct().count(),
                "chunkCount": int(hs["chunks"] or 0),
                "minTime": int(hs["mint"]) if hs["mint"] is not None else None,
                "maxTime": int(hs["maxt"]) if hs["maxt"] is not None else None,
            },
            "seriesCountByMetricName": by_metric,
            "labelValueCountByLabelName": val_count,
            "memoryInBytesByLabelName": mem_by_name,
            "seriesCountByLabelValuePair": by_pair,
        },
    }


# ------------------------------------------------------------ HTTP


def _parse_time(s: str) -> int:
    """Unix seconds (float ok) → epoch ms, the API's time params."""
    return int(float(s) * 1000)


def _parse_step(s: str) -> int:
    """`step` is either a duration string ("30s", "1h") or float
    seconds, per the upstream query_range contract."""
    from tsdb_spark.promql import parse_duration

    try:
        return parse_duration(s)
    except ValueError:
        return int(float(s) * 1000)


def make_handler(db):
    """BaseHTTPRequestHandler subclass bound to one DB — the web/api/v1
    router (api.go Register): query, query_range, labels,
    label/<name>/values, series. The handler is a thin driver-side
    front; every query underneath is the distributed evaluator."""
    import json
    from http.server import BaseHTTPRequestHandler
    from urllib.parse import parse_qs, urlparse

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_text(self, code: int, text: str) -> None:
            body = text.encode()
            self.send_response(code)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (http.server contract)
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            multi = parse_qs(u.query)
            try:
                if u.path == "/api/v1/query":
                    t = _parse_time(q["time"]) if "time" in q else None
                    if t is None:
                        raise ValueError("missing `time` parameter")
                    return self._reply(200, query(db, q["query"], t))
                if u.path == "/api/v1/query_range":
                    return self._reply(
                        200,
                        query_range(
                            db,
                            q["query"],
                            _parse_time(q["start"]),
                            _parse_time(q["end"]),
                            _parse_step(q["step"]),
                        ),
                    )
                if u.path == "/api/v1/labels":
                    return self._reply(200, labels(db))
                if u.path == "/api/v1/status/tsdb":
                    return self._reply(200, status_tsdb(db))
                if u.path == "/federate":
                    sels = multi.get("match[]", [])
                    if not sels:
                        raise ValueError("missing `match[]` parameter")
                    t = _parse_time(q["time"]) if "time" in q else None
                    if t is None:
                        raise ValueError("missing `time` parameter")
                    return self._reply_text(200, federate(db, sels, t))
                if u.path.startswith("/api/v1/label/") and u.path.endswith(
                    "/values"
                ):
                    name = u.path[len("/api/v1/label/"):-len("/values")]
                    return self._reply(200, label_values(db, name))
                if u.path == "/api/v1/series":
                    sel = multi.get("match[]", [None])[0]
                    if sel is None:
                        raise ValueError("missing `match[]` parameter")
                    mint = _parse_time(q.get("start", "-9e9"))
                    maxt = _parse_time(q.get("end", "9e9"))
                    return self._reply(200, series(db, sel, mint, maxt))
                return self._reply(
                    404,
                    {"status": "error", "errorType": "not_found",
                     "error": f"unknown path {u.path}"},
                )
            except (KeyError, ValueError) as e:
                return self._reply(
                    400,
                    {"status": "error", "errorType": "bad_data",
                     "error": str(e)},
                )

    return Handler


def serve(db, host: str = "127.0.0.1", port: int = 9090):
    """Run the HTTP API (blocking). Returns the server object if you
    want to drive it yourself (tests use server.serve_forever in a
    thread)."""
    from http.server import ThreadingHTTPServer

    srv = ThreadingHTTPServer((host, port), make_handler(db))
    return srv


def federate(db, selectors: list[str], time_ms: int, lookback_ms: int = DEFAULT_LOOKBACK_MS) -> str:
    """GET /federate — the instant vector for each match[] selector in
    the Prometheus exposition text format (web/federate.go):

        metric_name{label="v",...} value timestamp_ms

    so another Prometheus (or this engine) can scrape this store."""
    from tsdb_spark.labels import parse_selector
    from tsdb_spark.promql import RangeQuery
    from pyspark.sql import functions as F

    lines: list[str] = []
    seen: set[str] = set()
    for sel in selectors:
        matchers = parse_selector(sel)
        frame = db.querier(time_ms - lookback_ms + 1, time_ms).select(
            [], with_labels=True
        )
        q = RangeQuery(frame, time_ms, time_ms, 1, lookback_ms)
        from tsdb_spark.promql import Selector

        out = q.run(Selector(matchers))
        for row in out.collect():
            labels = dict(row["labels"])
            name = labels.pop("__name__", "")
            pairs = ",".join(
                f'{k}="{v}"' for k, v in sorted(labels.items()) if v
            )
            line = (
                f"{name}{{{pairs}}} {format_value(row['value'])} {row['t']}"
            )
            if line not in seen:  # overlapping selectors dedup
                seen.add(line)
                lines.append(line)
    return "\n".join(sorted(lines)) + ("\n" if lines else "")
