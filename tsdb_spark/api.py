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
import re
import time as _time

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
    """GET /api/v1/query — one-point grid, resultType "vector"; a
    scalar-typed expression (`2+3`, `scalar(...)`, `time()`) returns
    resultType "scalar" with one [ts, value] pair, as upstream
    (web/api/v1 promql.Scalar rendering). Range queries keep "matrix"
    for scalars too — the upstream engine returns a Matrix with one
    metricless series there."""
    from tsdb_spark.promql import _scalar_typed, parse_expr

    df = eval_range_db(db, expr, time_ms, time_ms, 1, lookback_ms)
    node = parse_expr(expr)
    # parse-time scalar typing (promql._scalar_typed, the same rule
    # vector() uses): covers compound scalars like `1 + time()` and
    # `scalar(x) * 2`, not just bare Number/scalar()/time()
    if _scalar_typed(node):
        rows = df.collect()
        val = format_value(rows[0]["value"]) if rows else "NaN"
        return {
            "status": "success",
            "data": {
                "resultType": "scalar",
                "result": [time_ms / 1000.0, val],
            },
        }
    result = [
        {"metric": s["metric"], "value": s["values"][-1]}
        for s in _series_rows(df)
    ]
    return {
        "status": "success",
        "data": {"resultType": "vector", "result": result},
    }


def query_histogram(
    db, selector: str, time_ms: int, lookback_ms: int = DEFAULT_LOOKBACK_MS
) -> dict:
    """GET /api/v1/query_histogram — the instant vector of NATIVE
    histogram samples in the upstream wire shape (api.go + model:
    resultType "vector" with a `histogram` field instead of `value`):

        {"metric": {...}, "histogram": [ts, {"count": "6", "sum": "16",
         "buckets": [[3, "0", "0", "1"], [0, "1", "2", "2"], ...]}]}

    bucket boundary rules per upstream: 0 = open-left (the exponential
    positive buckets), 3 = closed-both (the zero bucket, [0, 0] in this
    engine's zero-threshold-0 subset). Upstream serves histograms
    through the same /query route when the samples ARE histograms; this
    engine's float/histogram table split makes that ambiguous, so the
    dedicated route is the documented seam."""
    from pyspark.sql import functions as F

    from tsdb_spark.labels import parse_selector

    matchers = parse_selector(selector)
    frame = db.hist_frame(
        time_ms - lookback_ms + 1, time_ms, matchers=matchers
    )
    out = frame.groupBy("labels_str").agg(
        F.first("labels").alias("labels"),
        F.max_by("h", "t").alias("h"),
        F.lit(time_ms).alias("t"),  # upstream stamps the eval instant
    )
    result = []
    for row in out.collect():
        h = row["h"]
        buckets = [
            [3, "0", "0", format_value(h["zero_count"])]
        ] if h["zero_count"] else []
        cv = list(h["custom_values"] or [])
        if h["schema"] == -53 and cv:
            # NHCB bounds come from custom_values (0-based idx; the
            # overflow bucket's upper is +Inf; first bucket from 0)
            def bounds(i):
                lo = 0.0 if i == 0 else cv[i - 1]
                hi = cv[i] if i < len(cv) else float("inf")
                return lo, hi
        else:
            base = 2.0 ** (2.0 ** -h["schema"])

            def bounds(i):
                return base ** (i - 1), base ** i

        for b in h["buckets"]:
            lo, hi = bounds(b["idx"])
            buckets.append(
                [0, format_value(lo), format_value(hi), format_value(b["c"])]
            )
        metric = {k: v for k, v in dict(row["labels"]).items() if v}
        result.append(
            {
                "metric": metric,
                "histogram": [
                    row["t"] / 1000.0,
                    {
                        "count": format_value(h["count"]),
                        "sum": format_value(h["sum"]),
                        "buckets": buckets,
                    },
                ],
            }
        )
    result.sort(key=lambda e: sorted(e["metric"].items()))
    return {
        "status": "success",
        "data": {"resultType": "vector", "result": result},
    }


def _selectors_of(expr: str) -> list:
    """Every vector/matrix selector's matcher list inside a full PromQL
    expression — upstream queryExemplars accepts any expression and
    extracts its selectors (parser.ExtractSelectors). Walks the parsed
    AST generically over dataclass fields."""
    import dataclasses

    from tsdb_spark.promql import Selector, parse_expr

    out: list = []
    seen: set[int] = set()

    def walk(node):
        if node is None or id(node) in seen or not dataclasses.is_dataclass(node):
            return
        seen.add(id(node))
        if isinstance(node, Selector):
            out.append(node.matchers)
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            for item in v if isinstance(v, (list, tuple)) else [v]:
                walk(item)

    walk(parse_expr(expr))
    if not out:
        raise ValueError(f"expression has no selector: {expr!r}")
    return out


def query_exemplars(db, selector: str, mint: int, maxt: int) -> dict:
    """GET /api/v1/query_exemplars (api.go queryExemplars →
    ExemplarQuerier.Select, prometheus 2.26+): exemplars attached to
    series matching ANY selector inside the query expression (a bare
    selector or a full PromQL expr — parser.ExtractSelectors semantics)
    within [start, end], grouped per series in the upstream wire shape:

        {"seriesLabels": {...}, "exemplars": [
            {"labels": {"trace_id": ...}, "value": "6",
             "timestamp": 1600096945.479}, ...]}

    One pruned scan of the exemplars side table joined to the filtered
    dim (db.exemplars_frame); the per-series grouping happens in the
    same job via collect_list after an in-partition sort, driver-side
    work is just JSON rendering."""
    from functools import reduce

    from pyspark.sql import DataFrame as _DF
    from pyspark.sql import functions as F

    frames = [
        db.exemplars_frame(mint, maxt, matchers=ms)
        for ms in _selectors_of(selector)
    ]
    frame = reduce(_DF.unionByName, frames)
    if len(frames) > 1:
        frame = frame.dropDuplicates(["labels_str", "t", "v"])
    # no pre-groupBy sort: a global sort would just be shuffled away by
    # the aggregation; ordering is applied on the collected (per-series,
    # bounded) exemplar lists driver-side
    grouped = frame.groupBy("labels_str").agg(
        F.first("labels").alias("labels"),
        F.collect_list(F.struct("t", "v", "exemplar")).alias("exs"),
    )
    data = []
    for row in grouped.collect():
        exs = sorted(row["exs"], key=lambda e: (e["t"], e["v"]))
        data.append(
            {
                "seriesLabels": {
                    k: v for k, v in dict(row["labels"]).items() if v
                },
                "exemplars": [
                    {
                        "labels": dict(e["exemplar"]),
                        "value": format_value(e["v"]),
                        "timestamp": e["t"] / 1000.0,
                    }
                    for e in exs
                ],
            }
        )
    data.sort(key=lambda s: sorted(s["seriesLabels"].items()))
    return {"status": "success", "data": data}


def _limited(payload: dict, data: list, limit: int) -> dict:
    """The 3.x `limit` parameter: truncate sorted results and surface
    the upstream warning (api.go truncates + appends to warnings)."""
    if limit and limit > 0 and len(data) > limit:
        payload["data"] = data[:limit]
        payload["warnings"] = ["results truncated due to limit"]
    return payload


def labels(db, selectors: list[str] | None = None, limit: int = 0) -> dict:
    """GET /api/v1/labels (api.go labelNames → the engine's A2
    LabelNames). Repeated match[] selectors scope the names to series
    matching ANY selector (upstream's union semantics); `limit`
    truncates with a warning (3.x)."""
    from functools import reduce

    from pyspark.sql import DataFrame as _DF

    from tsdb_spark.labels import parse_selector

    if selectors:
        df = reduce(
            _DF.union,
            [db.label_names(parse_selector(s)) for s in selectors],
        ).distinct()
    else:
        df = db.label_names()
    vals = sorted(r[0] for r in df.collect())
    return _limited({"status": "success", "data": vals}, vals, limit)


def label_values(
    db, name: str, selectors: list[str] | None = None, limit: int = 0
) -> dict:
    """GET /api/v1/label/<name>/values (api.go labelValues → the
    engine's A1 LabelValues). match[] scoping and `limit` as on
    /api/v1/labels."""
    from functools import reduce

    from pyspark.sql import DataFrame as _DF

    from tsdb_spark.labels import parse_selector

    if selectors:
        df = reduce(
            _DF.union,
            [db.label_values(name, parse_selector(s)) for s in selectors],
        ).distinct()
    else:
        df = db.label_values(name)
    vals = sorted(r[0] for r in df.collect())
    return _limited({"status": "success", "data": vals}, vals, limit)


def series(
    db, selectors: list[str] | str, mint: int, maxt: int, limit: int = 0
) -> dict:
    """GET /api/v1/series — the label sets matching any match[]
    selector in a range (api.go series → Querier.Select with label
    projection; repeated match[] union per upstream)."""
    from functools import reduce

    from pyspark.sql import DataFrame as _DF

    from tsdb_spark.labels import parse_selector

    if isinstance(selectors, str):
        selectors = [selectors]
    # Spark cannot set-op on MAP columns; dedup on the canonical
    # labels_str key and keep one map per series.
    frames = [
        db.querier(mint, maxt)
        .select(parse_selector(s), with_labels=True)
        .select("labels_str", "labels")
        for s in selectors
    ]
    dim = reduce(_DF.unionByName, frames).dropDuplicates(["labels_str"])
    data = sorted(
        (dict(r["labels"]) for r in dim.collect()),
        key=lambda m: sorted(m.items()),
    )
    return _limited({"status": "success", "data": data}, data, limit)


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
                # memoized per data version (db.series_count) — a status
                # probe must not re-count the dim on every request
                "numSeries": db.series_count(),
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


def parse_query(expr: str) -> dict:
    """GET /api/v1/parse_query (api.go parseQuery, prometheus 3.x):
    the parsed AST as a JSON tree — node dataclasses rendered with
    their type names, durations in ms as parsed."""
    import dataclasses

    from tsdb_spark.promql import parse_expr

    def walk(n):
        if n is None or isinstance(n, (int, float, str, bool)):
            return n
        if isinstance(n, (list, tuple)):
            return [walk(x) for x in n]
        if dataclasses.is_dataclass(n):
            out = {"type": type(n).__name__}
            for f in dataclasses.fields(n):
                out[f.name] = walk(getattr(n, f.name))
            return out
        return str(n)

    return {"status": "success", "data": walk(parse_expr(expr))}


def format_query(expr: str) -> dict:
    """GET /api/v1/format_query (api.go formatQuery): the expression
    pretty-printed from its AST (promql/parser ExprString analog —
    promql.render_expr, parse→render→parse fixed point)."""
    from tsdb_spark.promql import parse_expr, render_expr

    return {"status": "success", "data": render_expr(parse_expr(expr))}


def metadata(db, scrape_metadata: dict | None = None) -> dict:
    """GET /api/v1/metadata (api.go metricMetadata): per-metric
    metadata. When the process scrapes (serve --scrape-url), the
    HELP/TYPE/UNIT comments captured per pass (scrape.parse_metadata —
    upstream's scrape-cache MetadataList) render here; metrics seen
    only as samples map to an empty list, the shape clients expect when
    no metadata was scraped."""
    names = [r[0] for r in db.label_values("__name__").collect()]
    md = scrape_metadata or {}
    out = {}
    for n in sorted(set(names) | set(md)):
        m = md.get(n)
        out[n] = (
            [{"type": m.get("type", "unknown"), "help": m.get("help", ""),
              "unit": m.get("unit", "")}]
            if m
            else []
        )
    return {"status": "success", "data": out}


def buildinfo() -> dict:
    """GET /api/v1/status/buildinfo (api.go serveBuildInfo)."""
    import pyspark

    return {
        "status": "success",
        "data": {
            "application": "tsdb-spark",
            "version": "0.6.0",
            "features": {
                "native-histograms": "true",
                "promql-experimental-functions": "true",
            },
            "spark": pyspark.__version__,
        },
    }


def runtimeinfo(db) -> dict:
    """GET /api/v1/status/runtimeinfo (api.go serveRuntimeInfo): process
    facts an operator dashboards against. Storage retention comes from
    the store's meta; the reload/config rows have no analog (no config
    file), reported as the zero values upstream uses before first
    load."""
    import os
    import time

    return {
        "status": "success",
        "data": {
            "startTime": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime(_PROCESS_START)
            ),
            "CWD": os.getcwd(),
            "reloadConfigSuccess": True,
            "lastConfigTime": "1970-01-01T00:00:00Z",
            "corruptionCount": 0,
            "goroutineCount": 0,
            "storageRetention": str(
                db.meta.get("retention_ms", 0) or 0
            ) + "ms",
        },
    }


_PROCESS_START = __import__("time").time()


def flags() -> dict:
    """GET /api/v1/status/flags (api.go serveFlags): the runtime knobs a
    user would set as upstream CLI flags, valued from this engine's
    session/store defaults."""
    import os

    return {
        "status": "success",
        "data": {
            "web.enable-admin-api": "false",
            "query.lookback-delta": "5m",
            "storage.tsdb.directory": "",
            "spark.master": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        },
    }


def config() -> dict:
    """GET /api/v1/status/config (api.go serveConfig): upstream returns
    the loaded YAML; this engine is configured programmatically, so the
    canonical empty config is served (upstream's shape: {"yaml": ...})."""
    return {"status": "success", "data": {"yaml": "# configured programmatically\n"}}


def rules_payload(groups: list[dict]) -> dict:
    """GET /api/v1/rules (api.go rules → RuleDiscovery): the configured
    rule groups. Each group is {"name", "interval_ms", "rules": [Rule |
    AlertRule]} (tsdb_spark.rules dataclasses). Static discovery shape —
    health/lastEvaluation tracking lives in the caller's scheduler, as
    upstream's does in rules/manager.go."""
    from tsdb_spark.rules import AlertRule

    out = []
    for g in groups:
        rendered = []
        for r in g.get("rules", []):
            if isinstance(r, AlertRule):
                rendered.append(
                    {
                        "type": "alerting",
                        "name": r.name,
                        "query": r.expr,
                        "duration": r.for_ms / 1000.0,
                        "keepFiringFor": getattr(r, "keep_firing_ms", 0)
                        / 1000.0,
                        "labels": dict(r.labels),
                        "annotations": dict(getattr(r, "annotations", ())),
                        "state": "inactive",
                        "health": "ok",
                        "alerts": [],
                    }
                )
            else:
                rendered.append(
                    {
                        "type": "recording",
                        "name": r.name,
                        "query": r.expr,
                        "labels": dict(r.labels),
                        "health": "ok",
                    }
                )
        out.append(
            {
                "name": g.get("name", ""),
                "file": g.get("file", ""),
                "interval": g.get("interval_ms", 60_000) / 1000.0,
                "rules": rendered,
            }
        )
    return {"status": "success", "data": {"groups": out}}


def alerts_payload(db, groups: list[dict], time_ms: int) -> dict:
    """GET /api/v1/alerts (api.go alerts → AlertDiscovery): the active
    alerts across every alerting rule, evaluated at `time_ms`. Each
    rule's pending→firing state needs the activity history over its
    `for` window, so the rule evaluates over a grid of
    [T - ceil(for/interval)*interval, T] at the group interval and keeps
    the T row — the same state machine as rules.alerts_frame, never a
    per-step loop."""
    from tsdb_spark.rules import AlertRule, alerts_frame

    alerts = []
    for g in groups:
        step = int(g.get("interval_ms", 60_000))
        for r in g.get("rules", []):
            if not isinstance(r, AlertRule):
                continue
            # the state at T depends on activity over the `for` window,
            # extended by keep_firing_for history when set
            hist = r.for_ms + getattr(r, "keep_firing_ms", 0)
            back = -(-hist // step) * step if hist else 0
            frame = alerts_frame(db, r, time_ms - back, time_ms, step)
            for row in frame.filter(frame["t"] == time_ms).collect():
                lab = dict(row["labels"])
                lab.pop("__name__", None)
                state = lab.pop("alertstate", "pending")
                alerts.append(
                    {
                        "labels": {"alertname": r.name, **lab},
                        "annotations": dict(getattr(r, "annotations", ())),
                        "state": state,
                        "value": format_value(row["v"]),
                    }
                )
    alerts.sort(key=lambda a: sorted(a["labels"].items()))
    return {"status": "success", "data": {"alerts": alerts}}


# ------------------------------------------------------------ HTTP


def _limit_query(payload: dict, limit: int) -> dict:
    """3.x `limit` on the query endpoints: cap the number of returned
    SERIES (result entries), warning on truncation like api.go."""
    res = payload.get("data", {}).get("result")
    if limit and limit > 0 and isinstance(res, list) and len(res) > limit:
        payload["data"]["result"] = res[:limit]
        payload.setdefault("warnings", []).append(
            "results truncated due to limit"
        )
    return payload


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


def remote_write(db, raw: bytes) -> int:
    """POST /api/v1/write (prometheus/prometheus storage/remote
    write_handler.go; protocol spec: prometheus.io/docs/specs/remote_
    write_spec): snappy-block-compressed prompb WriteRequest → ONE batch
    append. The driver decodes the (small, sender-capped) body; the
    append is the distributed work — the same split as the scrape path.
    Exemplars riding the request (prompb TimeSeries field 3, spec §
    exemplars) land in the exemplar side table keyed by the series
    labels, like scrape-time exemplars. Returns the number of samples
    appended."""
    from tsdb_spark.sources.remotewrite import decode_write_request

    decoded = decode_write_request(
        raw, with_exemplars=True, with_histograms=True
    )
    return remote_write_apply(db, decoded)


def _decode_write_body(raw: bytes, content_type: str = ""):
    """Decode an /api/v1/write body. Any exception raised here is a
    malformed-request error (HTTP 400). Dispatches on the proto=
    Content-Type parameter: io.prometheus.write.v2.Request bodies go
    through the Remote-Write 2.0 decoder, everything else (including a
    missing header) through the 1.0 prompb.WriteRequest decoder, per
    the rw2 spec's backwards-compatibility rule."""
    ct = (content_type or "").lower()
    if "io.prometheus.write.v2.request" in ct:
        from tsdb_spark.sources.remotewrite import decode_write_request_v2

        return ("v2", decode_write_request_v2(raw))
    if "proto=" in ct and "prometheus.writerequest" not in ct:
        # an explicit proto= we don't speak → 415 per the rw2 spec
        # (the route maps UnsupportedMediaType to that status)
        raise UnsupportedMediaType(ct)
    from tsdb_spark.sources.remotewrite import decode_write_request

    return (
        "v1",
        decode_write_request(raw, with_exemplars=True, with_histograms=True),
    )


class UnsupportedMediaType(Exception):
    """Content negotiation failure on /api/v1/write → HTTP 415."""


def _apply_write_body(db, tagged) -> dict:
    """Commit a decoded /api/v1/write body; exceptions here are
    internal errors (HTTP 500, sender retries). Returns the written
    counts the rw2 spec requires receivers to report
    (X-Prometheus-Remote-Write-{Samples,Histograms,Exemplars}-Written)."""
    version, decoded = tagged
    if version == "v2":
        remote_write_apply_v2(db, decoded)
        return {
            "version": "v2",
            "samples": sum(len(e["samples"]) for e in decoded),
            "histograms": sum(len(e["histograms"]) for e in decoded),
            "exemplars": sum(len(e["exemplars"]) for e in decoded),
        }
    n_h = sum(len(e[3]) if len(e) > 3 else 0 for e in decoded)
    n = remote_write_apply(db, decoded) - n_h
    return {"version": "v1", "samples": n, "histograms": n_h,
            "exemplars": sum(len(e[2]) for e in decoded)}


class WriteBuffer:
    """Micro-batching ingest front for high-rate senders: each
    /api/v1/write (or OTLP) POST currently commits as its own Spark
    append — correct, but one driver job per request caps the request
    rate. With a WriteBuffer the handler ENQUEUES decoded rows (cheap,
    lock-held microseconds) and a background thread flushes the
    accumulated batch as ONE append per table every `flush_ms` (or at
    `max_rows`), so a thousand senders cost appends-per-window, not
    appends-per-POST — the same batching a scrape pass already does
    across targets.

    Durability trade, stated plainly: with buffering on, a 2xx means
    ACCEPTED (queued), not yet committed — a process crash inside the
    window loses the queued batch. That is the posture of any receiver
    that acks after an in-memory stage; the default serving path stays
    synchronous (buffer=None) where 2xx means committed. Opt in via
    `serve(..., write_buffer=WriteBuffer(db))` / `serve
    --write-buffer-ms`.

    `spill_path` upgrades the posture to DURABLE acks — the S8 WAL
    analog for the push path: every add() fsyncs the batch to a JSONL
    spill file before the handler 2xxes, flush() atomically rotates the
    spill alongside the queue swap and deletes the rotated segment only
    after the commit succeeds, and a restart replays whatever segments
    survive (dedup by line content hash, so a batch journaled twice —
    e.g. re-queued after a failed flush — ingests once; a crash BETWEEN
    commit and segment delete re-appends samples the store's identical-
    sample handling already accepts as no-ops)."""

    def __init__(self, db, flush_ms: int = 250, max_rows: int = 200_000,
                 spill_path: str | None = None):
        import threading as _threading

        self.db = db
        self.flush_ms = flush_ms
        self.max_rows = max_rows
        self._rows: list = []
        self._hists: list = []
        self._exemplars: list = []
        self._lock = _threading.Lock()
        # Serializes entire flush bodies (queue swap + appends). The
        # store's staged commits make concurrent DB.append calls safe on
        # their own, but a flush is a multi-append TRANSACTION (samples,
        # histograms, exemplars + the spill rotation) whose re-queue-on-
        # failure path assumes one flush owns the queue at a time.
        self._flush_lock = _threading.Lock()
        self.spill_path = spill_path
        self._spill_f = None
        self.replayed = 0
        if spill_path:
            self._replay_spill()
        self._stop = _threading.Event()
        self._thread = _threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        self.flushes = 0

    # ---------------- durability (spill journal) ----------------

    def _open_spill(self):
        if self._spill_f is None:
            self._spill_f = open(self.spill_path, "ab")

    def _journal_locked(self, rows, hists, exemplars) -> None:
        """One JSONL record per accepted batch, fsynced before the ack.
        Caller holds self._lock."""
        import json as _json
        import os as _os

        self._open_spill()
        rec = _json.dumps(
            {"rows": [list(r) for r in rows],
             "hists": [[h[0], h[1], list(h[2])] for h in hists],
             "exemplars": [list(e) for e in exemplars]},
            separators=(",", ":"),
        )
        self._spill_f.write(rec.encode() + b"\n")
        self._spill_f.flush()
        _os.fsync(self._spill_f.fileno())

    @staticmethod
    def _decode_spill_line(line: bytes):
        import json as _json

        rec = _json.loads(line)
        rows = [(r[0], int(r[1]), float(r[2])) for r in rec["rows"]]
        hists = [
            (
                h[0], int(h[1]),
                (
                    float(h[2][0]), float(h[2][1]), float(h[2][2]),
                    int(h[2][3]),
                    [(int(i), float(c)) for i, c in h[2][4]],
                    list(h[2][5]) if len(h[2]) > 5 and h[2][5] is not None
                    else None,
                ),
            )
            for h in rec["hists"]
        ]
        exemplars = [
            (e[0], int(e[1]), float(e[2]), e[3]) for e in rec["exemplars"]
        ]
        return rows, hists, exemplars

    def _replay_spill(self) -> None:
        """Recover 2xx-acked-but-uncommitted batches from a previous
        process: the live spill, any .flushing segment a crash left
        mid-flush, and any .recovered segment a crash left mid-REPLAY.
        Lines dedup by content hash (a re-queued batch is journaled
        twice; it must ingest once).

        Durability across a crash DURING recovery: the decoded lines
        are first rewritten to a fresh fsynced segment (atomic tmp +
        rename), and the original segments are removed only AFTER that
        segment is on disk — at every instant either the originals or
        the rebuilt segment (or both, deduped by content) exist, so an
        acked batch is never lost to a crash inside this method."""
        import hashlib as _hashlib
        import os as _os

        recovered_seg = f"{self.spill_path}.recovered"
        sources = [
            f"{self.spill_path}.flushing", self.spill_path, recovered_seg,
        ]
        seen: set[bytes] = set()
        recovered: list[bytes] = []
        for path in sources:
            if not _os.path.exists(path):
                continue
            with open(path, "rb") as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    digest = _hashlib.md5(line).digest()
                    if digest in seen:
                        continue
                    seen.add(digest)
                    recovered.append(line)
        decoded: list[tuple] = []
        good: list[bytes] = []
        for line in recovered:
            try:
                decoded.append(self._decode_spill_line(line))
            except (ValueError, KeyError, IndexError, TypeError):
                continue  # torn tail line from a crash mid-write
            good.append(line)
        if good:
            tmp = f"{recovered_seg}.tmp"
            with open(tmp, "wb") as nf:
                nf.write(b"\n".join(good) + b"\n")
                nf.flush()
                _os.fsync(nf.fileno())
            _os.replace(tmp, recovered_seg)
        for path in sources[:2]:
            if _os.path.exists(path):
                _os.remove(path)
        if good:
            # the rebuilt segment becomes the live spill; adds append
            # to it, so the recovered batches stay durable until their
            # own flush commits
            _os.replace(recovered_seg, self.spill_path)
        elif _os.path.exists(recovered_seg):
            _os.remove(recovered_seg)
        for rows, hists, exemplars in decoded:
            self._rows.extend(rows)
            self._hists.extend(hists)
            self._exemplars.extend(exemplars)
            self.replayed += len(rows) + len(hists) + len(exemplars)

    def add(self, rows=(), hists=(), exemplars=()) -> None:
        rows, hists, exemplars = list(rows), list(hists), list(exemplars)
        with self._lock:
            self._rows.extend(rows)
            self._hists.extend(hists)
            self._exemplars.extend(exemplars)
            if self.spill_path:
                self._journal_locked(rows, hists, exemplars)
            n = len(self._rows) + len(self._hists)
        if n >= self.max_rows:
            self.flush()

    def flush(self) -> int:
        """Commit everything queued as one append per table. On an
        append failure the unflushed remainder re-queues (prepended, so
        ordering holds) and the error propagates — a transient store
        failure costs a retry at the next window, never the batch.

        Flushes are serialized under _flush_lock: concurrent callers
        (timer thread vs a max_rows trigger in add) queue here rather
        than racing DB.append's unlocked next_ingest_seq bump."""
        from tsdb_spark.nativehist import HIST_TYPE

        with self._flush_lock:
            return self._flush_locked(HIST_TYPE)

    def _flush_locked(self, HIST_TYPE) -> int:
        import os as _os

        flushing_seg = None
        with self._lock:
            rows, self._rows = self._rows, []
            hists, self._hists = self._hists, []
            exemplars, self._exemplars = self._exemplars, []
            if self.spill_path and _os.path.exists(self.spill_path):
                # rotate the journal with the queue swap: the popped
                # batch's segment survives until its commit lands;
                # adds during the flush journal into a fresh spill
                if self._spill_f is not None:
                    self._spill_f.close()
                    self._spill_f = None
                flushing_seg = f"{self.spill_path}.flushing"
                _os.replace(self.spill_path, flushing_seg)
        n = len(rows) + len(hists)
        try:
            if rows:
                self.db.append(
                    self.db.spark.createDataFrame(
                        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
                    )
                )
                rows = []
            if hists:
                self.db.append_histograms(
                    self.db.spark.createDataFrame(
                        hists,
                        f"labels MAP<STRING,STRING>, t LONG, h {HIST_TYPE}",
                    )
                )
                hists = []
            if exemplars:
                self.db.append_exemplars(
                    self.db.spark.createDataFrame(
                        exemplars,
                        "labels MAP<STRING,STRING>, t LONG, v DOUBLE, "
                        "exemplar MAP<STRING,STRING>",
                    )
                )
                exemplars = []
        except Exception:
            with self._lock:
                self._rows = rows + self._rows
                self._hists = hists + self._hists
                self._exemplars = exemplars + self._exemplars
                if self.spill_path:
                    # the re-queued remainder goes back into the LIVE
                    # journal (its old segment is consumed below) —
                    # replay dedups by content if both survive a crash
                    self._journal_locked(rows, hists, exemplars)
                    if flushing_seg and _os.path.exists(flushing_seg):
                        _os.remove(flushing_seg)
            raise
        if flushing_seg and _os.path.exists(flushing_seg):
            _os.remove(flushing_seg)
        if n:
            self.flushes += 1
        return n

    def _loop(self) -> None:
        while not self._stop.wait(self.flush_ms / 1000.0):
            try:
                self.flush()
            except Exception:  # noqa: BLE001 — keep draining; next flush retries
                pass

    def close(self) -> None:
        """Stop the flusher and drain what's left (serve shutdown)."""
        self._stop.set()
        self._thread.join(timeout=5)
        self.flush()
        if self._spill_f is not None:
            self._spill_f.close()
            self._spill_f = None


def _enqueue_write_body(buf: WriteBuffer, tagged) -> dict:
    """WriteBuffer twin of _apply_write_body: decoded rows enqueue
    instead of committing inline."""
    version, decoded = tagged
    if version == "v2":
        from tsdb_spark.nativehist import HIST_TYPE  # noqa: F401 — schema parity

        rows = [
            (e["labels"], t, float(v))
            for e in decoded
            for t, v in e["samples"]
        ]
        hists = [
            (
                e["labels"],
                t,
                (
                    h["count"], h["sum"], h["zero_count"], h["schema"],
                    [(int(i), float(c)) for i, c in h["buckets"]],
                    h.get("custom_values"),
                ),
            )
            for e in decoded
            for t, h in e["histograms"]
        ]
        exemplars = [
            (e["labels"], t, float(v), ex_labels)
            for e in decoded
            for ex_labels, t, v in e["exemplars"]
        ]
        buf.add(rows, hists, exemplars)
        return {
            "version": "v2",
            "samples": len(rows),
            "histograms": len(hists),
            "exemplars": len(exemplars),
        }
    rows = [
        (e[0], t, float(v))
        for e in decoded
        for t, v in e[1]
    ]
    hists = [
        (
            e[0],
            t,
            (
                h["count"], h["sum"], h["zero_count"], h["schema"],
                [(int(i), float(c)) for i, c in h["buckets"]],
                h.get("custom_values"),
            ),
        )
        for e in decoded
        for t, h in (e[3] if len(e) > 3 else ())
    ]
    exemplars = [
        (e[0], t, float(v), ex_labels)
        for e in decoded
        for ex_labels, t, v in e[2]
    ]
    buf.add(rows, hists, exemplars)
    return {"version": "v1", "samples": len(rows), "histograms": len(hists),
            "exemplars": len(exemplars)}


def remote_write_apply(db, decoded) -> int:
    """The commit half of remote_write: append already-decoded series.
    Split out so the HTTP handler can distinguish malformed bodies
    (→ 400, sender must NOT retry per the remote-write spec) from
    internal append failures (→ 500, sender retries) — upstream
    write_handler.go draws exactly this line."""
    rows = [
        (e[0], t, float(v))
        for e in decoded
        for t, v in e[1]
    ]
    if rows:
        db.append(
            db.spark.createDataFrame(
                rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
            )
        )
    # native histograms on the v1 wire (prompb TimeSeries field 4,
    # carried by upstream senders since 2.40) — entries are 4-tuples
    # when the decoder ran with_histograms
    h_rows = [
        (
            e[0],
            t,
            (
                h["count"], h["sum"], h["zero_count"], h["schema"],
                [(int(i), float(c)) for i, c in h["buckets"]],
                h.get("custom_values"),
            ),
        )
        for e in decoded
        for t, h in (e[3] if len(e) > 3 else ())
    ]
    if h_rows:
        from tsdb_spark.nativehist import HIST_TYPE

        db.append_histograms(
            db.spark.createDataFrame(
                h_rows, f"labels MAP<STRING,STRING>, t LONG, h {HIST_TYPE}"
            )
        )
    ex_rows = [
        (e[0], t, float(v), ex_labels)
        for e in decoded
        for ex_labels, t, v in e[2]
    ]
    if ex_rows:
        db.append_exemplars(
            db.spark.createDataFrame(
                ex_rows,
                "labels MAP<STRING,STRING>, t LONG, v DOUBLE, "
                "exemplar MAP<STRING,STRING>",
            )
        )
    return len(rows) + len(h_rows)


def remote_write_apply_v2(db, decoded) -> int:
    """Commit a decoded Remote-Write 2.0 body (prometheus.io/docs/specs/
    remote_write_spec_2_0; io.prometheus.write.v2.Request). This is the
    route by which NATIVE HISTOGRAMS ride the wire into the store:
    float samples → DB.append, histogram samples → DB.append_histograms
    (already in the engine's nativehist shape after decode), exemplars →
    the exemplar side table. Returns samples + histogram samples
    appended (the spec's X-Prometheus-Remote-Write-*-Written counts)."""
    from tsdb_spark.nativehist import HIST_TYPE

    rows = [
        (e["labels"], t, float(v))
        for e in decoded
        for t, v in e["samples"]
    ]
    if rows:
        db.append(
            db.spark.createDataFrame(
                rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
            )
        )
    hrows = [
        (
            e["labels"],
            t,
            (
                h["count"],
                h["sum"],
                h["zero_count"],
                h["schema"],
                [(int(i), float(c)) for i, c in h["buckets"]],
                h.get("custom_values"),
            ),
        )
        for e in decoded
        for t, h in e["histograms"]
    ]
    if hrows:
        db.append_histograms(
            db.spark.createDataFrame(
                hrows, f"labels MAP<STRING,STRING>, t LONG, h {HIST_TYPE}"
            )
        )
    ex_rows = [
        (e["labels"], t, float(v), ex_labels)
        for e in decoded
        for ex_labels, t, v in e["exemplars"]
    ]
    if ex_rows:
        db.append_exemplars(
            db.spark.createDataFrame(
                ex_rows,
                "labels MAP<STRING,STRING>, t LONG, v DOUBLE, "
                "exemplar MAP<STRING,STRING>",
            )
        )
    return len(rows) + len(hrows)


def remote_write_v2(db, raw: bytes, content_type: str = "") -> int:
    """POST /api/v1/write with a Remote-Write 2.0 body: decode +
    commit in one call (the library-surface twin of remote_write)."""
    tagged = _decode_write_body(
        raw, content_type or "application/x-protobuf;"
        "proto=io.prometheus.write.v2.Request"
    )
    written = _apply_write_body(db, tagged)
    return written["samples"] + written["histograms"]


def _read_query_results(db, queries: list[dict], with_hists: bool = False):
    """Shared SELECT stage of both remote-read responders: each
    ReadRequest query through the pruned matcher select, collected as
    per-query [(labels, time-sorted samples)] lists. The collect sits
    in the serving layer like every HTTP route; a remote-read window is
    client-bounded the same way /api/v1/query_range is."""
    from tsdb_spark import labels as L

    ctor = {"=": L.eq, "!=": L.neq, "=~": L.re_match, "!~": L.re_not_match}
    results = []
    for q in queries:
        ms = [ctor[op](name, value) for op, name, value in q["matchers"]]
        rows = (
            db.querier(q["start"], q["end"])
            .select(ms)
            .select("labels", "t", "v")
            .collect()
        )
        by: dict[tuple, list] = {}
        for r in rows:
            lab = dict(r["labels"])
            key = tuple(sorted(lab.items()))
            by.setdefault(key, [lab, [], []])[1].append((r["t"], r["v"]))
        if with_hists:
            # native histograms ride the SAMPLED response as prompb
            # TimeSeries field 4 (codec.go ToQueryResult does the same);
            # the streamed XOR variant stays float-only — its chunk
            # format IS the float codec
            for r in db.hist_frame(q["start"], q["end"], ms).collect():
                lab = dict(r["labels"])
                h = r["h"]
                key = tuple(sorted(lab.items()))
                by.setdefault(key, [lab, [], []])[2].append(
                    (
                        r["t"],
                        {
                            "count": h["count"], "sum": h["sum"],
                            "zero_count": h["zero_count"],
                            "schema": h["schema"],
                            "buckets": [
                                (b["idx"], b["c"]) for b in h["buckets"]
                            ],
                            "custom_values": (
                                list(h["custom_values"])
                                if h["custom_values"] is not None else None
                            ),
                        },
                    )
                )
        results.append(
            [
                (
                    (e[0], sorted(e[1]), sorted(e[2], key=lambda x: x[0]))
                    if with_hists
                    else (e[0], sorted(e[1]))
                )
                for e in (by[k] for k in sorted(by))
            ]
        )
    return results


def otlp_write(db, raw: bytes, gzipped: bool = False,
               histograms_as_nhcb: bool = False) -> int:
    """POST /api/v1/otlp/v1/metrics (prometheus 3.x OTLP ingest,
    storage/remote/otlptranslator): decode + translate the
    ExportMetricsServiceRequest and append — gauges/sums/classic
    histograms/summaries as float series, exponential histograms as
    NATIVE histograms through DB.append_histograms, remaining resource
    attributes as target_info (which promql info() joins back).
    Returns points appended; delta-temporality points are dropped like
    upstream rejects them."""
    from tsdb_spark.sources.otlp import decode_otlp_metrics, translate_otlp

    exemplars: list = []
    floats, hists, _ = translate_otlp(
        decode_otlp_metrics(raw, gzipped),
        histograms_as_nhcb=histograms_as_nhcb,
        exemplars_out=exemplars,
    )
    return _otlp_apply(db, (floats, hists), exemplars)


def _otlp_apply(db, decoded, exemplars=()) -> int:
    """Commit half of otlp_write (the HTTP route's 400/500 split).
    OTLP exemplars (trace_id/span_id + filtered attributes) land in
    the exemplars side table like remote-write v1 exemplars do."""
    from tsdb_spark.nativehist import HIST_TYPE

    floats, hists = decoded
    if floats:
        db.append(
            db.spark.createDataFrame(
                floats, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
            )
        )
    if hists:
        hrows = [
            (
                lab,
                t,
                (
                    h["count"],
                    h["sum"],
                    h["zero_count"],
                    h["schema"],
                    [(int(i), float(c)) for i, c in h["buckets"]],
                    h.get("custom_values"),
                ),
            )
            for lab, t, h in hists
        ]
        db.append_histograms(
            db.spark.createDataFrame(
                hrows, f"labels MAP<STRING,STRING>, t LONG, h {HIST_TYPE}"
            )
        )
    if exemplars:
        db.append_exemplars(
            db.spark.createDataFrame(
                list(exemplars),
                "labels MAP<STRING,STRING>, t LONG, v DOUBLE, "
                "exemplar MAP<STRING,STRING>",
            )
        )
    return len(floats) + len(hists)


def remote_read(db, raw: bytes) -> bytes:
    """POST /api/v1/read (storage/remote/read_handler.go, SAMPLED
    response type): time-sorted TimeSeries in a snappy-compressed
    ReadResponse — the protocol default every client accepts. Clients
    asking for STREAMED_XOR_CHUNKS negotiate via remote_read_negotiated
    (the serve route does)."""
    from tsdb_spark.sources.remotewrite import (
        decode_read_request,
        encode_read_response,
    )

    return encode_read_response(
        _read_query_results(db, decode_read_request(raw), with_hists=True)
    )


def remote_read_streamed(db, raw: bytes) -> bytes:
    """POST /api/v1/read, STREAMED_XOR_CHUNKS response type
    (storage/remote/codec.go StreamChunkedReadResponses): each series
    as Gorilla-XOR chunk payloads in CRC32C-framed ChunkedReadResponse
    messages (sources/xorchunks.py — the codec SURVEY §2.8 maps to
    Parquet at rest, implemented for the wire where the format IS the
    protocol)."""
    from tsdb_spark.sources.remotewrite import decode_read_request
    from tsdb_spark.sources.xorchunks import encode_chunked_read_response

    return encode_chunked_read_response(
        _read_query_results(db, decode_read_request(raw))
    )


def remote_read_negotiated(db, raw: bytes) -> tuple[bytes, str, str]:
    """Dispatch on the request's accepted_response_types (read_handler.go
    NegotiateResponseType: the FIRST listed type the server SUPPORTS
    wins — a client sending [future_type, STREAMED_XOR_CHUNKS] gets the
    streamed body it listed, not a SAMPLES fallback it never asked for;
    an empty list means SAMPLES; an all-unsupported list is an error,
    not a silent SAMPLES downgrade). Returns (body, content_type,
    content_encoding) for the HTTP route; raises ValueError for the
    route to map to HTTP 400."""
    from tsdb_spark.sources.remotewrite import decode_read_request_full
    from tsdb_spark.sources.xorchunks import CONTENT_TYPE_STREAMED

    queries, accepted = decode_read_request_full(raw)
    chosen = 0
    if accepted:
        supported = [t for t in accepted if t in (0, 1)]
        if not supported:
            raise ValueError(
                f"server does not support any of the requested response "
                f"types {accepted}"
            )
        chosen = supported[0]
    if chosen == 1:  # STREAMED_XOR_CHUNKS
        from tsdb_spark.sources.xorchunks import encode_chunked_read_response

        body = encode_chunked_read_response(_read_query_results(db, queries))
        return body, CONTENT_TYPE_STREAMED, ""
    from tsdb_spark.sources.remotewrite import encode_read_response

    body = encode_read_response(
        _read_query_results(db, queries, with_hists=True)
    )
    return body, "application/x-protobuf", "snappy"


def admin_delete_series(db, selectors: list[str], mint: int, maxt: int) -> int:
    """POST /api/v1/admin/tsdb/delete_series (api.go deleteSeries):
    record delete intervals for every match[] selector over [start, end].
    Tombstone-based like upstream — data disappears from reads now and
    from disk at the next clean_tombstones/compaction. Returns the number
    of series tombstoned (upstream replies 204 with no body)."""
    from tsdb_spark.labels import parse_selector

    total = 0
    for sel in selectors:
        total += db.delete(mint, maxt, parse_selector(sel))
    return total


def admin_snapshot(db) -> dict:
    """POST /api/v1/admin/tsdb/snapshot (api.go snapshot): hardlink the
    store into <data-dir>/snapshots/<name> and return the name, upstream's
    `{"name": "20240101T000000Z-<hex>"}` wire shape. skip_head has no
    analog here — every append is already durably on disk (S8/S9 map to
    the job-commit protocol), so a snapshot is always 'with head'."""
    import os
    import time
    import uuid

    name = time.strftime("%Y%m%dT%H%M%SZ", time.gmtime()) + "-" + uuid.uuid4().hex[:9]
    dest = os.path.join(db.path, "snapshots", name)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    db.snapshot(dest)
    return {"status": "success", "data": {"name": name}}


def targets_payload(targets: list, status: dict | None = None) -> dict:
    """GET /api/v1/targets (api.go targets → TargetDiscovery): the
    scrape targets this process owns, with per-target health from the
    scrape loop's status dict (scrape.scrape_pass `status=`). A serve
    process without a scrape loop reports an empty active set like a
    Prometheus with no scrape configs."""
    status = status or {}
    active = []
    for t in targets or []:
        st = status.get(t.url, {})
        active.append(
            {
                "discoveredLabels": {"__address__": t.url, "job": t.job},
                "labels": t.target_labels(),
                "scrapePool": t.job,
                "scrapeUrl": t.url,
                "health": st.get("health", "unknown"),
                "lastScrape": (
                    st["lastScrapeMs"] / 1000.0 if "lastScrapeMs" in st else None
                ),
                "lastError": st.get("lastError", ""),
            }
        )
    # targets known only to the scrape loop's status (file-SD /
    # config-driven jobs resolve dynamically, so there is no static
    # Target list to walk): synthesize their entries from the status
    # record — this is how a target added by a file edit shows up here
    # on the next pass, and a removed one disappears (status pruning)
    seen = {t.url for t in targets or []}
    # snapshot: the scrape scheduler thread adds/prunes entries in the
    # same dict concurrently (scrape_config_pass uses the same pattern)
    for url, st in list(status.items()):
        if url in seen:
            continue
        active.append(
            {
                "discoveredLabels": {
                    "__address__": url, "job": st.get("job", ""),
                },
                "labels": dict(st.get("labels", {})),
                "scrapePool": st.get("job", ""),
                "scrapeUrl": url,
                "health": st.get("health", "unknown"),
                "lastScrape": (
                    st["lastScrapeMs"] / 1000.0 if "lastScrapeMs" in st else None
                ),
                "lastError": st.get("lastError", ""),
            }
        )
    active.sort(key=lambda a: a["scrapeUrl"])
    return {
        "status": "success",
        "data": {"activeTargets": active, "droppedTargets": []},
    }


def make_handler(db, rule_groups: list[dict] | None = None, enable_admin: bool = False,
                 scrape_targets: list | None = None, scrape_status: dict | None = None,
                 scrape_metadata: dict | None = None,
                 write_buffer: "WriteBuffer | None" = None,
                 external_labels: dict | None = None,
                 config_state: dict | None = None,
                 otlp_nhcb: bool = False):
    """BaseHTTPRequestHandler subclass bound to one DB — the web/api/v1
    router (api.go Register): query, query_range, labels,
    label/<name>/values, series, rules, alerts, federate. The handler is
    a thin driver-side front; every query underneath is the distributed
    evaluator. Endpoints accept GET query strings and POST form bodies
    (upstream registers both: api.go r.Post/r.Get pairs).

    `enable_admin` unlocks the destructive /api/v1/admin/tsdb/* routes
    (delete_series / clean_tombstones / snapshot), off by default exactly
    like upstream's --web.enable-admin-api flag; when off they answer
    503 'admin APIs disabled' (api.go adminDisabled, errorUnavailable)."""
    import json
    from http.server import BaseHTTPRequestHandler
    from urllib.parse import parse_qs, urlparse

    groups = rule_groups or []

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

        def _reply_empty(self, code: int) -> None:
            self.send_response(code)
            self.send_header("Content-Length", "0")
            self.end_headers()

        def do_GET(self):  # noqa: N802 (http.server contract)
            u = urlparse(self.path)
            self._dispatch(u, parse_qs(u.query), "GET")

        def do_POST(self):  # noqa: N802
            # application/x-www-form-urlencoded bodies carry the same
            # parameters as the query string; values from both are
            # merged, query string first (upstream Request.ParseForm)
            u = urlparse(self.path)
            n = int(self.headers.get("Content-Length") or 0)
            if u.path == "/api/v1/write":
                # binary body (snappy + protobuf), never form-decoded
                raw = self.rfile.read(n) if n else b""
                # The spec forbids senders from retrying 4xx, so only
                # DECODE failures may return 400; an internal append
                # failure (executor OOM, store lock, disk) must be 5xx
                # so a conforming sender retries — write_handler.go
                # makes the same 400/500 split.
                ctype = self.headers.get("Content-Type") or ""
                try:
                    decoded = _decode_write_body(raw, ctype)
                except UnsupportedMediaType as e:
                    return self._reply_text(
                        415, f"unsupported content type: {e}\n"
                    )
                except Exception as e:  # noqa: BLE001 — wire errors → 400
                    return self._reply_text(400, f"decode error: {e}\n")
                if decoded[0] == "v2" and scrape_metadata is not None:
                    # rw2 TimeSeries carry metadata (type/help/unit);
                    # the spec says receivers SHOULD use it — it feeds
                    # /api/v1/metadata exactly like scraped HELP/TYPE
                    for e in decoded[1]:
                        name = e["labels"].get("__name__")
                        md = {
                            k: v
                            for k, v in (e.get("metadata") or {}).items()
                            if v and v != "unknown"
                        }
                        if name and md:
                            scrape_metadata.setdefault(name, {}).update(md)
                try:
                    if write_buffer is not None:
                        written = _enqueue_write_body(write_buffer, decoded)
                    else:
                        written = _apply_write_body(db, decoded)
                except Exception as e:  # noqa: BLE001 — commit → 500
                    return self._reply_text(500, f"internal error: {e}\n")
                # success: 204 No Content (write_handler.go replies with
                # an empty 2xx; the spec requires any 2xx). rw2 responses
                # MUST carry the written-counts headers (spec § Required
                # written response headers)
                self.send_response(204)
                if written["version"] == "v2":
                    for k in ("Samples", "Histograms", "Exemplars"):
                        self.send_header(
                            f"X-Prometheus-Remote-Write-{k}-Written",
                            str(written[k.lower()]),
                        )
                self.send_header("Content-Length", "0")
                self.end_headers()
                return None
            if u.path == "/api/v1/otlp/v1/metrics":
                raw = self.rfile.read(n) if n else b""
                gz = "gzip" in (self.headers.get("Content-Encoding") or "")
                # same 400/500 split as remote-write: decode errors are
                # the client's, append failures are ours (retryable)
                try:
                    from tsdb_spark.sources.otlp import (
                        decode_otlp_metrics,
                        translate_otlp,
                    )

                    otlp_exemplars: list = []
                    # read through config_state so a /-/reload flipping
                    # otlp.convert_histograms_to_nhcb takes effect
                    # without a restart (the constructor arg is only
                    # the pre-reload default)
                    floats, hists, _ = translate_otlp(
                        decode_otlp_metrics(raw, gz),
                        histograms_as_nhcb=(config_state or {}).get(
                            "otlp_nhcb", otlp_nhcb
                        ),
                        exemplars_out=otlp_exemplars,
                    )
                except Exception as e:  # noqa: BLE001 — wire errors → 400
                    return self._reply_text(400, f"decode error: {e}\n")
                try:
                    if write_buffer is not None:
                        write_buffer.add(
                            floats,
                            [
                                (
                                    lab, t,
                                    (h["count"], h["sum"], h["zero_count"],
                                     h["schema"],
                                     [(int(i), float(c)) for i, c in h["buckets"]],
                                     h.get("custom_values")),
                                )
                                for lab, t, h in hists
                            ],
                            exemplars=otlp_exemplars,
                        )
                    else:
                        _otlp_apply(db, (floats, hists), otlp_exemplars)
                except Exception as e:  # noqa: BLE001 — commit → 500
                    return self._reply_text(500, f"internal error: {e}\n")
                # empty ExportMetricsServiceResponse (success, 200)
                self.send_response(200)
                self.send_header("Content-Type", "application/x-protobuf")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return None
            if u.path == "/-/reload":
                # web.go reload handler: 403 unless the lifecycle API
                # is wired (a serve without --config has nothing to
                # reload); 200 on success, 500 with the error otherwise
                reload_fn = (config_state or {}).get("reload")
                if reload_fn is None:
                    return self._reply_text(
                        403, "Lifecycle API is not enabled.\n"
                    )
                try:
                    reload_fn()
                except Exception as e:  # noqa: BLE001 — config error → 500
                    return self._reply_text(
                        500, f"failed to reload config: {e}\n"
                    )
                return self._reply_text(200, "")
            if u.path == "/api/v1/read":
                raw = self.rfile.read(n) if n else b""
                try:
                    out, ctype, cenc = remote_read_negotiated(db, raw)
                except Exception as e:  # noqa: BLE001 — wire errors → 400
                    return self._reply_text(400, f"decode error: {e}\n")
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                if cenc:
                    self.send_header("Content-Encoding", cenc)
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)
                return None
            body = self.rfile.read(n).decode() if n else ""
            merged = parse_qs(u.query)
            for k, vals in parse_qs(body).items():
                merged.setdefault(k, []).extend(vals)
            self._dispatch(u, merged, "POST")

        do_PUT = do_POST  # upstream registers PUT alongside POST (api.go)

        def _dispatch(self, u, multi, method="GET"):
            q = {k: v[0] for k, v in multi.items()}
            # upstream's liveness/readiness probes (web.go): plain-text
            # 200s, no store touch — safe for load-balancer health checks
            if u.path == "/-/healthy":
                return self._reply_text(200, "Healthy.\n")
            if u.path == "/-/ready":
                return self._reply_text(200, "Ready.\n")
            try:
                if u.path.startswith("/api/v1/admin/tsdb/"):
                    return self._admin(u, multi, q, method)
                limit = int(q.get("limit", "0") or 0)
                if u.path == "/api/v1/query":
                    # absent `time` defaults to the server's current
                    # time (api.go parseTimeParam(..., api.now()))
                    t = (
                        _parse_time(q["time"]) if "time" in q
                        else int(_time.time() * 1000)
                    )
                    return self._reply(
                        200, _limit_query(query(db, q["query"], t), limit)
                    )
                if u.path == "/api/v1/query_range":
                    return self._reply(
                        200,
                        _limit_query(
                            query_range(
                                db,
                                q["query"],
                                _parse_time(q["start"]),
                                _parse_time(q["end"]),
                                _parse_step(q["step"]),
                            ),
                            limit,
                        ),
                    )
                if u.path == "/api/v1/labels":
                    return self._reply(
                        200, labels(db, multi.get("match[]"), limit)
                    )
                if u.path == "/api/v1/status/tsdb":
                    return self._reply(200, status_tsdb(db))
                if u.path == "/api/v1/query_histogram":
                    t = (
                        _parse_time(q["time"]) if "time" in q
                        else int(_time.time() * 1000)
                    )
                    sel = multi.get("match[]", [q.get("query")])[0]
                    if sel is None:
                        raise ValueError("missing `match[]`/`query` selector")
                    return self._reply(200, query_histogram(db, sel, t))
                if u.path == "/api/v1/query_exemplars":
                    sel = multi.get("query", [None])[0]
                    if sel is None:
                        raise ValueError("missing `query` parameter")
                    return self._reply(
                        200,
                        query_exemplars(
                            db,
                            sel,
                            _parse_time(q.get("start", "-9e9")),
                            _parse_time(q.get("end", "9e9")),
                        ),
                    )
                if u.path == "/api/v1/parse_query":
                    return self._reply(200, parse_query(q["query"]))
                if u.path == "/api/v1/format_query":
                    return self._reply(200, format_query(q["query"]))
                if u.path == "/api/v1/metadata":
                    return self._reply(200, metadata(db, scrape_metadata))
                if u.path == "/api/v1/status/config":
                    # api.go serveConfig: the loaded file, verbatim
                    return self._reply(200, {
                        "status": "success",
                        "data": {
                            "yaml": (config_state or {}).get("yaml", "")
                        },
                    })
                if u.path == "/api/v1/status/buildinfo":
                    return self._reply(200, buildinfo())
                if u.path == "/api/v1/targets":
                    return self._reply(
                        200, targets_payload(scrape_targets, scrape_status)
                    )
                if u.path == "/api/v1/status/runtimeinfo":
                    return self._reply(200, runtimeinfo(db))
                if u.path == "/api/v1/status/flags":
                    return self._reply(200, flags())
                if u.path == "/api/v1/status/config":
                    return self._reply(200, config())
                if u.path == "/api/v1/rules":
                    return self._reply(200, rules_payload(groups))
                if u.path == "/api/v1/alerts":
                    if "time" not in q:
                        raise ValueError("missing `time` parameter")
                    return self._reply(
                        200, alerts_payload(db, groups, _parse_time(q["time"]))
                    )
                if u.path == "/federate":
                    sels = multi.get("match[]", [])
                    if not sels:
                        raise ValueError("missing `match[]` parameter")
                    # upstream /federate has no time param at all — it
                    # always exports "now"; an explicit time remains
                    # accepted for reproducible scrapes/tests
                    t = (
                        _parse_time(q["time"]) if "time" in q
                        else int(_time.time() * 1000)
                    )
                    return self._reply_text(
                        200,
                        federate(db, sels, t, external_labels=external_labels),
                    )
                if u.path.startswith("/api/v1/label/") and u.path.endswith(
                    "/values"
                ):
                    name = u.path[len("/api/v1/label/"):-len("/values")]
                    return self._reply(
                        200, label_values(db, name, multi.get("match[]"), limit)
                    )
                if u.path == "/api/v1/series":
                    sels = multi.get("match[]", [])
                    if not sels:
                        raise ValueError("missing `match[]` parameter")
                    mint = _parse_time(q.get("start", "-9e9"))
                    maxt = _parse_time(q.get("end", "9e9"))
                    return self._reply(200, series(db, sels, mint, maxt, limit))
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
            except PermissionError as e:
                # read-only store handle (DBReadOnly, db.go:265-429)
                return self._reply(
                    403,
                    {"status": "error", "errorType": "forbidden",
                     "error": str(e)},
                )

        def _admin(self, u, multi, q, method):
            """/api/v1/admin/tsdb/* (api.go deleteSeries /
            cleanTombstones / snapshot): destructive store maintenance,
            POST/PUT only, gated like --web.enable-admin-api."""
            if not enable_admin:
                return self._reply(
                    503,
                    {"status": "error", "errorType": "unavailable",
                     "error": "admin APIs disabled"},
                )
            if method not in ("POST", "PUT"):
                return self._reply(
                    405,
                    {"status": "error", "errorType": "method_not_allowed",
                     "error": "only POST/PUT allowed"},
                )
            if u.path == "/api/v1/admin/tsdb/delete_series":
                sels = multi.get("match[]", [])
                if not sels:
                    raise ValueError("no match[] parameter provided")
                mint = _parse_time(q.get("start", "-9e9"))
                maxt = _parse_time(q.get("end", "9e9"))
                admin_delete_series(db, sels, mint, maxt)
                return self._reply_empty(204)
            if u.path == "/api/v1/admin/tsdb/clean_tombstones":
                db.clean_tombstones()
                return self._reply_empty(204)
            if u.path == "/api/v1/admin/tsdb/snapshot":
                return self._reply(200, admin_snapshot(db))
            return self._reply(
                404,
                {"status": "error", "errorType": "not_found",
                 "error": f"unknown path {u.path}"},
            )

    return Handler


def serve(db, host: str = "127.0.0.1", port: int = 9090, rule_groups=None,
          enable_admin: bool = False, scrape_targets=None, scrape_status=None,
          scrape_metadata=None, write_buffer=None, external_labels=None,
          config_state=None, otlp_nhcb=False):
    """Run the HTTP API (blocking). Returns the server object if you
    want to drive it yourself (tests use server.serve_forever in a
    thread)."""
    from http.server import ThreadingHTTPServer

    srv = ThreadingHTTPServer(
        (host, port),
        make_handler(
            db, rule_groups, enable_admin=enable_admin,
            scrape_targets=scrape_targets, scrape_status=scrape_status,
            scrape_metadata=scrape_metadata, write_buffer=write_buffer,
            external_labels=external_labels, config_state=config_state,
            otlp_nhcb=otlp_nhcb,
        ),
    )
    return srv


def federate_frame(
    db, selectors: list[str], time_ms: int, lookback_ms: int = DEFAULT_LOOKBACK_MS
):
    """The /federate instant vector as ONE distributed plan
    (web/federate.go): for every match[] selector, the latest sample per
    series within the lookback window ending at `time_ms`; when
    selectors overlap, the later selector wins per series (upstream's
    `vec` map keyed by series labels is overwritten in selector order).

    Each selector rides the pruned querier path (partition pruning +
    matcher pushdown); the union is deduped by ONE combinable
    max_by((selector_rank, t)) groupBy — never a per-selector collect."""
    from functools import reduce

    from pyspark.sql import DataFrame as _DF
    from pyspark.sql import functions as F

    from tsdb_spark.labels import parse_selector

    frames = []
    for i, sel in enumerate(selectors):
        q = db.querier(time_ms - lookback_ms + 1, time_ms).select(
            parse_selector(sel), with_labels=True
        )
        frames.append(
            q.select("labels_str", "labels", "t", "v").withColumn(
                "_sel", F.lit(i)
            )
        )
    u = reduce(_DF.unionByName, frames)
    picked = u.groupBy("labels_str").agg(
        F.max_by(
            F.struct("labels", "t", "v"), F.struct(F.col("_sel"), F.col("t"))
        ).alias("_s")
    )
    return picked.select(
        "labels_str",
        F.col("_s.labels").alias("labels"),
        F.col("_s.t").alias("t"),
        F.col("_s.v").alias("v"),
    )


def _escape_label_value(v: str) -> str:
    """Exposition-format escaping for label values (backslash, quote,
    newline — web/federate.go via labels rendering)."""
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


_LEGACY_NAME_RE = re.compile(r"[a-zA-Z_:][a-zA-Z0-9_:]*")


def _render_label_name(k: str) -> str:
    """Prometheus 3.x UTF-8 exposition: a label name outside the legacy
    charset renders quoted+escaped ("my.label"="v"), legacy names bare
    (model/labels 3.x quoted-name rendering)."""
    if _LEGACY_NAME_RE.fullmatch(k):
        return k
    return f'"{_escape_label_value(k)}"'


def federate(db, selectors: list[str], time_ms: int,
             lookback_ms: int = DEFAULT_LOOKBACK_MS,
             external_labels: dict | None = None) -> str:
    """GET /federate — the instant vector for each match[] selector in
    the Prometheus exposition text format (web/federate.go):

        metric_name{label="v",...} value timestamp_ms

    so another Prometheus (or this engine) can scrape this store. The
    timestamp is the selected SAMPLE's own timestamp (upstream federation
    re-exposes the stored sample, not the evaluation instant).
    `external_labels` (the global: block) attach to every exported
    series where the series doesn't already carry the name — federate.go
    adds them the same way, so downstream scrapes see which instance the
    data came from. Applied at render: the distributed plan
    (federate_frame) stays label-pure."""
    ext = dict(external_labels or {})
    lines: list[str] = []
    for row in federate_frame(db, selectors, time_ms, lookback_ms).collect():
        labels = {**ext, **dict(row["labels"])}
        name = labels.pop("__name__", "")
        pair_list = [
            f'{_render_label_name(k)}="{_escape_label_value(v)}"'
            for k, v in sorted(labels.items())
            if v
        ]
        # UTF-8 metric names move inside the braces, quoted, as the
        # first term ({"my.metric", ...} — 3.x exposition syntax)
        if name and not _LEGACY_NAME_RE.fullmatch(name):
            pair_list.insert(0, f'"{_escape_label_value(name)}"')
            name = ""
        pairs = ",".join(pair_list)
        lines.append(
            f"{name}{{{pairs}}} {format_value(row['v'])} {row['t']}"
        )
    return "\n".join(sorted(lines)) + ("\n" if lines else "")
