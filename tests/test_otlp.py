"""OTLP metrics ingestion (opentelemetry-proto metrics.proto +
prometheus's otlptranslator conventions — all public)."""

import struct
import threading
import urllib.request

import pytest

from tsdb_spark import DB
from tsdb_spark.sources.otlp import (
    backfill_otlp,
    decode_otlp_metrics,
    encode_otlp_metrics,
    translate_otlp,
)

WIDTH = 3_600_000

RES = {"service_name": "checkout", "service_namespace": "shop",
       "service_instance_id": "pod-7", "k8s_cluster": "east"}


def _req(metrics):
    return [{"resource": dict(RES), "metrics": metrics}]


def test_gauge_and_counter_translation():
    metrics = [
        {"name": "queue.depth", "unit": "", "kind": "gauge",
         "points": [({"shard": "a"}, 1_000, 7.5)]},
        {"name": "requests", "unit": "", "kind": "sum", "monotonic": True,
         "temporality": 2, "points": [({"code": "200"}, 2_000, 42.0)]},
    ]
    floats, hists, dropped = translate_otlp(
        decode_otlp_metrics(encode_otlp_metrics(_req(metrics)))
    )
    assert dropped == 0 and hists == []
    by = {r[0]["__name__"]: r for r in floats}
    # dots sanitize, counters get _total, job/instance from service.*
    g = by["queue_depth"]
    assert g[0] == {"__name__": "queue_depth", "shard": "a",
                    "job": "shop/checkout", "instance": "pod-7"}
    assert (g[1], g[2]) == (1_000, 7.5)
    c = by["requests_total"]
    assert c[0]["code"] == "200" and c[2] == 42.0
    # leftover resource attrs ride ONE target_info series
    ti = by["target_info"]
    assert ti[0] == {"__name__": "target_info", "k8s_cluster": "east",
                     "job": "shop/checkout", "instance": "pod-7"}
    assert ti[2] == 1.0


def test_unit_suffix_and_delta_drop():
    metrics = [
        {"name": "latency", "unit": "s", "kind": "gauge",
         "points": [({}, 1_000, 0.25)]},
        {"name": "deltas", "unit": "", "kind": "sum", "monotonic": True,
         "temporality": 1,  # DELTA → dropped like upstream rejects it
         "points": [({}, 1_000, 1.0), ({}, 2_000, 2.0)]},
    ]
    floats, _, dropped = translate_otlp(
        decode_otlp_metrics(encode_otlp_metrics(_req(metrics)))
    )
    names = {r[0]["__name__"] for r in floats}
    assert "latency_seconds" in names
    assert not any(n.startswith("deltas") for n in names)
    assert dropped == 2


def test_explicit_histogram_to_classic_buckets():
    metrics = [
        {"name": "rt", "unit": "", "kind": "histogram", "temporality": 2,
         "points": [({}, 5_000, 10, 12.5, [4, 3, 2, 1], [0.1, 0.5, 1.0])]},
    ]
    floats, hists, _ = translate_otlp(
        decode_otlp_metrics(encode_otlp_metrics(_req(metrics)))
    )
    assert hists == []
    rows = {(r[0]["__name__"], r[0].get("le")): r[2] for r in floats
            if r[0]["__name__"] != "target_info"}
    # cumulative le counts: 4, 4+3, 4+3+2, +Inf = total count;
    # integral bounds render Go-style ('1', not '1.0') so series
    # identity matches Prometheus-scraped equivalents
    assert rows[("rt_bucket", "0.1")] == 4.0
    assert rows[("rt_bucket", "0.5")] == 7.0
    assert rows[("rt_bucket", "1")] == 9.0
    assert rows[("rt_bucket", "+Inf")] == 10.0
    assert rows[("rt_sum", None)] == 12.5
    assert rows[("rt_count", None)] == 10.0


def test_exponential_histogram_to_native():
    # scale 0, positive offset 1 counts [2, 0, 3] → otlp indexes 1..3
    # → prometheus idx = otlp index + 1 → (2, 2.0), (4, 3.0)
    metrics = [
        {"name": "eh", "unit": "", "kind": "exponential_histogram",
         "temporality": 2,
         "points": [({}, 9_000, 9, 31.0, 0, 1, (1, [2, 0, 3]), (0, [3]))]},
    ]
    floats, hists, _ = translate_otlp(
        decode_otlp_metrics(encode_otlp_metrics(_req(metrics)))
    )
    [(lab, t, h)] = hists
    assert lab["__name__"] == "eh" and t == 9_000
    assert h["count"] == 9.0 and h["sum"] == 31.0 and h["schema"] == 0
    # negative-side count folds into zero_count (engine subset)
    assert h["zero_count"] == 1.0 + 3.0
    assert h["buckets"] == [(2, 2.0), (4, 3.0)]


def test_exponential_histogram_downscale():
    # scale -6 is below prometheus's -4 floor: adjacent bucket pairs
    # merge (idx i@s → ceil(i/2)@s-1), twice
    metrics = [
        {"name": "wide", "unit": "", "kind": "exponential_histogram",
         "temporality": 2,
         "points": [({}, 1_000, 6, 10.0, -6, 0, (0, [1, 2, 3]), (0, []))]},
    ]
    _, hists, _ = translate_otlp(
        decode_otlp_metrics(encode_otlp_metrics(_req(metrics)))
    )
    [(_, _, h)] = hists
    assert h["schema"] == -4
    # otlp idxs 0,1,2 → prom idxs 1,2,3 @ -6 → 1,1,2 @ -5 → 1,1,1 @ -4
    assert h["buckets"] == [(1, 6.0)]


def test_summary_translation():
    metrics = [
        {"name": "gc", "unit": "", "kind": "summary",
         "points": [({}, 3_000, 100, 12.0, [(0.5, 0.01), (0.99, 0.1)])]},
    ]
    floats, _, _ = translate_otlp(
        decode_otlp_metrics(encode_otlp_metrics(_req(metrics)))
    )
    rows = {(r[0]["__name__"], r[0].get("quantile")): r[2] for r in floats
            if r[0]["__name__"] != "target_info"}
    assert rows[("gc", "0.5")] == 0.01
    assert rows[("gc", "0.99")] == 0.1
    assert rows[("gc_sum", None)] == 12.0
    assert rows[("gc_count", None)] == 100.0


def test_integral_le_and_quantile_render_go_style():
    """OTLP-translated le/quantile labels match Go's FormatFloat(-1):
    '10'/'1', never '10.0'/'1.0' — otherwise OTLP-ingested series get
    different label values than Prometheus-ingested equivalents,
    breaking cross-system series identity and federation joins
    (otlptranslator helpers.go; api.format_value is the engine's own
    rendering)."""
    metrics = [
        {"name": "szb", "unit": "", "kind": "histogram", "temporality": 2,
         "points": [({}, 5_000, 6, 9.0, [3, 2, 1], [1.0, 10.0])]},
        {"name": "q", "unit": "", "kind": "summary",
         "points": [({}, 3_000, 10, 5.0, [(1.0, 0.2)])]},
    ]
    floats, _, _ = translate_otlp(
        decode_otlp_metrics(encode_otlp_metrics(_req(metrics)))
    )
    les = {r[0]["le"] for r in floats if "le" in r[0]}
    assert les == {"1", "10", "+Inf"}
    quants = {r[0]["quantile"] for r in floats if "quantile" in r[0]}
    assert quants == {"1"}


def test_no_recorded_value_points_dropped():
    """DataPointFlags FLAG_NO_RECORDED_VALUE (bit 0) marks a gap, not a
    value: the point must NOT ingest as a fabricated 0.0 sample (the
    upstream translator emits a staleness NaN; this engine treats
    staleness as a gap) and counts into the dropped tally."""
    from tsdb_spark.sources.remotewrite import _put_field

    def num_point(t_ms, v, flags=0):
        pt = bytearray()
        _put_field(pt, 3, 1, struct.pack("<Q", t_ms * 1_000_000))
        _put_field(pt, 4, 1, struct.pack("<d", v))
        if flags:
            _put_field(pt, 8, 0, flags)
        return bytes(pt)

    gauge = bytearray()
    _put_field(gauge, 1, 2, num_point(1_000, 5.0))
    _put_field(gauge, 1, 2, num_point(2_000, 0.0, flags=1))
    metric = bytearray()
    _put_field(metric, 1, 2, b"g")
    _put_field(metric, 5, 2, bytes(gauge))
    sm = bytearray()
    _put_field(sm, 2, 2, bytes(metric))
    rm = bytearray()
    _put_field(rm, 2, 2, bytes(sm))
    req = bytearray()
    _put_field(req, 1, 2, bytes(rm))

    floats, hists, dropped = translate_otlp(decode_otlp_metrics(bytes(req)))
    assert [(r[1], r[2]) for r in floats] == [(1_000, 5.0)]
    assert hists == [] and dropped == 1


def test_http_otlp_route_and_info_join(spark, tmp_path):
    """End-to-end: an OTLP body (gzip) lands floats + a native
    histogram in the store; target_info is joinable by promql info();
    garbage answers 400."""
    import urllib.error

    from tsdb_spark.api import serve
    from tsdb_spark.promql import eval_range_db

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    metrics = [
        {"name": "reqs", "unit": "", "kind": "sum", "monotonic": True,
         "temporality": 2,
         "points": [({"code": "200"}, 60_000, 5.0)]},
        {"name": "eh", "unit": "", "kind": "exponential_histogram",
         "temporality": 2,
         "points": [({}, 60_000, 4, 8.0, 0, 0, (0, [4]), (0, []))]},
    ]
    body = encode_otlp_metrics(_req(metrics), gzipped=True)
    srv = serve(db, "127.0.0.1", 0)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/otlp/v1/metrics",
            data=body,
            headers={"Content-Type": "application/x-protobuf",
                     "Content-Encoding": "gzip"},
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
        out = eval_range_db(
            db, 'info(reqs_total{code="200"})', 60_000, 60_000, 60_000
        ).collect()
        assert len(out) == 1
        lab = dict(out[0]["labels"])
        assert lab["k8s_cluster"] == "east" and out[0]["value"] == 5.0
        [hrow] = db.hist_frame(0, 120_000).collect()
        assert hrow["h"]["count"] == 4.0
        assert [(b["idx"], b["c"]) for b in hrow["h"]["buckets"]] == [(1, 4.0)]
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/otlp/v1/metrics",
            data=b"\x1f\x8b\xff",
            headers={"Content-Encoding": "gzip"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 400
    finally:
        srv.shutdown()


def test_backfill_otlp_distributed(spark, tmp_path):
    d = tmp_path / "payloads"
    d.mkdir()
    for i in range(3):
        metrics = [
            {"name": "bulk", "unit": "", "kind": "gauge",
             "points": [({"shard": str(i)}, j * 1_000, float(i * 10 + j))
                        for j in range(4)]},
        ]
        (d / f"p{i}.bin").write_bytes(
            encode_otlp_metrics([{"resource": {}, "metrics": metrics}])
        )
    df = backfill_otlp(spark, str(d))
    rows = df.filter("v IS NOT NULL")
    assert rows.count() == 12
    total = rows.groupBy().sum("v").collect()[0][0]
    assert total == sum(i * 10 + j for i in range(3) for j in range(4))


def test_otlp_route_through_write_buffer(spark, tmp_path):
    """OTLP ingestion honors the opt-in WriteBuffer: the POST enqueues
    (2xx = accepted), the flush commits floats AND native histograms."""
    from tsdb_spark.api import WriteBuffer, serve

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    buf = WriteBuffer(db, flush_ms=60_000)
    srv = serve(db, "127.0.0.1", 0, write_buffer=buf)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        metrics = [
            {"name": "g", "unit": "", "kind": "gauge",
             "points": [({}, 1_000, 5.0)]},
            {"name": "eh", "unit": "", "kind": "exponential_histogram",
             "temporality": 2,
             "points": [({}, 1_000, 3, 6.0, 0, 0, (0, [3]), (0, []))]},
        ]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/otlp/v1/metrics",
            data=encode_otlp_metrics([{"resource": {}, "metrics": metrics}]),
            headers={"Content-Type": "application/x-protobuf"},
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
        assert db.querier(0, 10**9).select([]).count() == 0  # queued
        assert buf.flush() == 2
        assert db.querier(0, 10**9).select([]).count() == 1
        assert db.hist_frame(0, 10**9).count() == 1
        buf.close()
    finally:
        srv.shutdown()


def test_histograms_as_nhcb_translation(spark, tmp_path):
    """otlp.convert_histograms_to_nhcb: explicit-bounds histograms
    ingest as NHCB native samples — OTLP's non-cumulative bucket_counts
    map 1:1 onto NHCB buckets (trailing entry = the +Inf overflow),
    bounds become custom_values, and histogram_quantile over the
    ingested sample answers exactly what classic bucketQuantile answers
    on the classic translation of the same point."""
    from pyspark.sql import functions as F

    from tsdb_spark.nativehist import hist_quantile

    metrics = [
        {"name": "rt", "unit": "", "kind": "histogram", "temporality": 2,
         "points": [({}, 5_000, 10, 12.5, [4, 3, 2, 1], [0.1, 0.5, 1.0])]},
    ]
    body = encode_otlp_metrics(_req(metrics))
    floats, hists, _ = translate_otlp(
        decode_otlp_metrics(body), histograms_as_nhcb=True
    )
    # no classic series; one NHCB sample
    assert not any("_bucket" in r[0]["__name__"] for r in floats)
    [(lab, t, h)] = hists
    assert lab["__name__"] == "rt" and t == 5_000
    assert h["schema"] == -53
    assert h["custom_values"] == [0.1, 0.5, 1.0]
    assert h["buckets"] == [(0, 4.0), (1, 3.0), (2, 2.0), (3, 1.0)]
    assert h["count"] == 10.0 and h["sum"] == 12.5

    # through the store: quantiles match the classic cumulative walk
    # (cum 4,7,9; rank 5 -> (0.1,0.5]: 0.1+0.4*(5-4)/3)
    from tsdb_spark import DB
    from tsdb_spark.api import otlp_write

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    assert otlp_write(db, body, histograms_as_nhcb=True) > 0
    [row] = db.hist_frame(0, 10**9).collect()
    q = spark.createDataFrame([(row["h"],)], "h " +
                              "STRUCT<count: DOUBLE, sum: DOUBLE, "
                              "zero_count: DOUBLE, schema: INT, buckets: "
                              "ARRAY<STRUCT<idx: INT, c: DOUBLE>>, "
                              "custom_values: ARRAY<DOUBLE>>").select(
        hist_quantile(0.5, F.col("h")).alias("q50"),
        hist_quantile(1.0, F.col("h")).alias("q100"),
    ).collect()[0]
    assert abs(q["q50"] - (0.1 + 0.4 * (5 - 4) / 3)) < 1e-12
    assert q["q100"] == 1.0  # rank in +Inf overflow -> last finite bound


def test_otlp_exemplars_roundtrip_and_ingest(spark, tmp_path):
    """OTLP exemplars (metrics.proto Exemplar on number and histogram
    points): trace_id/span_id render as hex labels plus filtered
    attributes (otlptranslator), survive the encode/decode roundtrip,
    and land in the exemplars side table — served by
    /api/v1/query_exemplars like remote-write v1 exemplars."""
    from tsdb_spark.api import otlp_write, query_exemplars

    ex = [({"trace_id": "0af7651916cd43dd8448eb211c80319c",
            "span_id": "b7ad6b7169203331", "qos": "gold"}, 1_000, 7.2)]
    metrics = [
        {"name": "req", "unit": "", "kind": "sum", "monotonic": True,
         "temporality": 2, "points": [({"code": "200"}, 1_000, 42.0, ex)]},
        {"name": "rt", "unit": "", "kind": "histogram", "temporality": 2,
         "points": [({}, 5_000, 10, 12.5, [4, 3, 2, 1], [0.1, 0.5, 1.0],
                     [({"trace_id": "00" * 16}, 4_000, 0.42)])]},
    ]
    body = encode_otlp_metrics(_req(metrics))

    # decode preserves the exemplar payloads
    res = decode_otlp_metrics(body)
    pts = {m["name"]: m["points"] for r in res for m in r["metrics"]}
    assert pts["req"][0][3] == ex
    assert pts["rt"][0][6] == [({"trace_id": "00" * 16}, 4_000, 0.42)]

    # translate collects exemplar rows keyed by the translated series
    out: list = []
    translate_otlp(res, exemplars_out=out)
    by = {r[0]["__name__"]: r for r in out}
    lab, t, v, elab = by["req_total"]
    assert (t, v) == (1_000, 7.2)
    assert elab["trace_id"].startswith("0af76519") and elab["qos"] == "gold"
    assert by["rt_bucket"][3]["trace_id"] == "00" * 16

    # through the store: query_exemplars serves them
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    otlp_write(db, body)
    got = query_exemplars(db, "req_total", 0, 10**9)["data"]
    [series] = got
    assert series["exemplars"][0]["labels"]["trace_id"].startswith("0af76519")
    assert series["exemplars"][0]["value"] == "7.2"
