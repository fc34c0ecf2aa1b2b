"""OTLP metrics ingestion — POST /api/v1/otlp/v1/metrics, the
OpenTelemetry ingest path Prometheus 3.x serves (storage/remote/
otlptranslator; proto schema: opentelemetry-proto
opentelemetry/proto/metrics/v1/metrics.proto +
collector/metrics/v1/metrics_service.proto, both public).

Decodes an ExportMetricsServiceRequest over the same pure-Python
protobuf wire machinery as remote-write and translates to this
engine's sample model per the upstream translator's rules
(documented subset):

- gauge → one float series per point; monotonic cumulative sum →
  counter with a `_total` suffix; DELTA-temporality sums/histograms
  are dropped with a count returned to the caller (upstream rejects
  delta — cumulative-only, like prometheus);
- explicit-bounds histogram → classic `_bucket{le=...}` cumulative
  series + `_sum` + `_count` (the upstream classic translation);
- exponential histogram → a NATIVE histogram sample
  (nativehist.HIST_TYPE): prometheus schema = clamp(scale, -4, 8)
  with bucket idx = otlp index + 1 (both formats share base
  2^(2^-scale); OTLP buckets are lower-exclusive (base^i, base^(i+1)],
  prometheus (base^(idx-1), base^idx]); negative-side buckets fold
  into zero_count per the engine's documented positive-only subset;
  points at a coarser-than-supported scale are downscaled by merging
  adjacent bucket pairs (scale-1 ⇒ pairs merge) until schema ≥ -4;
- summary → `{quantile="φ"}` series + `_sum` + `_count`;
- attributes → labels with prometheus name sanitization
  ([a-zA-Z0-9_], leading digit prefixed); resource attributes
  service.namespace/service.name → `job`, service.instance.id →
  `instance` (the upstream convention), remaining resource attributes
  become ONE `target_info` gauge series per resource — which this
  engine's PromQL `info()` can then join back onto samples;
- metric names sanitize + optional unit/total suffixing
  (add_metric_suffixes, default True like the upstream flag).

Scale shape: one POST body is collector-batch-sized, so the driver
decodes and the append distributes — the remote-write arrangement.
Archived OTLP payload files bulk-ingest via `backfill_otlp` (one
binaryFile + mapInPandas scan).
"""

from __future__ import annotations

import gzip as _gzip
import re
import struct

from tsdb_spark.sources.remotewrite import _fields, _put_field, _put_uvarint

__all__ = [
    "decode_otlp_metrics",
    "translate_otlp",
    "encode_otlp_metrics",
    "backfill_otlp",
]

_INVALID = re.compile(r"[^a-zA-Z0-9_]")

#: UCUM unit → prometheus suffix (normalize_name.go's table, the
#: commonly-seen rows)
_UNIT_SUFFIX = {
    "s": "seconds", "ms": "milliseconds", "us": "microseconds",
    "ns": "nanoseconds", "By": "bytes", "KiBy": "kibibytes",
    "MiBy": "mebibytes", "GiBy": "gibibytes", "B": "bytes",
    "1": "ratio", "%": "percent",
}


def _sanitize(name: str) -> str:
    out = _INVALID.sub("_", name)
    if out and out[0].isdigit():
        out = "_" + out
    return out


def _metric_name(name: str, unit: str, counter: bool, suffixes: bool) -> str:
    out = _sanitize(name)
    if suffixes:
        suff = _UNIT_SUFFIX.get(unit)
        if suff and not out.endswith(suff):
            out = f"{out}_{suff}"
        if counter and not out.endswith("_total"):
            out = f"{out}_total"
    return out


# ------------------------------------------------------------- decode


def _any_value(buf: bytes):
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 2:
            return payload.decode("utf-8")
        if field == 2 and wt == 0:
            return "true" if payload else "false"
        if field == 3 and wt == 0:
            v = payload - (1 << 64) if payload >= (1 << 63) else payload
            return str(v)
        if field == 4 and wt == 1:
            d = struct.unpack("<d", payload)[0]
            return str(int(d)) if d == int(d) else repr(d)
    return None  # arrays/kvlists/bytes are not label material


def _attributes(bufs: list[bytes]) -> dict[str, str]:
    out: dict[str, str] = {}
    for buf in bufs:
        key, val = "", None
        for field, wt, payload in _fields(buf):
            if field == 1 and wt == 2:
                key = payload.decode("utf-8")
            elif field == 2 and wt == 2:
                val = _any_value(payload)
        if key and val is not None:
            out[_sanitize(key)] = val
    return out


def _fixed64(payload: bytes) -> int:
    return struct.unpack("<Q", payload)[0]


def _packed_fixed64(payload: bytes) -> list[int]:
    return list(struct.unpack(f"<{len(payload) // 8}Q", payload))


def _packed_doubles(payload: bytes) -> list[float]:
    return list(struct.unpack(f"<{len(payload) // 8}d", payload))


def _packed_uvarints(payload: bytes) -> list[int]:
    out, i = [], 0
    while i < len(payload):
        shift = v = 0
        while True:
            b = payload[i]
            v |= (b & 0x7F) << shift
            i += 1
            if not b & 0x80:
                break
            shift += 7
        out.append(v)
    return out


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


#: DataPointFlags bit 0 (FLAG_NO_RECORDED_VALUE): the SDK recorded a
#: gap, not a value. The upstream translator turns these into staleness
#: NaN markers; this engine has no stale-NaN encoding (staleness is a
#: gap — promtool.py), so flagged points are DROPPED and counted into
#: translate_otlp's dropped tally rather than ingested as fabricated
#: 0.0 samples.
_FLAG_NO_RECORDED_VALUE = 1


def _exemplar(buf: bytes):
    """metrics.proto Exemplar: filtered_attributes=7, time=2,
    as_double=3 / as_int=6 (oneof), span_id=4, trace_id=5."""
    attrs: list[bytes] = []
    t = 0
    v = 0.0
    span = trace = b""
    for field, wt, payload in _fields(buf):
        if field == 7 and wt == 2:
            attrs.append(payload)
        elif field == 2 and wt == 1:
            t = _fixed64(payload)
        elif field == 3 and wt == 1:
            v = struct.unpack("<d", payload)[0]
        elif field == 6 and wt == 1:
            v = float(struct.unpack("<q", payload)[0])
        elif field == 4 and wt == 2:
            span = payload
        elif field == 5 and wt == 2:
            trace = payload
    lab = _attributes(attrs)
    if trace:
        lab["trace_id"] = trace.hex()
    if span:
        lab["span_id"] = span.hex()
    return lab, t // 1_000_000, v


def _number_point(buf: bytes):
    attrs: list[bytes] = []
    t = 0
    v = 0.0
    flags = 0
    exemplars: list = []
    for field, wt, payload in _fields(buf):
        if field == 7 and wt == 2:
            attrs.append(payload)
        elif field == 3 and wt == 1:
            t = _fixed64(payload)
        elif field == 4 and wt == 1:
            v = struct.unpack("<d", payload)[0]
        elif field == 6 and wt == 1:
            v = float(struct.unpack("<q", payload)[0])
        elif field == 5 and wt == 2:
            exemplars.append(_exemplar(payload))
        elif field == 8 and wt == 0:
            flags = payload
    if flags & _FLAG_NO_RECORDED_VALUE:
        return None
    return _attributes(attrs), t // 1_000_000, v, exemplars


def _hist_point(buf: bytes):
    attrs: list[bytes] = []
    t = count = 0
    hsum = None
    bucket_counts: list[int] = []
    bounds: list[float] = []
    flags = 0
    exemplars: list = []
    for field, wt, payload in _fields(buf):
        if field == 9 and wt == 2:
            attrs.append(payload)
        elif field == 3 and wt == 1:
            t = _fixed64(payload)
        elif field == 4 and wt == 1:
            count = _fixed64(payload)
        elif field == 5 and wt == 1:
            hsum = struct.unpack("<d", payload)[0]
        elif field == 6 and wt == 2:
            bucket_counts = _packed_fixed64(payload)
        elif field == 6 and wt == 1:
            bucket_counts.append(_fixed64(payload))
        elif field == 7 and wt == 2:
            bounds = _packed_doubles(payload)
        elif field == 7 and wt == 1:
            bounds.append(struct.unpack("<d", payload)[0])
        elif field == 8 and wt == 2:
            exemplars.append(_exemplar(payload))
        elif field == 10 and wt == 0:
            flags = payload
    if flags & _FLAG_NO_RECORDED_VALUE:
        return None
    return (_attributes(attrs), t // 1_000_000, count, hsum, bucket_counts,
            bounds, exemplars)


def _exp_buckets(buf: bytes) -> tuple[int, list[int]]:
    offset = 0
    counts: list[int] = []
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 0:
            offset = _unzigzag(payload)
        elif field == 2 and wt == 2:
            counts = _packed_uvarints(payload)
        elif field == 2 and wt == 0:
            counts.append(payload)
    return offset, counts


def _exp_hist_point(buf: bytes):
    attrs: list[bytes] = []
    t = count = zero_count = 0
    hsum = 0.0
    scale = 0
    pos = (0, [])
    neg = (0, [])
    flags = 0
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 2:
            attrs.append(payload)
        elif field == 3 and wt == 1:
            t = _fixed64(payload)
        elif field == 4 and wt == 1:
            count = _fixed64(payload)
        elif field == 5 and wt == 1:
            hsum = struct.unpack("<d", payload)[0]
        elif field == 6 and wt == 0:
            scale = _unzigzag(payload)
        elif field == 7 and wt == 1:
            zero_count = _fixed64(payload)
        elif field == 8 and wt == 2:
            pos = _exp_buckets(payload)
        elif field == 9 and wt == 2:
            neg = _exp_buckets(payload)
        elif field == 10 and wt == 0:
            flags = payload
    if flags & _FLAG_NO_RECORDED_VALUE:
        return None
    return _attributes(attrs), t // 1_000_000, count, hsum, scale, zero_count, pos, neg


def _summary_point(buf: bytes):
    attrs: list[bytes] = []
    t = count = 0
    hsum = 0.0
    qv: list[tuple[float, float]] = []
    flags = 0
    for field, wt, payload in _fields(buf):
        if field == 7 and wt == 2:
            attrs.append(payload)
        elif field == 3 and wt == 1:
            t = _fixed64(payload)
        elif field == 4 and wt == 1:
            count = _fixed64(payload)
        elif field == 5 and wt == 1:
            hsum = struct.unpack("<d", payload)[0]
        elif field == 8 and wt == 0:
            flags = payload
        elif field == 6 and wt == 2:
            q = v = 0.0
            for f2, wt2, p2 in _fields(payload):
                if f2 == 1 and wt2 == 1:
                    q = struct.unpack("<d", p2)[0]
                elif f2 == 2 and wt2 == 1:
                    v = struct.unpack("<d", p2)[0]
            qv.append((q, v))
    if flags & _FLAG_NO_RECORDED_VALUE:
        return None
    return _attributes(attrs), t // 1_000_000, count, hsum, qv


_CUMULATIVE = 2  # AggregationTemporality enum


def _take(m: dict, pt) -> None:
    """Collect a decoded point; a None (FLAG_NO_RECORDED_VALUE) counts
    into the metric's no_recorded tally instead of the point list."""
    if pt is None:
        m["no_recorded"] += 1
    else:
        m["points"].append(pt)


def decode_otlp_metrics(raw: bytes, gzipped: bool = False) -> list[dict]:
    """ExportMetricsServiceRequest bytes → a list of resource dicts:
    {"resource": {attrs}, "metrics": [{"name", "unit", "kind",
    "monotonic", "temporality", "points": [...]}]}. Pure decode —
    translation to the sample model is `translate_otlp`."""
    if gzipped:
        raw = _gzip.decompress(raw)
    resources = []
    for field, wt, payload in _fields(raw):
        if field != 1 or wt != 2:
            continue
        res_attrs: dict[str, str] = {}
        metrics: list[dict] = []
        for f2, wt2, p2 in _fields(payload):
            if f2 == 1 and wt2 == 2:  # Resource
                bufs = [
                    p3 for f3, wt3, p3 in _fields(p2) if f3 == 1 and wt3 == 2
                ]
                res_attrs = _attributes(bufs)
            elif f2 == 2 and wt2 == 2:  # ScopeMetrics
                for f3, wt3, p3 in _fields(p2):
                    if f3 != 2 or wt3 != 2:
                        continue
                    m = {"name": "", "unit": "", "kind": None,
                         "monotonic": False, "temporality": _CUMULATIVE,
                         "points": [], "no_recorded": 0}
                    for f4, wt4, p4 in _fields(p3):
                        if f4 == 1 and wt4 == 2:
                            m["name"] = p4.decode("utf-8")
                        elif f4 == 3 and wt4 == 2:
                            m["unit"] = p4.decode("utf-8")
                        elif f4 == 5 and wt4 == 2:  # Gauge
                            m["kind"] = "gauge"
                            for f5, wt5, p5 in _fields(p4):
                                if f5 == 1 and wt5 == 2:
                                    _take(m, _number_point(p5))
                        elif f4 == 7 and wt4 == 2:  # Sum
                            m["kind"] = "sum"
                            for f5, wt5, p5 in _fields(p4):
                                if f5 == 1 and wt5 == 2:
                                    _take(m, _number_point(p5))
                                elif f5 == 2 and wt5 == 0:
                                    m["temporality"] = p5
                                elif f5 == 3 and wt5 == 0:
                                    m["monotonic"] = bool(p5)
                        elif f4 == 9 and wt4 == 2:  # Histogram
                            m["kind"] = "histogram"
                            for f5, wt5, p5 in _fields(p4):
                                if f5 == 1 and wt5 == 2:
                                    _take(m, _hist_point(p5))
                                elif f5 == 2 and wt5 == 0:
                                    m["temporality"] = p5
                        elif f4 == 10 and wt4 == 2:  # ExponentialHistogram
                            m["kind"] = "exponential_histogram"
                            for f5, wt5, p5 in _fields(p4):
                                if f5 == 1 and wt5 == 2:
                                    _take(m, _exp_hist_point(p5))
                                elif f5 == 2 and wt5 == 0:
                                    m["temporality"] = p5
                        elif f4 == 11 and wt4 == 2:  # Summary
                            m["kind"] = "summary"
                            for f5, wt5, p5 in _fields(p4):
                                if f5 == 1 and wt5 == 2:
                                    _take(m, _summary_point(p5))
                    if m["kind"]:
                        metrics.append(m)
        resources.append({"resource": res_attrs, "metrics": metrics})
    return resources


# ---------------------------------------------------------- translate


def _fmt_bound(b: float) -> str:
    """le / quantile label rendering, matching Go's
    strconv.FormatFloat(b, 'f', -1, 64) as the upstream translator and
    this engine's other le renderings (api.format_value) do: integral
    floats drop the '.0' ('10', not '10.0') so OTLP-translated series
    share identity with Prometheus-scraped equivalents in federation
    joins; otherwise Python repr == Go's shortest round-trip."""
    b = float(b)
    if b == int(b) and abs(b) < 1e15:
        return str(int(b))
    return repr(b)


def _downscale(buckets: list[tuple[int, float]], times: int):
    """Merge adjacent bucket pairs `times` times (scale-1 per merge):
    prometheus idx i at scale s covers what idx ceil(i/2) covers at
    s-1 (model/histogram mergeToSchema)."""
    for _ in range(times):
        merged: dict[int, float] = {}
        for idx, c in buckets:
            ni = (idx + 1) >> 1
            merged[ni] = merged.get(ni, 0.0) + c
        buckets = sorted(merged.items())
    return [(int(i), float(c)) for i, c in buckets]


def translate_otlp(
    resources: list[dict], add_metric_suffixes: bool = True,
    histograms_as_nhcb: bool = False,
    exemplars_out: list | None = None,
) -> tuple[list, list, int]:
    """Decoded resources → (float_rows, hist_rows, dropped_points).
    float_rows: (labels, t_ms, v); hist_rows: (labels, t_ms, h) with h
    in the nativehist dict shape. Delta-temporality points count into
    `dropped_points` (upstream rejects delta).

    `histograms_as_nhcb` (the otlp.convert_histograms_to_nhcb config
    option, prometheus 3.x): explicit-bounds histograms become NHCB
    native samples (schema -53, bounds → custom_values, OTLP's
    already-non-cumulative bucket_counts → sparse buckets with the
    trailing entry as the +Inf overflow) instead of classic
    _bucket/_sum/_count series.

    `exemplars_out` (a caller-supplied list) collects OTLP exemplars as
    (series_labels, t_ms, v, exemplar_labels) rows — trace_id/span_id
    hex plus filtered attributes, the otlptranslator convention — ready
    for DB.append_exemplars; None drops them (the pre-r9 behavior)."""
    floats: list[tuple] = []
    hists: list[tuple] = []
    dropped = 0
    for res in resources:
        rattrs = dict(res["resource"])
        job_parts = [
            p for p in (rattrs.pop("service_namespace", ""),
                        rattrs.pop("service_name", "")) if p
        ]
        base = {}
        if job_parts:
            base["job"] = "/".join(job_parts)
        inst = rattrs.pop("service_instance_id", "")
        if inst:
            base["instance"] = inst
        max_t = 0
        for m in res["metrics"]:
            # no-recorded-value points were dropped at decode (gaps,
            # not values); surface them in the dropped tally
            dropped += m.get("no_recorded", 0)
            counter = m["kind"] == "sum" and m["monotonic"]
            if m["kind"] in ("sum", "histogram", "exponential_histogram") and \
                    m["temporality"] != _CUMULATIVE:
                dropped += len(m["points"])
                continue
            name = _metric_name(m["name"], m["unit"], counter, add_metric_suffixes)
            if m["kind"] in ("gauge", "sum"):
                for attrs, t, v, *rest in m["points"]:
                    lab = {**attrs, **base, "__name__": name}
                    floats.append((lab, t, float(v)))
                    if exemplars_out is not None and rest and rest[0]:
                        for elab, et, ev in rest[0]:
                            exemplars_out.append((lab, et, float(ev), elab))
                    max_t = max(max_t, t)
            elif m["kind"] == "histogram" and histograms_as_nhcb:
                for attrs, t, count, hsum, bucket_counts, bounds, *rest \
                        in m["points"]:
                    if exemplars_out is not None and rest and rest[0]:
                        xlab = {**attrs, **base, "__name__": name}
                        for elab, et, ev in rest[0]:
                            exemplars_out.append((xlab, et, float(ev), elab))
                    buckets = [
                        (i, float(c))
                        for i, c in enumerate(bucket_counts)
                        if c and i <= len(bounds)
                    ]
                    hists.append((
                        {**attrs, **base, "__name__": name},
                        t,
                        {
                            "count": float(count),
                            "sum": float(hsum if hsum is not None else 0.0),
                            "zero_count": 0.0,
                            "schema": -53,
                            "buckets": buckets,
                            "custom_values": [float(b) for b in bounds],
                        },
                    ))
                    max_t = max(max_t, t)
            elif m["kind"] == "histogram":
                for attrs, t, count, hsum, bucket_counts, bounds, *rest \
                        in m["points"]:
                    lab = {**attrs, **base}
                    if exemplars_out is not None and rest and rest[0]:
                        # upstream attaches classic-histogram exemplars
                        # to the _bucket series; the engine's exemplar
                        # table keys by series labels — use the family
                        # base name (joins back via query_exemplars)
                        xlab = {**lab, "__name__": f"{name}_bucket"}
                        for elab, et, ev in rest[0]:
                            exemplars_out.append((xlab, et, float(ev), elab))
                    cum = 0
                    for i, b in enumerate(bounds):
                        cum += bucket_counts[i] if i < len(bucket_counts) else 0
                        floats.append((
                            {**lab, "__name__": f"{name}_bucket", "le": _fmt_bound(b)},
                            t, float(cum),
                        ))
                    floats.append((
                        {**lab, "__name__": f"{name}_bucket", "le": "+Inf"},
                        t, float(count),
                    ))
                    if hsum is not None:
                        floats.append(({**lab, "__name__": f"{name}_sum"}, t, float(hsum)))
                    floats.append(({**lab, "__name__": f"{name}_count"}, t, float(count)))
                    max_t = max(max_t, t)
            elif m["kind"] == "exponential_histogram":
                for attrs, t, count, hsum, scale, zero_count, pos, neg in m["points"]:
                    schema = min(scale, 8)
                    off, counts = pos
                    buckets = [
                        (off + i + 1, float(c))
                        for i, c in enumerate(counts)
                        if c
                    ]
                    if schema < -4:
                        buckets = _downscale(buckets, -4 - schema)
                        schema = -4
                    elif scale > 8:
                        buckets = _downscale(buckets, scale - 8)
                    neg_total = float(sum(neg[1]))
                    hists.append((
                        {**attrs, **base, "__name__": name},
                        t,
                        {
                            "count": float(count),
                            "sum": float(hsum),
                            "zero_count": float(zero_count) + neg_total,
                            "schema": int(schema),
                            "buckets": buckets,
                        },
                    ))
                    max_t = max(max_t, t)
            elif m["kind"] == "summary":
                for attrs, t, count, hsum, qv in m["points"]:
                    lab = {**attrs, **base}
                    for q, v in qv:
                        floats.append((
                            {**lab, "__name__": name,
                             "quantile": _fmt_bound(q)},
                            t, float(v),
                        ))
                    floats.append(({**lab, "__name__": f"{name}_sum"}, t, float(hsum)))
                    floats.append(({**lab, "__name__": f"{name}_count"}, t, float(count)))
                    max_t = max(max_t, t)
        if rattrs and base and max_t:
            # remaining resource attributes ride ONE target_info series
            # (otlptranslator; this engine's promql info() joins it back)
            floats.append((
                {**rattrs, **base, "__name__": "target_info"}, max_t, 1.0,
            ))
    return floats, hists, dropped


# ------------------------------------------------------------- encode
#
# sender side, for tests and payload archives: the minimal writer for
# the subset the decoder reads.


def _encode_exemplar(lab: dict, t_ms: int, v: float) -> bytes:
    """(labels, t_ms, v) → wire Exemplar; trace_id/span_id keys become
    the bytes fields, everything else filtered attributes."""
    eb = bytearray()
    for k, val in lab.items():
        if k == "trace_id":
            _put_field(eb, 5, 2, bytes.fromhex(val))
        elif k == "span_id":
            _put_field(eb, 4, 2, bytes.fromhex(val))
        else:
            _put_field(eb, 7, 2, _kv(k, val))
    _put_field(eb, 2, 1, struct.pack("<Q", t_ms * 1_000_000))
    _put_field(eb, 3, 1, struct.pack("<d", float(v)))
    return bytes(eb)


def _kv(key: str, val: str) -> bytes:
    av = bytearray()
    _put_field(av, 1, 2, val.encode("utf-8"))
    kv = bytearray()
    _put_field(kv, 1, 2, key.encode("utf-8"))
    _put_field(kv, 2, 2, bytes(av))
    return bytes(kv)


def encode_otlp_metrics(resources: list[dict], gzipped: bool = False) -> bytes:
    """[{"resource": {attrs}, "metrics": [metric dicts as produced by
    decode_otlp_metrics]}] → ExportMetricsServiceRequest bytes."""
    req = bytearray()
    for res in resources:
        rm = bytearray()
        rb = bytearray()
        for k, v in res.get("resource", {}).items():
            _put_field(rb, 1, 2, _kv(k, v))
        _put_field(rm, 1, 2, bytes(rb))
        sm = bytearray()
        for m in res["metrics"]:
            mb = bytearray()
            _put_field(mb, 1, 2, m["name"].encode("utf-8"))
            if m.get("unit"):
                _put_field(mb, 3, 2, m["unit"].encode("utf-8"))
            kind = m["kind"]
            body = bytearray()
            if kind in ("gauge", "sum"):
                for attrs, t, v, *rest in m["points"]:
                    pt = bytearray()
                    for k2, v2 in attrs.items():
                        _put_field(pt, 7, 2, _kv(k2, v2))
                    _put_field(pt, 3, 1, struct.pack("<Q", t * 1_000_000))
                    _put_field(pt, 4, 1, struct.pack("<d", float(v)))
                    for ex in (rest[0] if rest else []):
                        _put_field(pt, 5, 2, _encode_exemplar(*ex))
                    _put_field(body, 1, 2, bytes(pt))
                if kind == "sum":
                    _put_field(body, 2, 0, m.get("temporality", _CUMULATIVE))
                    if m.get("monotonic"):
                        _put_field(body, 3, 0, 1)
                _put_field(mb, 5 if kind == "gauge" else 7, 2, bytes(body))
            elif kind == "histogram":
                for attrs, t, count, hsum, bucket_counts, bounds, *rest \
                        in m["points"]:
                    pt = bytearray()
                    for k2, v2 in attrs.items():
                        _put_field(pt, 9, 2, _kv(k2, v2))
                    _put_field(pt, 3, 1, struct.pack("<Q", t * 1_000_000))
                    _put_field(pt, 4, 1, struct.pack("<Q", count))
                    if hsum is not None:
                        _put_field(pt, 5, 1, struct.pack("<d", hsum))
                    _put_field(
                        pt, 6, 2,
                        struct.pack(f"<{len(bucket_counts)}Q", *bucket_counts),
                    )
                    _put_field(
                        pt, 7, 2, struct.pack(f"<{len(bounds)}d", *bounds)
                    )
                    for ex in (rest[0] if rest else []):
                        _put_field(pt, 8, 2, _encode_exemplar(*ex))
                    _put_field(body, 1, 2, bytes(pt))
                _put_field(body, 2, 0, m.get("temporality", _CUMULATIVE))
                _put_field(mb, 9, 2, bytes(body))
            elif kind == "exponential_histogram":
                for attrs, t, count, hsum, scale, zero_count, pos, neg in m["points"]:
                    pt = bytearray()
                    for k2, v2 in attrs.items():
                        _put_field(pt, 1, 2, _kv(k2, v2))
                    _put_field(pt, 3, 1, struct.pack("<Q", t * 1_000_000))
                    _put_field(pt, 4, 1, struct.pack("<Q", count))
                    _put_field(pt, 5, 1, struct.pack("<d", hsum))
                    z = (scale << 1) ^ (scale >> 63) if scale < 0 else scale << 1
                    _put_field(pt, 6, 0, z)
                    _put_field(pt, 7, 1, struct.pack("<Q", zero_count))
                    for fnum, (off, counts) in ((8, pos), (9, neg)):
                        if not counts:
                            continue
                        bb = bytearray()
                        zo = (off << 1) ^ (off >> 63) if off < 0 else off << 1
                        _put_field(bb, 1, 0, zo)
                        packed = bytearray()
                        for c in counts:
                            _put_uvarint(packed, c)
                        _put_field(bb, 2, 2, bytes(packed))
                        _put_field(pt, fnum, 2, bytes(bb))
                    _put_field(body, 1, 2, bytes(pt))
                _put_field(body, 2, 0, m.get("temporality", _CUMULATIVE))
                _put_field(mb, 10, 2, bytes(body))
            elif kind == "summary":
                for attrs, t, count, hsum, qv in m["points"]:
                    pt = bytearray()
                    for k2, v2 in attrs.items():
                        _put_field(pt, 7, 2, _kv(k2, v2))
                    _put_field(pt, 3, 1, struct.pack("<Q", t * 1_000_000))
                    _put_field(pt, 4, 1, struct.pack("<Q", count))
                    _put_field(pt, 5, 1, struct.pack("<d", hsum))
                    for q, v in qv:
                        qb = bytearray()
                        _put_field(qb, 1, 1, struct.pack("<d", q))
                        _put_field(qb, 2, 1, struct.pack("<d", v))
                        _put_field(pt, 6, 2, bytes(qb))
                    _put_field(body, 1, 2, bytes(pt))
                _put_field(mb, 11, 2, bytes(body))
            _put_field(sm, 2, 2, bytes(mb))
        _put_field(rm, 2, 2, bytes(sm))
        _put_field(req, 1, 2, bytes(rm))
    raw = bytes(req)
    return _gzip.compress(raw) if gzipped else raw


# ------------------------------------------------------- Spark bridge


def backfill_otlp(spark, path: str, histograms_as_nhcb: bool = False):
    """Bulk decode archived OTLP payload files as ONE distributed
    binaryFile + mapInPandas scan, emitting the unified (labels, t, v,
    h) frame backfill_remote_write_v2 uses — floats carry v, native
    histograms (from exponential-histogram points) carry h."""
    import pandas as pd  # noqa: PLC0415 — executor-side import pattern

    from tsdb_spark.nativehist import HIST_TYPE

    files = spark.read.format("binaryFile").load(path).select("content")
    schema = f"labels MAP<STRING,STRING>, t LONG, v DOUBLE, h {HIST_TYPE}"

    def _decode(batches):
        for pdf in batches:
            labels_out, t_out, v_out, h_out = [], [], [], []
            for raw in pdf["content"]:
                floats, hists, _ = translate_otlp(
                    decode_otlp_metrics(bytes(raw)),
                    histograms_as_nhcb=histograms_as_nhcb,
                )
                for lab, t, v in floats:
                    labels_out.append(lab)
                    t_out.append(t)
                    v_out.append(v)
                    h_out.append(None)
                for lab, t, h in hists:
                    labels_out.append(lab)
                    t_out.append(t)
                    v_out.append(None)
                    h_out.append(
                        {
                            "count": h["count"],
                            "sum": h["sum"],
                            "zero_count": h["zero_count"],
                            "schema": h["schema"],
                            "buckets": [
                                {"idx": int(i), "c": float(c)}
                                for i, c in h["buckets"]
                            ],
                            "custom_values": h.get("custom_values"),
                        }
                    )
            yield pd.DataFrame(
                {"labels": labels_out, "t": t_out, "v": v_out, "h": h_out}
            )

    return files.mapInPandas(_decode, schema)
