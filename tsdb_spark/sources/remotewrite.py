"""Prometheus remote-write (prompb WriteRequest) wire protocol.

The upstream ingest network protocol is remote write (prometheus/
prometheus storage/remote, prompb/remote.proto — a layer ABOVE the
reference repo, which predates it): an HTTP POST whose body is a
snappy-block-compressed protobuf `WriteRequest`. This module implements
both codecs in pure Python from the published public specifications —
the protobuf wire format (protobuf.dev/programming-guides/encoding) and
the snappy block format (github.com/google/snappy
format_description.txt) — because the environment ships neither a
protobuf runtime nor a snappy binding.

Message schema (prompb/remote.proto + prompb/types.proto, v1):

    WriteRequest { repeated TimeSeries timeseries = 1; }
    TimeSeries   { repeated Label labels = 1;
                   repeated Sample samples = 2;
                   repeated Exemplar exemplars = 3; }  # 4 histograms:
                                                       # v2's job below
    Label        { string name = 1; string value = 2; }
    Sample       { double value = 1; int64 timestamp = 2; }

Unknown fields are skipped by wire type, so payloads from newer senders
(metadata, created-timestamps) decode cleanly. Native histograms ride
the REMOTE-WRITE 2.0 message (io.prometheus.write.v2.Request — the
second half of this module), which /api/v1/write content-negotiates.

Scale shape: a single POST body is small (senders cap batches around
~500-5000 samples), so the driver decodes it and the APPEND is the
distributed work, exactly like the scrape path. For bulk backfill of
archived payload files there is `backfill_remote_write`: a
`spark.read.format("binaryFile")` scan + an Arrow-batched `mapInPandas`
decode — one distributed pass, one file per task, no driver loop — so a
100 TB archive of WriteRequests ingests with the same shuffle profile
as any other append.
"""

from __future__ import annotations

import struct
from collections.abc import Iterable, Iterator

__all__ = [
    "snappy_compress",
    "snappy_decompress",
    "decode_write_request",
    "encode_write_request",
    "decode_read_request",
    "encode_read_request",
    "decode_read_response",
    "encode_read_response",
    "remote_write_df",
    "push_remote_write",
    "push_remote_write_v2",
    "backfill_remote_write",
    "decode_write_request_v2",
    "encode_write_request_v2",
    "backfill_remote_write_v2",
]


# ------------------------------------------------------------- varint


def _uvarint(buf: bytes, i: int) -> tuple[int, int]:
    """Decode one base-128 varint at buf[i:]; returns (value, next_i)."""
    shift = 0
    val = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated varint")
        b = buf[i]
        val |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return val, i
        shift += 7
        if shift > 63:
            raise ValueError("varint exceeds 64 bits")


def _put_uvarint(out: bytearray, v: int) -> None:
    while v > 0x7F:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _int64(v: int) -> int:
    """Two's-complement reinterpretation of a 64-bit varint as int64."""
    return v - (1 << 64) if v >= (1 << 63) else v


# ------------------------------------------------- snappy block format


def snappy_decompress(data: bytes) -> bytes:
    """Decompress one snappy BLOCK-format stream (the remote-write body
    encoding; NOT the framing format). Full tag support: literals and
    all three copy element kinds, byte-wise back-reference copy so
    overlapping runs (offset < length) expand correctly."""
    want, i = _uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while i < n:
        tag = data[i]
        i += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 60..63 → 1..4 little-endian length bytes
                k = ln - 59
                if i + k > n:
                    raise ValueError("truncated literal length")
                ln = int.from_bytes(data[i : i + k], "little")
                i += k
            ln += 1
            if i + ln > n:
                raise ValueError("truncated literal body")
            out += data[i : i + ln]
            i += ln
            continue
        if kind == 1:  # copy, 1-byte offset (3-bit length, 11-bit offset)
            ln = ((tag >> 2) & 0x7) + 4
            if i >= n:
                raise ValueError("truncated copy-1")
            off = ((tag >> 5) << 8) | data[i]
            i += 1
        elif kind == 2:  # copy, 2-byte little-endian offset
            ln = (tag >> 2) + 1
            if i + 2 > n:
                raise ValueError("truncated copy-2")
            off = int.from_bytes(data[i : i + 2], "little")
            i += 2
        else:  # copy, 4-byte little-endian offset
            ln = (tag >> 2) + 1
            if i + 4 > n:
                raise ValueError("truncated copy-4")
            off = int.from_bytes(data[i : i + 4], "little")
            i += 4
        if off == 0 or off > len(out):
            raise ValueError("copy offset out of range")
        if off >= ln:  # disjoint: one slice copy
            start = len(out) - off
            out += out[start : start + ln]
        else:  # overlapping run: byte-at-a-time per the spec
            start = len(out) - off
            for k in range(ln):
                out.append(out[start + k])
    if len(out) != want:
        raise ValueError(f"snappy length mismatch: got {len(out)}, want {want}")
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Compress to snappy block format. Emits literal elements only —
    a valid stream any conformant decoder (including upstream's) accepts;
    the spec makes back-reference emission optional for compressors.
    Chunked at 2^24-1 so every length fits the 3-byte literal tag."""
    out = bytearray()
    _put_uvarint(out, len(data))
    i, n = 0, len(data)
    while i < n or n == 0:
        chunk = min(n - i, (1 << 24) - 1)
        if chunk == 0:
            break
        ln = chunk - 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < (1 << 8):
            out.append(60 << 2)
            out += ln.to_bytes(1, "little")
        elif ln < (1 << 16):
            out.append(61 << 2)
            out += ln.to_bytes(2, "little")
        else:
            out.append(62 << 2)
            out += ln.to_bytes(3, "little")
        out += data[i : i + chunk]
        i += chunk
    return bytes(out)


# --------------------------------------------- protobuf wire en/decode


def _fields(buf: bytes) -> Iterator[tuple[int, int, bytes | int]]:
    """Iterate (field_number, wire_type, payload) over one message.
    Length-delimited payloads come back as bytes; varints as int;
    fixed64/fixed32 as raw bytes. Groups (wire types 3/4) are rejected —
    prompb never uses them."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _uvarint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _uvarint(buf, i)
            yield field, wt, v
        elif wt == 1:
            if i + 8 > n:
                raise ValueError("truncated fixed64")
            yield field, wt, buf[i : i + 8]
            i += 8
        elif wt == 2:
            ln, i = _uvarint(buf, i)
            if i + ln > n:
                raise ValueError("truncated length-delimited field")
            yield field, wt, buf[i : i + ln]
            i += ln
        elif wt == 5:
            if i + 4 > n:
                raise ValueError("truncated fixed32")
            yield field, wt, buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")


def _decode_label(buf: bytes) -> tuple[str, str]:
    name = value = ""
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 2:
            name = payload.decode("utf-8")
        elif field == 2 and wt == 2:
            value = payload.decode("utf-8")
    return name, value


def _decode_sample(buf: bytes) -> tuple[int, float]:
    t, v = 0, 0.0
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 1:
            v = struct.unpack("<d", payload)[0]
        elif field == 2 and wt == 0:
            t = _int64(payload)
    return t, v


def _decode_exemplar(buf: bytes) -> tuple[dict[str, str], int, float]:
    """Exemplar { repeated Label labels = 1; double value = 2;
    int64 timestamp = 3; } → (exemplar_labels, t_ms, value)."""
    labels: dict[str, str] = {}
    t, v = 0, 0.0
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 2:
            name, value = _decode_label(payload)
            labels[name] = value
        elif field == 2 and wt == 1:
            v = struct.unpack("<d", payload)[0]
        elif field == 3 and wt == 0:
            t = _int64(payload)
    return labels, t, v


def _decode_timeseries(
    buf: bytes, with_exemplars: bool = False, with_histograms: bool = False
):
    """(labels, samples[, exemplars][, histograms]) — the optional
    elements appear in that order when their flag is set. Histograms
    are prompb TimeSeries field 4 (prompb.Histogram — the V1 field
    numbering, distinct from writev2's)."""
    labels: dict[str, str] = {}
    samples: list[tuple[int, float]] = []
    exemplars: list[tuple[dict[str, str], int, float]] = []
    hists: list[tuple[int, dict]] = []
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 2:
            name, value = _decode_label(payload)
            labels[name] = value
        elif field == 2 and wt == 2:
            samples.append(_decode_sample(payload))
        elif field == 3 and wt == 2 and with_exemplars:
            exemplars.append(_decode_exemplar(payload))
        elif field == 4 and wt == 2 and with_histograms:
            hists.append(_decode_histogram_v1(payload))
        # unknown fields skipped by wire type
    out = [labels, samples]
    if with_exemplars:
        out.append(exemplars)
    if with_histograms:
        out.append(hists)
    return tuple(out) if len(out) > 2 else (labels, samples)


def decode_write_request(
    raw: bytes, compressed: bool = True, with_exemplars: bool = False,
    with_histograms: bool = False,
):
    """Decode a remote-write body into [(labels, [(t_ms, v), ...]), ...]
    — with_exemplars adds [(exemplar_labels, t_ms, value), ...] (prompb
    TimeSeries field 3), with_histograms adds [(t_ms, hist dict), ...]
    (field 4, prompb.Histogram v1 numbering), in that order.
    `compressed=True` (the wire default) snappy-decompresses first."""
    buf = snappy_decompress(raw) if compressed else raw
    out = []
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 2:
            out.append(
                _decode_timeseries(payload, with_exemplars, with_histograms)
            )
    return out


def _put_field(out: bytearray, field: int, wt: int, payload) -> None:
    _put_uvarint(out, (field << 3) | wt)
    if wt == 0:
        _put_uvarint(out, payload)
    elif wt == 2:
        _put_uvarint(out, len(payload))
        out += payload
    else:  # wt == 1, raw 8 bytes
        out += payload


def encode_write_request(
    series: Iterable[tuple],
    compressed: bool = True,
) -> bytes:
    """Encode [(labels, [(t_ms, v), ...]), ...] as a remote-write body
    (the sender side — what a client POSTs to /api/v1/write). A series
    tuple may carry a third element [(exemplar_labels, t_ms, value),
    ...] emitted as prompb Exemplar messages. Label pairs are emitted
    sorted by name, as the spec requires of senders."""
    req = bytearray()
    for entry in series:
        labels, samples = entry[0], entry[1]
        exemplars = entry[2] if len(entry) > 2 else ()
        ts = bytearray()
        for name in sorted(labels):
            lb = bytearray()
            _put_field(lb, 1, 2, name.encode("utf-8"))
            _put_field(lb, 2, 2, labels[name].encode("utf-8"))
            _put_field(ts, 1, 2, bytes(lb))
        for t, v in samples:
            sb = bytearray()
            _put_field(sb, 1, 1, struct.pack("<d", v))
            _put_field(sb, 2, 0, t & ((1 << 64) - 1))  # int64 two's complement
            _put_field(ts, 2, 2, bytes(sb))
        for ex_labels, t, v in exemplars:
            eb = bytearray()
            for name in sorted(ex_labels):
                lb = bytearray()
                _put_field(lb, 1, 2, name.encode("utf-8"))
                _put_field(lb, 2, 2, ex_labels[name].encode("utf-8"))
                _put_field(eb, 1, 2, bytes(lb))
            _put_field(eb, 2, 1, struct.pack("<d", v))
            _put_field(eb, 3, 0, t & ((1 << 64) - 1))
            _put_field(ts, 3, 2, bytes(eb))
        # optional 4th element: [(t, h), ...] native histograms (prompb
        # TimeSeries field 4 — v1 remote write carries them since 2.40)
        for t, h in (entry[3] if len(entry) > 3 else ()):
            _put_field(ts, 4, 2, _encode_histogram_v1(t, h))
        _put_field(req, 1, 2, bytes(ts))
    raw = bytes(req)
    return snappy_compress(raw) if compressed else raw


# -------------------------------------- remote read (sampled variant)
#
# prompb ReadRequest/ReadResponse — the SAMPLED response type (raw
# samples in TimeSeries messages). The STREAMED_XOR_CHUNKS variant
# needs the XOR chunk encoding SURVEY §2.8 maps to Parquet, so this
# engine negotiates the sampled form only (the protocol's default,
# which every client must accept).

_MATCHER_TYPES = {0: "=", 1: "!=", 2: "=~", 3: "!~"}
_MATCHER_CODES = {v: k for k, v in _MATCHER_TYPES.items()}


def _decode_matcher(buf: bytes) -> tuple[str, str, str]:
    mtype, name, value = 0, "", ""
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 0:
            mtype = payload
        elif field == 2 and wt == 2:
            name = payload.decode("utf-8")
        elif field == 3 and wt == 2:
            value = payload.decode("utf-8")
    return _MATCHER_TYPES[mtype], name, value


def _decode_query(buf: bytes) -> dict:
    q = {"start": 0, "end": 0, "matchers": []}
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 0:
            q["start"] = _int64(payload)
        elif field == 2 and wt == 0:
            q["end"] = _int64(payload)
        elif field == 3 and wt == 2:
            q["matchers"].append(_decode_matcher(payload))
        # field 4 (hints) skipped — read-path pruning is the planner's job
    return q


def decode_read_request(raw: bytes, compressed: bool = True) -> list[dict]:
    """ReadRequest → [{"start", "end", "matchers": [(op, name, value)]}]."""
    return decode_read_request_full(raw, compressed)[0]


def decode_read_request_full(
    raw: bytes, compressed: bool = True
) -> tuple[list[dict], list[int]]:
    """ReadRequest → (queries, accepted_response_types). The enum list
    (field 2, packed: 0 = SAMPLES, 1 = STREAMED_XOR_CHUNKS) drives
    response-type negotiation — an empty list means SAMPLES, the
    protocol default every reader accepts."""
    buf = snappy_decompress(raw) if compressed else raw
    out = []
    accepted: list[int] = []
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 2:
            out.append(_decode_query(payload))
        elif field == 2 and wt == 2:  # packed enum
            i = 0
            while i < len(payload):
                v, i = _uvarint(payload, i)
                accepted.append(v)
        elif field == 2 and wt == 0:  # unpacked fallback
            accepted.append(payload)
    return out, accepted


def encode_read_request(
    queries: list[dict],
    compressed: bool = True,
    accepted: list[int] | None = None,
) -> bytes:
    """Client-side ReadRequest encoder (tests / this engine acting as a
    remote-read client of another store). `accepted` lists the
    accepted_response_types enum values in preference order
    (0 = SAMPLES, 1 = STREAMED_XOR_CHUNKS); omitted = SAMPLES."""
    req = bytearray()
    for q in queries:
        qb = bytearray()
        _put_field(qb, 1, 0, int(q["start"]) & ((1 << 64) - 1))
        _put_field(qb, 2, 0, int(q["end"]) & ((1 << 64) - 1))
        for op, name, value in q["matchers"]:
            mb = bytearray()
            _put_field(mb, 1, 0, _MATCHER_CODES[op])
            _put_field(mb, 2, 2, name.encode("utf-8"))
            _put_field(mb, 3, 2, value.encode("utf-8"))
            _put_field(qb, 3, 2, bytes(mb))
        _put_field(req, 1, 2, bytes(qb))
    if accepted:
        packed = bytearray()
        for a in accepted:
            _put_uvarint(packed, a)
        _put_field(req, 2, 2, bytes(packed))
    raw = bytes(req)
    return snappy_compress(raw) if compressed else raw


def _encode_timeseries(out: bytearray, labels: dict, samples, hists=()) -> None:
    ts = bytearray()
    for name in sorted(labels):
        lb = bytearray()
        _put_field(lb, 1, 2, name.encode("utf-8"))
        _put_field(lb, 2, 2, labels[name].encode("utf-8"))
        _put_field(ts, 1, 2, bytes(lb))
    for t, v in samples:
        sb = bytearray()
        _put_field(sb, 1, 1, struct.pack("<d", v))
        _put_field(sb, 2, 0, t & ((1 << 64) - 1))
        _put_field(ts, 2, 2, bytes(sb))
    for t, h in hists:
        _put_field(ts, 4, 2, _encode_histogram_v1(t, h))
    _put_field(out, 1, 2, bytes(ts))


def encode_read_response(
    results: list[list[tuple[dict[str, str], list[tuple[int, float]]]]],
    compressed: bool = True,
) -> bytes:
    """[[(labels, [(t, v), ...]), ...] per query] → ReadResponse bytes.
    Samples must already be time-sorted per series (the spec's
    requirement of responders)."""
    resp = bytearray()
    for series_list in results:
        qr = bytearray()
        for entry in series_list:
            _encode_timeseries(
                qr, entry[0], entry[1],
                entry[2] if len(entry) > 2 else (),
            )
        _put_field(resp, 1, 2, bytes(qr))
    raw = bytes(resp)
    return snappy_compress(raw) if compressed else raw


def decode_read_response(
    raw: bytes, compressed: bool = True
) -> list[list[tuple[dict[str, str], list[tuple[int, float]]]]]:
    buf = snappy_decompress(raw) if compressed else raw
    out = []
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 2:
            series = []
            for f2, wt2, p2 in _fields(payload):
                if f2 == 1 and wt2 == 2:
                    series.append(_decode_timeseries(p2))
            out.append(series)
    return out


def decode_read_response_full(
    raw: bytes, compressed: bool = True
) -> list[list[tuple]]:
    """decode_read_response + native histograms: per-query lists of
    (labels, samples, histograms) where histograms are
    (t_ms, nativehist-shaped dict) pairs decoded from prompb.Histogram
    (the v1 field numbering)."""
    buf = snappy_decompress(raw) if compressed else raw
    out = []
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 2:
            series = []
            for f2, wt2, p2 in _fields(payload):
                if f2 == 1 and wt2 == 2:
                    series.append(
                        _decode_timeseries(p2, with_histograms=True)
                    )
            out.append(series)
    return out


def push_remote_write(
    db,
    url: str,
    mint: int,
    maxt: int,
    matchers=None,
    batch_series: int = 500,
    timeout_s: float = 30.0,
) -> int:
    """Act as a remote-write SENDER: read [mint, maxt] (optionally
    matcher-filtered) from a store and POST it to another instance's
    /api/v1/write in sender-style batches. The migration/forwarding
    story — this engine's store drains into an upstream Prometheus (or
    another instance of this engine) over the standard wire protocol.
    Returns the number of samples sent.

    The read collects to the driver (it IS the client here, like every
    HTTP serving path); windows larger than driver memory should be
    pushed in multiple [mint, maxt) slices."""
    rows = (
        db.querier(mint, maxt)
        .select(matchers or [])
        .select("labels", "t", "v")
        .collect()
    )
    by: dict[tuple, tuple[dict, list]] = {}
    for r in rows:
        lab = dict(r["labels"])
        by.setdefault(tuple(sorted(lab.items())), (lab, []))[1].append(
            (r["t"], r["v"])
        )
    series = [(lab, sorted(samps)) for lab, samps in (by[k] for k in sorted(by))]
    return _post_series_batches(url, series, batch_series, timeout_s)


def _post_series_batches(
    url: str, series: list, batch_series: int, timeout_s: float,
    http_config=None,
) -> int:
    """POST v1 WriteRequest bodies in sender-style batches. `series` is
    [(labels_dict, [(t, v), ...])]. Returns samples sent; raises OSError
    on a non-2xx (the caller's retry unit is the whole pass).
    `http_config` (httpauth.HTTPClientConfig) attaches the endpoint's
    basic_auth / authorization headers + tls_config context."""
    import urllib.request

    sent = 0
    for i in range(0, len(series), batch_series):
        chunk = series[i : i + batch_series]
        req = urllib.request.Request(
            url,
            data=encode_write_request(chunk),
            headers={
                "Content-Encoding": "snappy",
                "Content-Type": "application/x-protobuf",
                "X-Prometheus-Remote-Write-Version": "0.1.0",
                **(http_config.headers() if http_config else {}),
            },
        )
        with urllib.request.urlopen(
            req, timeout=timeout_s,
            context=http_config.ssl_context() if http_config else None,
        ) as resp:
            if not 200 <= resp.status < 300:
                raise OSError(f"remote write rejected: HTTP {resp.status}")
        sent += sum(len(s) for _, s in chunk)
    return sent


def push_remote_write_v2(
    db,
    url: str,
    mint: int,
    maxt: int,
    matchers=None,
    batch_series: int = 500,
    timeout_s: float = 30.0,
) -> int:
    """Act as a Remote-Write 2.0 SENDER: drain [mint, maxt] floats AND
    native histograms from a store into another instance's /api/v1/write
    with the rw2 content type — the migration path that carries the
    sample type the 1.0 sender (push_remote_write) cannot. Returns
    samples + histogram samples sent. Driver-side collect bounded the
    same way as push_remote_write (slice large windows)."""
    rows = (
        db.querier(mint, maxt)
        .select(matchers or [])
        .select("labels", "t", "v")
        .collect()
    )
    by: dict[tuple, dict] = {}
    for r in rows:
        lab = dict(r["labels"])
        e = by.setdefault(
            tuple(sorted(lab.items())),
            {"labels": lab, "samples": [], "histograms": []},
        )
        e["samples"].append((r["t"], r["v"]))
    for r in db.hist_frame(mint, maxt, matchers).collect():
        lab = dict(r["labels"])
        h = r["h"]
        e = by.setdefault(
            tuple(sorted(lab.items())),
            {"labels": lab, "samples": [], "histograms": []},
        )
        e["histograms"].append(
            (
                r["t"],
                {
                    "count": h["count"],
                    "sum": h["sum"],
                    "zero_count": h["zero_count"],
                    "schema": h["schema"],
                    "buckets": [(b["idx"], b["c"]) for b in h["buckets"]],
                    "custom_values": (
                        list(h["custom_values"])
                        if h["custom_values"] is not None else None
                    ),
                },
            )
        )
    series = []
    for k in sorted(by):
        e = by[k]
        e["samples"].sort()
        e["histograms"].sort(key=lambda x: x[0])
        series.append(e)
    return _post_series_batches_v2(url, series, batch_series, timeout_s)


def _post_series_batches_v2(
    url: str, series: list, batch_series: int, timeout_s: float,
    http_config=None,
) -> int:
    """POST rw2 bodies in sender-style batches. `series` is
    [{"labels", "samples", "histograms"}]. Returns sample + histogram
    entries sent; raises OSError on a non-2xx. `http_config` as in
    _post_series_batches."""
    import urllib.request

    sent = 0
    for i in range(0, len(series), batch_series):
        chunk = series[i : i + batch_series]
        req = urllib.request.Request(
            url,
            data=encode_write_request_v2(chunk),
            headers={
                "Content-Encoding": "snappy",
                "Content-Type": "application/x-protobuf;"
                "proto=io.prometheus.write.v2.Request",
                "X-Prometheus-Remote-Write-Version": "2.0.0",
                **(http_config.headers() if http_config else {}),
            },
        )
        with urllib.request.urlopen(
            req, timeout=timeout_s,
            context=http_config.ssl_context() if http_config else None,
        ) as resp:
            if not 200 <= resp.status < 300:
                raise OSError(f"remote write rejected: HTTP {resp.status}")
        sent += sum(
            len(e["samples"]) + len(e["histograms"]) for e in chunk
        )
    return sent


# ------------------------------------------------------- Spark bridges

_ROW_SCHEMA = "labels MAP<STRING,STRING>, t LONG, v DOUBLE"


def remote_write_df(spark, raw: bytes, compressed: bool = True):
    """One POST body → an appendable (labels, t, v) DataFrame."""
    rows = [
        (labels, t, float(v))
        for labels, samples in decode_write_request(raw, compressed)
        for t, v in samples
    ]
    return spark.createDataFrame(rows, _ROW_SCHEMA)


def backfill_remote_write(spark, path: str):
    """Bulk decode a directory/glob of archived WriteRequest payload
    files as ONE distributed scan: binaryFile source (one file per row,
    content as binary) → Arrow-batched mapInPandas decode. The decode is
    necessarily Python (it is a byte-format parser) but runs inside
    executor Arrow batches — no driver loop, no collect."""
    import pandas as pd  # noqa: PLC0415 — executor-side import pattern

    files = spark.read.format("binaryFile").load(path).select("content")

    def _decode(batches):
        for pdf in batches:
            labels_out, t_out, v_out = [], [], []
            for raw in pdf["content"]:
                for labels, samples in decode_write_request(bytes(raw)):
                    for t, v in samples:
                        labels_out.append(labels)
                        t_out.append(t)
                        v_out.append(float(v))
            yield pd.DataFrame({"labels": labels_out, "t": t_out, "v": v_out})

    return files.mapInPandas(_decode, _ROW_SCHEMA)


# ------------------------------------------- Remote-Write 2.0 (rw2)
#
# io.prometheus.write.v2.Request (prometheus 3.x; public spec at
# prometheus.io/docs/specs/remote_write_spec_2_0 and
# prompb/io/prometheus/write/v2/types.proto). One message per POST,
# with an interned symbol table — every label name/value is a uint32
# ref into `symbols` (symbols[0] MUST be the empty string) — carrying
# samples, NATIVE HISTOGRAMS, exemplars, and metadata:
#
#   Request    { repeated string symbols = 4;
#                repeated TimeSeries timeseries = 5; }   # 1-3 reserved
#   TimeSeries { repeated uint32 labels_refs = 1;        # packed, even
#                repeated Sample samples = 2;
#                repeated Histogram histograms = 3;
#                repeated Exemplar exemplars = 4;
#                Metadata metadata = 5;
#                int64 created_timestamp = 6; }
#   Sample     { double value = 1; int64 timestamp = 2; }
#   Exemplar   { repeated uint32 labels_refs = 1; double value = 2;
#                int64 timestamp = 3; }
#   Metadata   { enum Type type = 1; uint32 help_ref = 3;
#                uint32 unit_ref = 4; }
#   Histogram  { oneof: uint64 count_int = 1 / double count_float = 2;
#                double sum = 3; sint32 schema = 4 (zigzag);
#                double zero_threshold = 5;
#                oneof: uint64 zero_count_int = 6 /
#                       double zero_count_float = 7;
#                repeated BucketSpan negative_spans = 8;
#                repeated sint64 negative_deltas = 9 (packed zigzag);
#                repeated double negative_counts = 10 (packed);
#                repeated BucketSpan positive_spans = 11;
#                repeated sint64 positive_deltas = 12;
#                repeated double positive_counts = 13;
#                ResetHint reset_hint = 14; int64 timestamp = 15; }
#   BucketSpan { sint32 offset = 1 (zigzag); uint32 length = 2; }
#
# The span+delta layout exists to compress the WIRE format; decode
# expands it to this engine's sparse sorted (idx, count) bucket array
# (nativehist.HIST_TYPE). Mapping notes, per the engine's documented
# histogram subset (nativehist.py module docstring):
#  - negative-side buckets fold into zero_count — the same "samples
#    <= 0 land in the zero bucket" rule the engine's own construction
#    applies; zero_threshold and reset_hint are dropped on decode;
#  - counts are DOUBLE internally, so the ENCODER always emits the
#    float-histogram form (count_float / zero_count_float /
#    positive_counts) — lossless for this model, and a form every
#    conforming receiver must accept.


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _packed_uvarints(payload: bytes) -> list[int]:
    out, i = [], 0
    while i < len(payload):
        v, i = _uvarint(payload, i)
        out.append(v)
    return out


def _packed_doubles(payload: bytes) -> list[float]:
    if len(payload) % 8:
        raise ValueError("packed double payload not a multiple of 8")
    return list(struct.unpack(f"<{len(payload) // 8}d", payload))


def _decode_span(buf: bytes) -> tuple[int, int]:
    off = length = 0
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 0:
            off = _unzigzag(payload)
        elif field == 2 and wt == 0:
            length = payload
    return off, length


def _spans_to_buckets(spans, values, is_delta) -> list[tuple[int, float]]:
    """Expand (offset, length) spans + per-bucket values into sparse
    (idx, count) pairs. Span offsets are gaps: the first is the
    starting index, later ones the gap past the previous span's end
    (model/histogram generic.go baseBucketIterator). Int histograms
    carry DELTAS (each bucket's count = previous + delta); float
    histograms carry absolute counts."""
    out: list[tuple[int, float]] = []
    idx = 0
    count = 0.0
    k = 0
    for off, length in spans:
        idx += off
        for _ in range(length):
            if k >= len(values):
                raise ValueError("histogram spans exceed bucket values")
            count = count + values[k] if is_delta else values[k]
            k += 1
            out.append((idx, float(count)))
            idx += 1
    if k != len(values):
        raise ValueError("histogram bucket values exceed spans")
    return out


def _decode_histogram_v2(buf: bytes) -> tuple[int, dict]:
    """One wire Histogram → (t_ms, h) with h in the engine's
    nativehist shape {count, sum, zero_count, schema, buckets}."""
    count = zero_count = 0.0
    hsum = 0.0
    schema = 0
    t = 0
    neg_spans: list[tuple[int, int]] = []
    pos_spans: list[tuple[int, int]] = []
    neg_vals: list[float] = []
    pos_vals: list[float] = []
    neg_delta = pos_delta = False
    custom_values: list[float] = []
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 0:
            count = float(payload)
        elif field == 2 and wt == 1:
            count = struct.unpack("<d", payload)[0]
        elif field == 3 and wt == 1:
            hsum = struct.unpack("<d", payload)[0]
        elif field == 4 and wt == 0:
            schema = _unzigzag(payload)
        elif field == 6 and wt == 0:
            zero_count = float(payload)
        elif field == 7 and wt == 1:
            zero_count = struct.unpack("<d", payload)[0]
        elif field == 8 and wt == 2:
            neg_spans.append(_decode_span(payload))
        elif field == 9 and wt == 2:
            neg_vals = [_unzigzag(u) for u in _packed_uvarints(payload)]
            neg_delta = True
        elif field == 9 and wt == 0:  # unpacked fallback
            neg_vals.append(_unzigzag(payload))
            neg_delta = True
        elif field == 10 and wt == 2:
            neg_vals = _packed_doubles(payload)
            neg_delta = False
        elif field == 11 and wt == 2:
            pos_spans.append(_decode_span(payload))
        elif field == 12 and wt == 2:
            pos_vals = [_unzigzag(u) for u in _packed_uvarints(payload)]
            pos_delta = True
        elif field == 12 and wt == 0:
            pos_vals.append(_unzigzag(payload))
            pos_delta = True
        elif field == 13 and wt == 2:
            pos_vals = _packed_doubles(payload)
            pos_delta = False
        elif field == 15 and wt == 0:
            t = _int64(payload)
        elif field == 16 and wt == 2:
            custom_values = _packed_doubles(payload)
        elif field == 16 and wt == 1:  # unpacked fallback
            custom_values.append(struct.unpack("<d", payload)[0])
        # field 5 zero_threshold / 14 reset_hint: dropped (see notes)
    buckets = _spans_to_buckets(pos_spans, pos_vals, pos_delta)
    neg_total = sum(c for _, c in _spans_to_buckets(neg_spans, neg_vals, neg_delta))
    return t, {
        "count": float(count),
        "sum": float(hsum),
        "zero_count": float(zero_count) + neg_total,
        "schema": int(schema),
        "buckets": buckets,
        "custom_values": custom_values or None,
    }


def _decode_histogram_v1(buf: bytes) -> tuple[int, dict]:
    """One prompb.Histogram (the V1 field numbering: count 1/2,
    zero_count 3/4, sum 5, schema 6, spans/values 8-13, timestamp 15,
    custom_values 16 — writev2 renumbered the scalar fields) →
    (t_ms, h) in the engine's nativehist shape. Shares the span/delta
    expansion with the rw2 decoder; zero_threshold (7) and reset_hint
    (14) drop like the rw2 path."""
    count = zero_count = 0.0
    hsum = 0.0
    schema = 0
    t = 0
    neg_spans: list[tuple[int, int]] = []
    pos_spans: list[tuple[int, int]] = []
    neg_vals: list[float] = []
    pos_vals: list[float] = []
    neg_delta = pos_delta = False
    custom_values: list[float] = []
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 0:
            count = float(payload)
        elif field == 2 and wt == 1:
            count = struct.unpack("<d", payload)[0]
        elif field == 3 and wt == 0:
            zero_count = float(payload)
        elif field == 4 and wt == 1:
            zero_count = struct.unpack("<d", payload)[0]
        elif field == 5 and wt == 1:
            hsum = struct.unpack("<d", payload)[0]
        elif field == 6 and wt == 0:
            schema = _unzigzag(payload)
        elif field == 8 and wt == 2:
            neg_spans.append(_decode_span(payload))
        elif field == 9 and wt == 2:
            neg_vals = [_unzigzag(u) for u in _packed_uvarints(payload)]
            neg_delta = True
        elif field == 9 and wt == 0:  # unpacked fallback
            neg_vals.append(_unzigzag(payload))
            neg_delta = True
        elif field == 10 and wt == 2:
            neg_vals = _packed_doubles(payload)
            neg_delta = False
        elif field == 11 and wt == 2:
            pos_spans.append(_decode_span(payload))
        elif field == 12 and wt == 2:
            pos_vals = [_unzigzag(u) for u in _packed_uvarints(payload)]
            pos_delta = True
        elif field == 12 and wt == 0:
            pos_vals.append(_unzigzag(payload))
            pos_delta = True
        elif field == 13 and wt == 2:
            pos_vals = _packed_doubles(payload)
            pos_delta = False
        elif field == 15 and wt == 0:
            t = _int64(payload)
        elif field == 16 and wt == 2:
            custom_values = _packed_doubles(payload)
        elif field == 16 and wt == 1:  # unpacked fallback
            custom_values.append(struct.unpack("<d", payload)[0])
    buckets = _spans_to_buckets(pos_spans, pos_vals, pos_delta)
    neg_total = sum(c for _, c in _spans_to_buckets(neg_spans, neg_vals, neg_delta))
    return t, {
        "count": float(count),
        "sum": float(hsum),
        "zero_count": float(zero_count) + neg_total,
        "schema": int(schema),
        "buckets": buckets,
        "custom_values": custom_values or None,
    }


def _encode_histogram_v1(t: int, h: dict) -> bytes:
    """nativehist-shaped h → prompb.Histogram bytes (v1 numbering;
    float counts, like the rw2 encoder)."""
    hb = bytearray()
    _put_field(hb, 2, 1, struct.pack("<d", float(h["count"])))
    _put_field(hb, 4, 1, struct.pack("<d", float(h["zero_count"])))
    _put_field(hb, 5, 1, struct.pack("<d", float(h["sum"])))
    _put_field(hb, 6, 0, _zigzag(int(h["schema"])))
    spans, counts = _buckets_to_spans(h["buckets"] or [])
    for off, length in spans:
        sb = bytearray()
        _put_field(sb, 1, 0, _zigzag(off))
        _put_field(sb, 2, 0, length)
        _put_field(hb, 11, 2, bytes(sb))
    if counts:
        _put_field(hb, 13, 2, struct.pack(f"<{len(counts)}d", *counts))
    _put_field(hb, 15, 0, t & ((1 << 64) - 1))
    cv = h.get("custom_values")
    if cv:
        _put_field(hb, 16, 2, struct.pack(f"<{len(cv)}d", *[float(b) for b in cv]))
    return bytes(hb)


def _refs_to_labels(refs: list[int], symbols: list[str]) -> dict[str, str]:
    if len(refs) % 2:
        raise ValueError("labels_refs must have even length")
    out = {}
    for i in range(0, len(refs), 2):
        name, value = symbols[refs[i]], symbols[refs[i + 1]]
        if name and value:  # empty value == absent label (F14 strip)
            out[name] = value
    return out


_METADATA_TYPES = {
    0: "unknown", 1: "counter", 2: "gauge", 3: "histogram",
    4: "gaugehistogram", 5: "summary", 6: "info", 7: "stateset",
}


def decode_write_request_v2(raw: bytes, compressed: bool = True) -> list[dict]:
    """Decode an io.prometheus.write.v2.Request body into
    [{"labels", "samples", "histograms", "exemplars", "metadata"}, ...]
    where histograms are (t_ms, nativehist-shaped dict) pairs and
    exemplars are (exemplar_labels, t_ms, value) like the v1 decoder."""
    buf = snappy_decompress(raw) if compressed else raw
    symbols: list[str] = []
    ts_bufs: list[bytes] = []
    for field, wt, payload in _fields(buf):
        if field == 4 and wt == 2:
            symbols.append(payload.decode("utf-8"))
        elif field == 5 and wt == 2:
            ts_bufs.append(payload)
    if symbols and symbols[0] != "":
        raise ValueError("rw2 symbols[0] must be the empty string")
    out = []
    for ts in ts_bufs:
        labels: dict[str, str] = {}
        samples: list[tuple[int, float]] = []
        histograms: list[tuple[int, dict]] = []
        exemplars: list[tuple[dict[str, str], int, float]] = []
        meta: dict = {}
        for field, wt, payload in _fields(ts):
            if field == 1 and wt == 2:
                labels = _refs_to_labels(_packed_uvarints(payload), symbols)
            elif field == 1 and wt == 0:
                raise ValueError("rw2 labels_refs must be packed")
            elif field == 2 and wt == 2:
                samples.append(_decode_sample(payload))
            elif field == 3 and wt == 2:
                histograms.append(_decode_histogram_v2(payload))
            elif field == 4 and wt == 2:
                ex_refs: list[int] = []
                ex_t, ex_v = 0, 0.0
                for f2, wt2, p2 in _fields(payload):
                    if f2 == 1 and wt2 == 2:
                        ex_refs = _packed_uvarints(p2)
                    elif f2 == 2 and wt2 == 1:
                        ex_v = struct.unpack("<d", p2)[0]
                    elif f2 == 3 and wt2 == 0:
                        ex_t = _int64(p2)
                exemplars.append((_refs_to_labels(ex_refs, symbols), ex_t, ex_v))
            elif field == 5 and wt == 2:
                for f2, wt2, p2 in _fields(payload):
                    if f2 == 1 and wt2 == 0:
                        meta["type"] = _METADATA_TYPES.get(p2, "unknown")
                    elif f2 == 3 and wt2 == 0:
                        meta["help"] = symbols[p2]
                    elif f2 == 4 and wt2 == 0:
                        meta["unit"] = symbols[p2]
        if not labels:
            raise ValueError("rw2 timeseries without labels")
        out.append({
            "labels": labels,
            "samples": samples,
            "histograms": histograms,
            "exemplars": exemplars,
            "metadata": meta,
        })
    return out


def _buckets_to_spans(buckets) -> tuple[list[tuple[int, int]], list[float]]:
    """Sparse sorted (idx, count) pairs → wire (offset, length) spans +
    absolute per-bucket counts (float-histogram form)."""
    spans: list[tuple[int, int]] = []
    counts: list[float] = []
    prev_end = 0
    for idx, c in sorted(buckets):
        if spans and idx == prev_end:
            spans[-1] = (spans[-1][0], spans[-1][1] + 1)
        else:
            spans.append((idx - prev_end, 1))
        counts.append(float(c))
        prev_end = idx + 1
    return spans, counts


def _encode_histogram_v2(t: int, h: dict) -> bytes:
    hb = bytearray()
    _put_field(hb, 2, 1, struct.pack("<d", float(h["count"])))
    _put_field(hb, 3, 1, struct.pack("<d", float(h["sum"])))
    _put_field(hb, 4, 0, _zigzag(int(h["schema"])))
    _put_field(hb, 7, 1, struct.pack("<d", float(h["zero_count"])))
    spans, counts = _buckets_to_spans(h["buckets"] or [])
    for off, length in spans:
        sb = bytearray()
        _put_field(sb, 1, 0, _zigzag(off))
        _put_field(sb, 2, 0, length)
        _put_field(hb, 11, 2, bytes(sb))
    if counts:
        _put_field(hb, 13, 2, struct.pack(f"<{len(counts)}d", *counts))
    _put_field(hb, 15, 0, t & ((1 << 64) - 1))
    cv = h.get("custom_values")
    if cv:
        # NHCB custom bounds (schema -53), repeated double field 16
        _put_field(hb, 16, 2, struct.pack(f"<{len(cv)}d", *[float(b) for b in cv]))
    return bytes(hb)


def encode_write_request_v2(series: Iterable[dict], compressed: bool = True) -> bytes:
    """Encode [{"labels", "samples", "histograms", "exemplars",
    "metadata"}, ...] as an io.prometheus.write.v2.Request body. The
    symbol table is interned across the whole request (ref 0 = "", as
    the spec requires); label pairs are emitted sorted by name."""
    symbols: list[str] = [""]
    interned: dict[str, int] = {"": 0}

    def _ref(s: str) -> int:
        if s not in interned:
            interned[s] = len(symbols)
            symbols.append(s)
        return interned[s]

    ts_bufs: list[bytes] = []
    for entry in series:
        labels = entry["labels"]
        ts = bytearray()
        refs = bytearray()
        for name in sorted(labels):
            _put_uvarint(refs, _ref(name))
            _put_uvarint(refs, _ref(labels[name]))
        _put_field(ts, 1, 2, bytes(refs))
        for t, v in entry.get("samples", ()):
            sb = bytearray()
            _put_field(sb, 1, 1, struct.pack("<d", float(v)))
            _put_field(sb, 2, 0, t & ((1 << 64) - 1))
            _put_field(ts, 2, 2, bytes(sb))
        for t, h in entry.get("histograms", ()):
            _put_field(ts, 3, 2, _encode_histogram_v2(t, h))
        for ex_labels, t, v in entry.get("exemplars", ()):
            eb = bytearray()
            ex_refs = bytearray()
            for name in sorted(ex_labels):
                _put_uvarint(ex_refs, _ref(name))
                _put_uvarint(ex_refs, _ref(ex_labels[name]))
            _put_field(eb, 1, 2, bytes(ex_refs))
            _put_field(eb, 2, 1, struct.pack("<d", float(v)))
            _put_field(eb, 3, 0, t & ((1 << 64) - 1))
            _put_field(ts, 4, 2, bytes(eb))
        meta = entry.get("metadata") or {}
        if meta:
            mb = bytearray()
            codes = {v: k for k, v in _METADATA_TYPES.items()}
            _put_field(mb, 1, 0, codes.get(meta.get("type", "unknown"), 0))
            if "help" in meta:
                _put_field(mb, 3, 0, _ref(meta["help"]))
            if "unit" in meta:
                _put_field(mb, 4, 0, _ref(meta["unit"]))
            _put_field(ts, 5, 2, bytes(mb))
        ts_bufs.append(bytes(ts))
    req = bytearray()
    for s in symbols:
        _put_field(req, 4, 2, s.encode("utf-8"))
    for ts in ts_bufs:
        _put_field(req, 5, 2, ts)
    raw = bytes(req)
    return snappy_compress(raw) if compressed else raw


def backfill_remote_write_v2(spark, path: str):
    """Bulk decode archived Remote-Write 2.0 payload files as ONE
    distributed binaryFile + mapInPandas scan (the rw2 twin of
    backfill_remote_write). Emits a unified frame
    (labels, t, v, h) — float samples carry v with h NULL, native
    histograms carry h with v NULL — so the caller splits once into
    DB.append / DB.append_histograms (persist the result first if both
    splits will be consumed, to avoid re-decoding)."""
    import pandas as pd  # noqa: PLC0415 — executor-side import pattern

    from tsdb_spark.nativehist import HIST_TYPE

    files = spark.read.format("binaryFile").load(path).select("content")
    schema = f"labels MAP<STRING,STRING>, t LONG, v DOUBLE, h {HIST_TYPE}"

    def _decode(batches):
        for pdf in batches:
            labels_out, t_out, v_out, h_out = [], [], [], []
            for raw in pdf["content"]:
                for entry in decode_write_request_v2(bytes(raw)):
                    lab = entry["labels"]
                    for t, v in entry["samples"]:
                        labels_out.append(lab)
                        t_out.append(t)
                        v_out.append(float(v))
                        h_out.append(None)
                    for t, h in entry["histograms"]:
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
