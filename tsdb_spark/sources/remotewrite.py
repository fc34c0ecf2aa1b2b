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
                   repeated Sample samples = 2; }   # 3 exemplars,
                                                    # 4 histograms: skipped
    Label        { string name = 1; string value = 2; }
    Sample       { double value = 1; int64 timestamp = 2; }

Unknown fields are skipped by wire type, so payloads from newer senders
(metadata, exemplars, created-timestamps) decode cleanly.

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
    "backfill_remote_write",
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
    buf: bytes, with_exemplars: bool = False
):
    labels: dict[str, str] = {}
    samples: list[tuple[int, float]] = []
    exemplars: list[tuple[dict[str, str], int, float]] = []
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 2:
            name, value = _decode_label(payload)
            labels[name] = value
        elif field == 2 and wt == 2:
            samples.append(_decode_sample(payload))
        elif field == 3 and wt == 2 and with_exemplars:
            exemplars.append(_decode_exemplar(payload))
        # field 4 (histograms) / 5+ skipped by wire type
    if with_exemplars:
        return labels, samples, exemplars
    return labels, samples


def decode_write_request(
    raw: bytes, compressed: bool = True, with_exemplars: bool = False
):
    """Decode a remote-write body into [(labels, [(t_ms, v), ...]), ...]
    — or, with_exemplars=True, 3-tuples whose last element is
    [(exemplar_labels, t_ms, value), ...] (prompb TimeSeries field 3).
    `compressed=True` (the wire default) snappy-decompresses first."""
    buf = snappy_decompress(raw) if compressed else raw
    out = []
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 2:
            out.append(_decode_timeseries(payload, with_exemplars))
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
    buf = snappy_decompress(raw) if compressed else raw
    out = []
    for field, wt, payload in _fields(buf):
        if field == 1 and wt == 2:
            out.append(_decode_query(payload))
        # field 2 (accepted_response_types, packed enum) skipped: this
        # engine always answers SAMPLES, the type every reader accepts
    return out


def encode_read_request(queries: list[dict], compressed: bool = True) -> bytes:
    """Client-side ReadRequest encoder (tests / this engine acting as a
    remote-read client of another store)."""
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
    raw = bytes(req)
    return snappy_compress(raw) if compressed else raw


def _encode_timeseries(out: bytearray, labels: dict, samples) -> None:
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
        for labels, samples in series_list:
            _encode_timeseries(qr, labels, samples)
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
    import urllib.request

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
            },
        )
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            if not 200 <= resp.status < 300:
                raise OSError(f"remote write rejected: HTTP {resp.status}")
        sent += sum(len(s) for _, s in chunk)
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
