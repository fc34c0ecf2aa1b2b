"""XOR (Gorilla) chunk codec + the STREAMED_XOR_CHUNKS remote-read
wire variant — pure Python from the public specifications.

SURVEY §2.8 maps the reference's XOR chunk encoding (chunkenc/xor.go,
the Gorilla VLDB'15 scheme, documented in docs/format/chunks.md) to
Parquet at REST — Tungsten's columnar encodings do that job in this
engine. This module implements the codec for the WIRE, where the
format is the protocol: remote-read's second response type
(STREAMED_XOR_CHUNKS, storage/remote/codec.go) ships each series as
XOR-compressed chunk payloads inside length-prefixed, CRC32C-framed
ChunkedReadResponse protobuf messages. With it, this engine can answer
streamed-only remote-read clients; the SAMPLES responder (api.py)
remains the default every client accepts.

Chunk data layout (chunkenc/xor.go — all public):

    uint16 big-endian sample count, then a bitstream:
    sample 0:  timestamp as zigzag varint, value as raw 64 bits
    sample 1:  t-delta as uvarint, value XOR-encoded (below)
    sample n:  delta-of-delta bucketed
                 '0'                      dod == 0
                 '10'  + 14-bit signed    dod in [-8191, 8192]
                 '110' + 17-bit signed    dod in [-65535, 65536]
                 '1110'+ 20-bit signed    dod in [-524287, 524288]
                 '1111'+ 64-bit raw       otherwise
    value XOR vs previous value:
                 '0'                      xor == 0
                 '1' '0' + meaningful bits   (reusing previous
                                              leading/trailing window)
                 '1' '1' + 5-bit leading + 6-bit sigbit count
                         + that many bits (new window; leading
                           clamped to 31 so it fits 5 bits)

Stream framing (storage/remote ChunkedWriter): every
ChunkedReadResponse message is sent as uvarint(len) + 4-byte
big-endian CRC32C (Castagnoli) of the message + the message bytes; no
HTTP-level snappy (the chunks are already compressed), Content-Type
`application/x-streamed-protobuf; proto=prometheus.ChunkedReadResponse`.

    ChunkedReadResponse { repeated ChunkedSeries chunked_series = 1;
                          int64 query_index = 2; }
    ChunkedSeries       { repeated Label labels = 1;
                          repeated Chunk chunks = 2; }
    Chunk               { int64 min_time_ms = 1; int64 max_time_ms = 2;
                          Type type = 3;   # XOR = 1
                          bytes data = 4; }

Scale shape: serving is a driver/HTTP concern like every api.py route
(the SELECT feeding it is the pruned distributed plan); encode cost is
per-response-window, client-bounded.
"""

from __future__ import annotations

import struct

from tsdb_spark.sources.remotewrite import (
    _fields,
    _int64,
    _put_field,
    _put_uvarint,
    _uvarint,
)

__all__ = [
    "encode_xor_chunk",
    "decode_xor_chunk",
    "encode_chunked_read_response",
    "decode_chunked_read_response",
    "crc32c",
    "CONTENT_TYPE_STREAMED",
]

CONTENT_TYPE_STREAMED = (
    "application/x-streamed-protobuf; proto=prometheus.ChunkedReadResponse"
)

# chunkenc.DefaultChunkSize geometry: upstream cuts chunks at 120
# samples (head.go appender); the encoder below follows the same cut
SAMPLES_PER_CHUNK = 120


# ------------------------------------------------------------ crc32c


def _crc32c_table() -> list[int]:
    poly = 0x82F63B78  # Castagnoli, reflected
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_CRC_TABLE = _crc32c_table()


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _CRC_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


# -------------------------------------------------------- bit streams


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._nbits = 0  # bits used in the last byte

    def write_bit(self, bit: int) -> None:
        if self._nbits == 0:
            self.buf.append(0)
            self._nbits = 8
        self._nbits -= 1
        if bit:
            self.buf[-1] |= 1 << self._nbits

    def write_bits(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.write_bit((value >> i) & 1)

    def write_byte(self, b: int) -> None:
        self.write_bits(b, 8)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte = self.data[self.pos >> 3]
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.read_bit()
        return v

    def read_varint_bytes(self) -> int:
        """uvarint read byte-aligned-agnostically (bit-by-bit bytes)."""
        shift = 0
        out = 0
        while True:
            b = self.read_bits(8)
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 63:
                raise ValueError("varint exceeds 64 bits")


def _zigzag64(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1)


def _unzigzag64(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


# ----------------------------------------------------- chunk en/decode


def encode_xor_chunk(samples: list[tuple[int, float]]) -> bytes:
    """[(t_ms, v), ...] (time-sorted) → XOR chunk data bytes
    (chunkenc XORChunk.Bytes(): uint16 count header + bitstream)."""
    if len(samples) > 0xFFFF:
        raise ValueError("chunk exceeds uint16 sample count")
    w = _BitWriter()
    prev_t = prev_delta = 0
    prev_bits = 0
    leading = 0xFF  # sentinel: no window yet
    trailing = 0
    for i, (t, v) in enumerate(samples):
        vbits = struct.unpack("<Q", struct.pack("<d", v))[0]
        if i == 0:
            # zigzag varint timestamp, raw 64-bit value
            z = _zigzag64(t)
            while z > 0x7F:
                w.write_byte((z & 0x7F) | 0x80)
                z >>= 7
            w.write_byte(z)
            w.write_bits(vbits, 64)
        elif i == 1:
            delta = t - prev_t
            if delta < 0:
                raise ValueError("samples must be time-sorted")
            d = delta
            while d > 0x7F:
                w.write_byte((d & 0x7F) | 0x80)
                d >>= 7
            w.write_byte(d)
            leading, trailing = _xor_write(
                w, vbits, prev_bits, leading, trailing
            )
            prev_delta = delta
        else:
            delta = t - prev_t
            if delta < 0:
                raise ValueError("samples must be time-sorted")
            dod = delta - prev_delta
            if dod == 0:
                w.write_bit(0)
            elif -8191 <= dod <= 8192:
                w.write_bits(0b10, 2)
                w.write_bits(dod & ((1 << 14) - 1), 14)
            elif -65535 <= dod <= 65536:
                w.write_bits(0b110, 3)
                w.write_bits(dod & ((1 << 17) - 1), 17)
            elif -524287 <= dod <= 524288:
                w.write_bits(0b1110, 4)
                w.write_bits(dod & ((1 << 20) - 1), 20)
            else:
                w.write_bits(0b1111, 4)
                w.write_bits(dod & ((1 << 64) - 1), 64)
            leading, trailing = _xor_write(
                w, vbits, prev_bits, leading, trailing
            )
            prev_delta = delta
        prev_t, prev_bits = t, vbits
    return struct.pack(">H", len(samples)) + bytes(w.buf)


def _xor_write(
    w: _BitWriter, vbits: int, prev_bits: int, leading: int, trailing: int
) -> tuple[int, int]:
    """Gorilla value write (chunkenc/xor.go xorWrite); returns the new
    (leading, trailing) window."""
    xor = vbits ^ prev_bits
    if xor == 0:
        w.write_bit(0)
        return leading, trailing
    w.write_bit(1)
    new_leading = _clz64(xor)
    new_trailing = _ctz64(xor)
    if new_leading >= 32:
        new_leading = 31  # clamp so it fits the 5-bit field
    if (
        leading != 0xFF
        and new_leading >= leading
        and new_trailing >= trailing
    ):
        w.write_bit(0)
        w.write_bits(xor >> trailing, 64 - leading - trailing)
        return leading, trailing
    w.write_bit(1)
    w.write_bits(new_leading, 5)
    sigbits = 64 - new_leading - new_trailing
    w.write_bits(sigbits, 6)
    w.write_bits(xor >> new_trailing, sigbits)
    return new_leading, new_trailing


def _clz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _ctz64(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


def decode_xor_chunk(data: bytes) -> list[tuple[int, float]]:
    """XOR chunk data bytes → [(t_ms, v), ...]."""
    (count,) = struct.unpack(">H", data[:2])
    r = _BitReader(data[2:])
    out: list[tuple[int, float]] = []
    t = delta = 0
    vbits = 0
    leading = trailing = 0
    for i in range(count):
        if i == 0:
            t = _unzigzag64(r.read_varint_bytes())
            vbits = r.read_bits(64)
        elif i == 1:
            delta = r.read_varint_bytes()
            t += delta
            vbits, leading, trailing = _xor_read(r, vbits, leading, trailing)
        else:
            if r.read_bit() == 0:
                dod = 0
            elif r.read_bit() == 0:
                dod = _signed(r.read_bits(14), 14)
            elif r.read_bit() == 0:
                dod = _signed(r.read_bits(17), 17)
            elif r.read_bit() == 0:
                dod = _signed(r.read_bits(20), 20)
            else:
                dod = _signed(r.read_bits(64), 64)
            delta += dod
            t += delta
            vbits, leading, trailing = _xor_read(r, vbits, leading, trailing)
        out.append((t, struct.unpack("<d", struct.pack("<Q", vbits))[0]))
    return out


def _signed(bits: int, n: int) -> int:
    """Sign-reconstruct an n-bit field the way xor.go's iterator does:
    the bucketed sizes (14/17/20) use a STRICTLY-greater comparison —
    the value 1<<(n-1) itself stays positive, the buckets are
    asymmetric — while the 64-bit escape is plain `int64(bits)`
    two's complement."""
    if n == 64:
        return bits - (1 << 64) if bits >= (1 << 63) else bits
    if bits > (1 << (n - 1)):
        bits -= 1 << n
    return bits


def _xor_read(
    r: _BitReader, prev_bits: int, leading: int, trailing: int
) -> tuple[int, int, int]:
    if r.read_bit() == 0:
        return prev_bits, leading, trailing
    if r.read_bit():
        leading = r.read_bits(5)
        sigbits = r.read_bits(6)
        if sigbits == 0:
            sigbits = 64  # 6-bit overflow convention (xor.go)
        trailing = 64 - leading - sigbits
    sigbits = 64 - leading - trailing
    xor = r.read_bits(sigbits) << trailing
    return prev_bits ^ xor, leading, trailing


# ---------------------------------------- ChunkedReadResponse framing


def _encode_chunked_series(labels: dict, samples: list[tuple[int, float]]):
    cs = bytearray()
    for name in sorted(labels):
        lb = bytearray()
        _put_field(lb, 1, 2, name.encode("utf-8"))
        _put_field(lb, 2, 2, labels[name].encode("utf-8"))
        _put_field(cs, 1, 2, bytes(lb))
    for i in range(0, len(samples), SAMPLES_PER_CHUNK):
        part = samples[i : i + SAMPLES_PER_CHUNK]
        ck = bytearray()
        _put_field(ck, 1, 0, part[0][0] & ((1 << 64) - 1))
        _put_field(ck, 2, 0, part[-1][0] & ((1 << 64) - 1))
        _put_field(ck, 3, 0, 1)  # Chunk.Type XOR
        _put_field(ck, 4, 2, encode_xor_chunk(part))
        _put_field(cs, 2, 2, bytes(ck))
    return bytes(cs)


def encode_chunked_read_response(
    results: list[list[tuple[dict[str, str], list[tuple[int, float]]]]],
) -> bytes:
    """[[(labels, [(t, v)...])...] per query] → the framed stream:
    one ChunkedReadResponse frame per series (upstream streams a frame
    per series batch), each uvarint-length-prefixed and CRC32C-tagged
    (storage/remote ChunkedWriter)."""
    out = bytearray()
    for qidx, series_list in enumerate(results):
        for labels, samples in series_list:
            msg = bytearray()
            _put_field(msg, 1, 2, _encode_chunked_series(labels, samples))
            _put_field(msg, 2, 0, qidx)
            frame = bytes(msg)
            _put_uvarint(out, len(frame))
            out += struct.pack(">I", crc32c(frame))
            out += frame
    return bytes(out)


def decode_chunked_read_response(
    raw: bytes,
) -> list[list[tuple[dict[str, str], list[tuple[int, float]]]]]:
    """The framed stream → per-query series lists (the client side —
    what this engine uses to read from a streamed-only responder, and
    what the tests roundtrip through)."""
    by_query: dict[int, dict[tuple, tuple[dict, list]]] = {}
    i = 0
    while i < len(raw):
        ln, i = _uvarint(raw, i)
        (crc,) = struct.unpack(">I", raw[i : i + 4])
        i += 4
        frame = raw[i : i + ln]
        i += ln
        if crc32c(frame) != crc:
            raise ValueError("chunked read frame CRC mismatch")
        qidx = 0
        series = []
        for field, wt, payload in _fields(frame):
            if field == 1 and wt == 2:
                labels: dict[str, str] = {}
                samples: list[tuple[int, float]] = []
                for f2, wt2, p2 in _fields(payload):
                    if f2 == 1 and wt2 == 2:
                        name = value = ""
                        for f3, wt3, p3 in _fields(p2):
                            if f3 == 1 and wt3 == 2:
                                name = p3.decode("utf-8")
                            elif f3 == 2 and wt3 == 2:
                                value = p3.decode("utf-8")
                        labels[name] = value
                    elif f2 == 2 and wt2 == 2:
                        ctype, cdata = None, b""
                        for f3, wt3, p3 in _fields(p2):
                            if f3 == 3 and wt3 == 0:
                                ctype = p3
                            elif f3 == 4 and wt3 == 2:
                                cdata = p3
                        if ctype not in (None, 1):
                            raise ValueError(
                                f"unsupported chunk type {ctype}"
                            )
                        samples.extend(decode_xor_chunk(cdata))
                series.append((labels, samples))
            elif field == 2 and wt == 0:
                qidx = _int64(payload)
        slot = by_query.setdefault(qidx, {})
        for labels, samples in series:
            key = tuple(sorted(labels.items()))
            slot.setdefault(key, (labels, []))[1].extend(samples)
    n_q = (max(by_query) + 1) if by_query else 0
    return [
        [by_query.get(q, {})[k] for k in sorted(by_query.get(q, {}))]
        for q in range(n_q)
    ]
