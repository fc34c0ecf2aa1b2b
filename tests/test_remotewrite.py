"""Remote-write wire protocol (prompb WriteRequest over snappy block
format), both codecs implemented from the public specs — protobuf wire
encoding and github.com/google/snappy format_description.txt."""

import math
import random
import struct
import threading
import urllib.request

import pytest

from tsdb_spark import DB
from tsdb_spark.sources.remotewrite import (
    backfill_remote_write,
    decode_read_request,
    decode_read_response,
    decode_write_request,
    encode_read_request,
    encode_read_response,
    encode_write_request,
    remote_write_df,
    snappy_compress,
    snappy_decompress,
)

WIDTH = 3_600_000


# ------------------------------------------------------------- snappy


def test_snappy_literal_roundtrip():
    rng = random.Random(7)
    for n in (0, 1, 59, 60, 61, 255, 256, 65535, 65536, 200_000):
        data = bytes(rng.getrandbits(8) for _ in range(min(n, 4096))) * (
            max(n // 4096, 1)
        )
        data = data[:n]
        assert snappy_decompress(snappy_compress(data)) == data


def test_snappy_copy1_overlapping_rle():
    # "a" * 10 as: literal "a", then copy-1 (len 9, offset 1) — the
    # overlapping back-reference must expand byte-at-a-time
    stream = b"\x0a" + b"\x00a" + bytes([(5 << 2) | 1, 0x01])
    assert snappy_decompress(stream) == b"a" * 10


def test_snappy_copy2_disjoint():
    # "abcd" + copy-2 (len 12, offset 4) -> "abcd" * 4
    stream = b"\x10" + b"\x0cabcd" + bytes([(11 << 2) | 2]) + b"\x04\x00"
    assert snappy_decompress(stream) == b"abcd" * 4


def test_snappy_copy4():
    stream = b"\x08" + b"\x0cabcd" + bytes([(3 << 2) | 3]) + b"\x04\x00\x00\x00"
    assert snappy_decompress(stream) == b"abcdabcd"


def test_snappy_length_mismatch_rejected():
    with pytest.raises(ValueError):
        snappy_decompress(b"\x05\x00a")  # claims 5, delivers 1
    with pytest.raises(ValueError):
        snappy_decompress(b"\x02" + bytes([(5 << 2) | 1, 0x01]))  # copy first


# ----------------------------------------------------------- protobuf


SERIES = [
    (
        {"__name__": "http_requests_total", "job": "api", "instance": "i-1"},
        [(0, 1.0), (15_000, 2.5), (30_000, 3.25)],
    ),
    ({"__name__": "μ_metric", "väl": "ü"}, [(1_000, -7.75)]),
    ({"__name__": "edge"}, [(2_000, float("inf")), (3_000, float("-inf"))]),
]


def test_write_request_roundtrip():
    body = encode_write_request(SERIES)
    got = decode_write_request(body)
    assert len(got) == 3
    for (labels, samples), (glabels, gsamples) in zip(SERIES, got):
        assert glabels == labels
        assert gsamples == list(samples)


def test_write_request_nan_and_negative_time():
    body = encode_write_request([({"n": "x"}, [(-60_000, float("nan"))])])
    [(labels, samples)] = decode_write_request(body)
    assert labels == {"n": "x"}
    assert samples[0][0] == -60_000
    assert math.isnan(samples[0][1])


def test_unknown_fields_skipped():
    # splice unknown fields into a TimeSeries: a varint (field 7), a
    # fixed64 (field 8), and a length-delimited blob (field 3, the real
    # exemplars slot) — the decoder must skip all by wire type
    label = b"\x0a\x01n\x12\x01v"  # Label{name:"n", value:"v"}
    sample = b"\x09" + struct.pack("<d", 4.5) + b"\x10\x64"  # v=4.5 t=100
    ts = (
        b"\x0a" + bytes([len(label)]) + label
        + b"\x38\x2a"  # field 7 varint 42
        + b"\x41" + b"\x00" * 8  # field 8 fixed64
        + b"\x1a\x03abc"  # field 3 length-delimited (exemplars blob)
        + b"\x12" + bytes([len(sample)]) + sample
    )
    req = b"\x0a" + bytes([len(ts)]) + ts
    got = decode_write_request(snappy_compress(req))
    assert got == [({"n": "v"}, [(100, 4.5)])]


# -------------------------------------------------------- spark bridge


def test_remote_write_append_readback(spark, tmp_path):
    from tsdb_spark.labels import eq

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    body = encode_write_request(SERIES)
    df = remote_write_df(spark, body)
    db.append(df)
    rows = (
        db.querier(0, 10**9)
        .select([eq("job", "api")])
        .select("t", "v")
        .orderBy("t")
        .collect()
    )
    assert [(r["t"], r["v"]) for r in rows] == [(0, 1.0), (15_000, 2.5), (30_000, 3.25)]
    # unicode label names survive the wire + the store roundtrip
    got = db.querier(0, 10**9).select([eq("väl", "ü")]).select("v").collect()
    assert [r["v"] for r in got] == [-7.75]


def test_backfill_remote_write_distributed(spark, tmp_path):
    d = tmp_path / "payloads"
    d.mkdir()
    for i in range(3):
        series = [
            ({"__name__": "bulk", "shard": str(i)}, [(j * 1000, float(i * 10 + j)) for j in range(5)])
        ]
        (d / f"p{i}.bin").write_bytes(encode_write_request(series))
    df = backfill_remote_write(spark, str(d))
    assert df.count() == 15
    total = df.groupBy().sum("v").collect()[0][0]
    assert total == sum(i * 10 + j for i in range(3) for j in range(5))


def test_http_write_route(spark, tmp_path):
    from tsdb_spark.api import query, serve

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    srv = serve(db, "127.0.0.1", 0)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        body = encode_write_request(
            [({"__name__": "wired", "src": "rw"}, [(60_000, 9.5)])]
        )
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/write",
            data=body,
            headers={
                "Content-Encoding": "snappy",
                "Content-Type": "application/x-protobuf",
                "X-Prometheus-Remote-Write-Version": "0.1.0",
            },
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 204
        out = query(db, "wired", 60_000)
        assert out["data"]["result"][0]["value"][1] == "9.5"
        # malformed body → 400, not a crash
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/write", data=b"\xff\xff\xff"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 400
    finally:
        srv.shutdown()


# --------------------------------------------------------- remote read


def test_read_request_roundtrip():
    qs = [
        {"start": 0, "end": 3_600_000,
         "matchers": [("=", "__name__", "m"), ("=~", "job", "a|b"),
                      ("!=", "x", "y"), ("!~", "z", "w.*")]},
        {"start": -5, "end": 10, "matchers": []},
    ]
    got = decode_read_request(encode_read_request(qs))
    assert got == qs


def test_read_response_roundtrip():
    results = [
        [({"__name__": "m", "s": "a"}, [(0, 1.5), (60_000, 2.5)]),
         ({"__name__": "m", "s": "b"}, [(0, -3.0)])],
        [],
    ]
    got = decode_read_response(encode_read_response(results))
    assert got == results


def test_remote_read_api(spark, tmp_path):
    from tsdb_spark.api import remote_read

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    rows = []
    for s in ("a", "b"):
        for i in range(5):
            rows.append(({"__name__": "m", "s": s}, i * 60_000, float(i)))
    rows.append(({"__name__": "other"}, 0, 99.0))
    db.append(spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))

    req = encode_read_request([
        {"start": 0, "end": 10**7,
         "matchers": [("=", "__name__", "m"), ("=", "s", "a")]},
        {"start": 60_000, "end": 120_000, "matchers": [("=~", "s", ".+")]},
    ])
    out = decode_read_response(remote_read(db, req))
    assert len(out) == 2
    [(lab, samples)] = out[0]
    assert lab == {"__name__": "m", "s": "a"}
    assert samples == [(i * 60_000, float(i)) for i in range(5)]
    # second query: both series clipped to [60s, 120s]
    assert sorted(l["s"] for l, _ in out[1]) == ["a", "b"]
    for _, samps in out[1]:
        assert samps == [(60_000, 1.0), (120_000, 2.0)]


def test_http_read_route(spark, tmp_path):
    from tsdb_spark.api import serve

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    db.append(spark.createDataFrame(
        [({"__name__": "m"}, 0, 7.5)],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))
    srv = serve(db, "127.0.0.1", 0)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/read",
            data=encode_read_request(
                [{"start": 0, "end": 10, "matchers": [("=", "__name__", "m")]}]
            ),
            headers={"Content-Type": "application/x-protobuf",
                     "Content-Encoding": "snappy"},
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Encoding"] == "snappy"
            body = resp.read()
        assert decode_read_response(body) == [[({"__name__": "m"}, [(0, 7.5)])]]
    finally:
        srv.shutdown()


def test_write_request_exemplars(spark, tmp_path):
    """Exemplars on the wire (prompb TimeSeries field 3) land in the
    exemplar side table; plain decode keeps its 2-tuple shape."""
    from tsdb_spark.api import query_exemplars, remote_write

    series = [(
        {"__name__": "m", "job": "api"},
        [(60_000, 1.5)],
        [({"trace_id": "abc123"}, 60_000, 1.5),
         ({"trace_id": "def456"}, 120_000, 2.25)],
    )]
    body = encode_write_request(series)
    # decode without exemplars: 2-tuples, exemplars skipped by wire type
    assert decode_write_request(body) == [({"__name__": "m", "job": "api"},
                                           [(60_000, 1.5)])]
    got = decode_write_request(body, with_exemplars=True)
    assert got[0][2] == [({"trace_id": "abc123"}, 60_000, 1.5),
                         ({"trace_id": "def456"}, 120_000, 2.25)]

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    assert remote_write(db, body) == 1
    resp = query_exemplars(db, "m", 0, 10**7)
    [entry] = resp["data"]
    exs = sorted(e["labels"]["trace_id"] for e in entry["exemplars"])
    assert exs == ["abc123", "def456"]


def test_push_remote_write_between_stores(spark, tmp_path):
    """The engine as remote-write SENDER: store A drains into store B
    over a live /api/v1/write endpoint (migration/forwarding)."""
    from tsdb_spark.api import serve
    from tsdb_spark.labels import eq
    from tsdb_spark.sources.remotewrite import push_remote_write

    src = DB.create(spark, str(tmp_path / "a"), block_width_ms=WIDTH)
    rows = []
    for s in ("x", "y"):
        for i in range(6):
            rows.append(({"__name__": "m", "s": s}, i * 60_000, float(i * 2)))
    src.append(spark.createDataFrame(
        rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))

    dst = DB.create(spark, str(tmp_path / "b"), block_width_ms=WIDTH)
    srv = serve(dst, "127.0.0.1", 0)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        n = push_remote_write(
            src, f"http://127.0.0.1:{port}/api/v1/write",
            0, 10**7, batch_series=1,  # force multiple POSTs
        )
        assert n == 12
        got = sorted(
            (r["labels"]["s"], r["t"], r["v"])
            for r in dst.querier(0, 10**7).select([eq("__name__", "m")])
            .select("labels", "t", "v").collect()
        )
        want = sorted((s, i * 60_000, float(i * 2))
                      for s in ("x", "y") for i in range(6))
        assert got == want
    finally:
        srv.shutdown()


# ------------------------------------------------ Remote-Write 2.0


RW2_SERIES = [
    {
        "labels": {"__name__": "rw2_float", "job": "api"},
        "samples": [(0, 1.0), (15_000, 2.5)],
        "histograms": [],
        "exemplars": [({"trace_id": "t-1"}, 15_000, 2.5)],
        "metadata": {"type": "counter", "help": "a float series",
                     "unit": "seconds"},
    },
    {
        "labels": {"__name__": "rw2_hist", "le": ""},
        "samples": [],
        "histograms": [
            (
                60_000,
                {
                    "count": 7.0,
                    "sum": 31.5,
                    "zero_count": 1.0,
                    "schema": 0,
                    "buckets": [(0, 2.0), (1, 3.0), (4, 1.0)],
                },
            )
        ],
        "exemplars": [],
        "metadata": {},
    },
]


def test_rw2_roundtrip():
    from tsdb_spark.sources.remotewrite import (
        decode_write_request_v2,
        encode_write_request_v2,
    )

    body = encode_write_request_v2(RW2_SERIES)
    out = decode_write_request_v2(body)
    assert len(out) == 2
    f, h = out
    assert f["labels"] == RW2_SERIES[0]["labels"]
    assert f["samples"] == RW2_SERIES[0]["samples"]
    assert f["exemplars"] == [({"trace_id": "t-1"}, 15_000, 2.5)]
    assert f["metadata"] == RW2_SERIES[0]["metadata"]
    assert h["labels"] == {"__name__": "rw2_hist"}  # empty-name ref dropped
    [(t, hh)] = h["histograms"]
    assert t == 60_000
    assert hh["count"] == 7.0 and hh["sum"] == 31.5
    assert hh["zero_count"] == 1.0 and hh["schema"] == 0
    assert hh["buckets"] == [(0, 2.0), (1, 3.0), (4, 1.0)]


def test_rw2_nhcb_custom_values_roundtrip():
    """NHCB custom bounds (schema -53) ride the rw2 Histogram's
    custom_values field (field 16, repeated double) — a classic
    histogram converted to NHCB upstream round-trips the wire with its
    bounds intact; exponential histograms carry none."""
    from tsdb_spark.sources.remotewrite import (
        decode_write_request_v2,
        encode_write_request_v2,
    )

    series = [{
        "labels": {"__name__": "nhcb"},
        "samples": [],
        "histograms": [(30_000, {
            "count": 10.0, "sum": 25.0, "zero_count": 0.0,
            "schema": -53, "buckets": [(0, 4.0), (2, 6.0)],
            "custom_values": [0.5, 2.0, 8.0],
        })],
    }]
    [out] = decode_write_request_v2(encode_write_request_v2(series))
    [(t, h)] = out["histograms"]
    assert t == 30_000 and h["schema"] == -53
    assert h["custom_values"] == [0.5, 2.0, 8.0]
    assert h["buckets"] == [(0, 4.0), (2, 6.0)]
    # exponential histograms decode with custom_values None
    exp = [{
        "labels": {"__name__": "e"}, "samples": [],
        "histograms": [(1_000, {
            "count": 1.0, "sum": 1.0, "zero_count": 0.0,
            "schema": 0, "buckets": [(1, 1.0)],
        })],
    }]
    [out2] = decode_write_request_v2(encode_write_request_v2(exp))
    assert out2["histograms"][0][1]["custom_values"] is None


def test_rw2_symbol_table_interned():
    from tsdb_spark.sources.remotewrite import (
        encode_write_request_v2,
        snappy_decompress,
    )

    # two series sharing a label name+value must intern it once
    body = snappy_decompress(
        encode_write_request_v2(
            [
                {"labels": {"job": "api", "__name__": "a"}, "samples": [(0, 1.0)]},
                {"labels": {"job": "api", "__name__": "b"}, "samples": [(0, 2.0)]},
            ]
        )
    )
    assert body.count(b"api") == 1
    assert body.count(b"job") == 1


def test_rw2_int_histogram_deltas_and_negative_fold():
    """Hand-encode the INT histogram form (count_int, zigzag sint64
    delta buckets, spans on both signs) — upstream senders emit this
    for integer histograms; deltas expand to absolute counts and
    negative-side buckets fold into zero_count per the engine's
    documented positive-only subset."""
    from tsdb_spark.sources.remotewrite import (
        decode_write_request_v2,
        snappy_compress,
    )

    def uv(v):
        out = bytearray()
        while v > 0x7F:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)
        return bytes(out)

    def zz(v):
        return uv((v << 1) ^ (v >> 63) if v < 0 else v << 1)

    def field(num, wt, payload):
        if wt == 0:
            return uv((num << 3) | 0) + payload
        if wt == 1:
            return uv((num << 3) | 1) + payload
        return uv((num << 3) | 2) + uv(len(payload)) + payload

    # positive spans: [offset 0 len 2], [gap 2 len 1] → idx 0,1,4
    # deltas 2, +1, -2 → counts 2, 3, 1
    span1 = field(1, 0, zz(0)) + field(2, 0, uv(2))
    span2 = field(1, 0, zz(2)) + field(2, 0, uv(1))
    # negative side: one bucket of count 4 → folds into zero_count
    nspan = field(1, 0, zz(1)) + field(2, 0, uv(1))
    hist = (
        field(1, 0, uv(11))                      # count_int
        + field(3, 1, struct.pack("<d", 40.0))   # sum
        + field(4, 0, zz(3))                     # schema (sint32)
        + field(6, 0, uv(1))                     # zero_count_int
        + field(8, 2, nspan)
        + field(9, 2, zz(4))                     # packed neg deltas
        + field(11, 2, span1)
        + field(11, 2, span2)
        + field(12, 2, zz(2) + zz(1) + zz(-2))   # packed pos deltas
        + field(15, 0, uv(90_000))               # timestamp
    )
    ts = field(1, 2, uv(1) + uv(2)) + field(3, 2, hist)
    req = (
        field(4, 2, b"")                         # symbols[0] = ""
        + field(4, 2, b"__name__")
        + field(4, 2, b"ih")
        + field(5, 2, ts)
    )
    [out] = decode_write_request_v2(snappy_compress(req))
    assert out["labels"] == {"__name__": "ih"}
    [(t, h)] = out["histograms"]
    assert t == 90_000
    assert h["count"] == 11.0 and h["sum"] == 40.0 and h["schema"] == 3
    assert h["zero_count"] == 1.0 + 4.0
    assert h["buckets"] == [(0, 2.0), (1, 3.0), (4, 1.0)]


def test_rw2_validation_errors():
    from tsdb_spark.sources.remotewrite import (
        decode_write_request_v2,
        snappy_compress,
    )

    with pytest.raises(ValueError):
        # symbols[0] must be ""
        decode_write_request_v2(
            snappy_compress(b"\x22\x01x")  # field 4 wt 2 "x"
        )
    with pytest.raises((ValueError, IndexError)):
        # odd labels_refs length
        body = b"\x22\x00" + b"\x22\x01a" + b"\x2a\x03\x0a\x01\x01"
        decode_write_request_v2(snappy_compress(body))


def test_rw2_append_and_http_negotiation(spark, tmp_path):
    """End-to-end over the live route: a v2 body (float + native
    histogram + exemplar) POSTs with the rw2 Content-Type, lands in all
    three tables, and a plain v1 body on the SAME endpoint still routes
    through the 1.0 decoder (the spec's backwards-compatibility rule).
    Decode failures answer 400; internal append failures answer 500 so
    conforming senders retry (remote-write spec forbids retrying 4xx)."""
    import urllib.error

    from tsdb_spark.api import query, serve

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    srv = serve(db, "127.0.0.1", 0)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    url = f"http://127.0.0.1:{port}/api/v1/write"
    try:
        from tsdb_spark.sources.remotewrite import encode_write_request_v2

        req = urllib.request.Request(
            url,
            data=encode_write_request_v2(RW2_SERIES),
            headers={
                "Content-Encoding": "snappy",
                "Content-Type": "application/x-protobuf;"
                "proto=io.prometheus.write.v2.Request",
                "X-Prometheus-Remote-Write-Version": "2.0.0",
            },
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 204
            # rw2 spec: receivers MUST report written counts
            assert resp.headers["X-Prometheus-Remote-Write-Samples-Written"] == "2"
            assert resp.headers["X-Prometheus-Remote-Write-Histograms-Written"] == "1"
            assert resp.headers["X-Prometheus-Remote-Write-Exemplars-Written"] == "1"
        out = query(db, "rw2_float", 15_000)
        assert out["data"]["result"][0]["value"][1] == "2.5"
        hrows = db.hist_frame(0, 120_000).collect()
        assert len(hrows) == 1
        h = hrows[0]["h"]
        assert h["count"] == 7.0 and h["sum"] == 31.5
        assert [(b["idx"], b["c"]) for b in h["buckets"]] == [
            (0, 2.0), (1, 3.0), (4, 1.0),
        ]
        ex = db.exemplars_frame(0, 120_000).collect()
        assert len(ex) == 1 and dict(ex[0]["exemplar"]) == {"trace_id": "t-1"}

        # v1 body, v1 content type, same endpoint
        v1 = urllib.request.Request(
            url,
            data=encode_write_request(
                [({"__name__": "still_v1"}, [(30_000, 4.0)])]
            ),
            headers={"Content-Type": "application/x-protobuf"},
        )
        with urllib.request.urlopen(v1) as resp:
            assert resp.status == 204
        out = query(db, "still_v1", 30_000)
        assert out["data"]["result"][0]["value"][1] == "4"

        # an explicit proto we don't speak → 415 (rw2 spec), not 400
        u415 = urllib.request.Request(
            url,
            data=b"\x00",
            headers={"Content-Type": "application/x-protobuf;"
                     "proto=io.prometheus.write.v3.Request"},
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(u415)
        assert ei.value.code == 415

        # garbage with the v2 content type → 400 (decode error)
        bad = urllib.request.Request(
            url,
            data=b"\x00\x01\x02",
            headers={
                "Content-Type": "application/x-protobuf;"
                "proto=io.prometheus.write.v2.Request"
            },
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 400

        # internal append failure → 500, NOT 400
        import tsdb_spark.api as api_mod

        orig = api_mod._apply_write_body

        def boom(db_, tagged):
            raise RuntimeError("executor lost")

        api_mod._apply_write_body = boom
        try:
            ok_body = urllib.request.Request(
                url,
                data=encode_write_request(
                    [({"__name__": "x"}, [(0, 1.0)])]
                ),
                headers={"Content-Type": "application/x-protobuf"},
            )
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(ok_body)
            assert ei.value.code == 500
        finally:
            api_mod._apply_write_body = orig
    finally:
        srv.shutdown()


def test_push_remote_write_v2_between_stores(spark, tmp_path):
    """Migration over the rw2 wire: store A's floats AND native
    histograms drain into store B through a live /api/v1/write with
    the v2 content type; B answers identically afterwards."""
    from tsdb_spark.api import serve
    from tsdb_spark.nativehist import HIST_TYPE
    from tsdb_spark.sources.remotewrite import push_remote_write_v2

    src = DB.create(spark, str(tmp_path / "src"), block_width_ms=WIDTH)
    src.append(
        spark.createDataFrame(
            [({"__name__": "f", "i": str(k)}, t * 60_000, float(t + k))
             for k in range(2) for t in range(5)],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
        )
    )
    src.append_histograms(
        spark.createDataFrame(
            [
                (
                    {"__name__": "h"},
                    120_000,
                    (5.0, 12.5, 1.0, 0, [(0, 2.0), (3, 2.0)], None),
                )
            ],
            f"labels MAP<STRING,STRING>, t LONG, h {HIST_TYPE}",
        )
    )
    dst = DB.create(spark, str(tmp_path / "dst"), block_width_ms=WIDTH)
    srv = serve(dst, "127.0.0.1", 0)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        sent = push_remote_write_v2(
            src, f"http://127.0.0.1:{port}/api/v1/write", 0, 10 * 60_000
        )
        assert sent == 10 + 1
        assert (
            dst.querier(0, 10 * 60_000).select([]).count()
            == src.querier(0, 10 * 60_000).select([]).count()
        )
        [hrow] = dst.hist_frame(0, 10 * 60_000).collect()
        h = hrow["h"]
        assert h["count"] == 5.0 and h["sum"] == 12.5
        assert [(b["idx"], b["c"]) for b in h["buckets"]] == [(0, 2.0), (3, 2.0)]
    finally:
        srv.shutdown()


def test_write_buffer_micro_batches(spark, tmp_path):
    """Opt-in WriteBuffer: many small POSTs enqueue and commit as a
    handful of appends (one per flush window), not one per request —
    the serving-rate lever; close() drains everything."""
    from tsdb_spark.api import WriteBuffer, serve

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    buf = WriteBuffer(db, flush_ms=60_000)  # manual flushes only
    srv = serve(db, "127.0.0.1", 0, write_buffer=buf)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        for i in range(8):
            body = encode_write_request(
                [({"__name__": "burst", "i": str(i)}, [(i * 1000, float(i))])]
            )
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/v1/write",
                data=body,
                headers={"Content-Type": "application/x-protobuf"},
            )
            with urllib.request.urlopen(req) as resp:
                assert resp.status == 204
        # nothing committed yet: 2xx means ACCEPTED in buffered mode
        assert db.querier(0, 10**9).select([]).count() == 0
        assert buf.flush() == 8  # ONE append for all eight requests
        assert db.querier(0, 10**9).select([]).count() == 8
        assert buf.flushes == 1
        buf.close()
    finally:
        srv.shutdown()


def test_write_buffer_requeues_on_flush_failure(spark, tmp_path):
    """A failed flush must RE-QUEUE the popped batch (transient store
    failure costs a retry, never the data)."""
    from tsdb_spark.api import WriteBuffer

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    buf = WriteBuffer(db, flush_ms=60_000)
    try:
        buf.add([({"__name__": "x"}, 0, 1.0), ({"__name__": "x"}, 1000, 2.0)])
        orig = db.append
        db.append = lambda *a, **k: (_ for _ in ()).throw(RuntimeError("down"))
        with pytest.raises(RuntimeError):
            buf.flush()
        db.append = orig
        assert buf.flush() == 2
        assert db.querier(0, 10**9).select([]).count() == 2
    finally:
        buf.close()


def test_write_buffer_concurrent_flushes_serialize(spark, tmp_path):
    """Overlapping flush() calls (timer thread + a max_rows trigger in a
    handler thread) must SERIALIZE: DB.append read-modify-writes
    meta['next_ingest_seq'] without its own lock, so two concurrent
    flushes would commit with the same ingest_seq and clobber the bump.
    With the flush lock, every append observes a distinct seq."""
    import time

    from tsdb_spark.api import WriteBuffer

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    buf = WriteBuffer(db, flush_ms=60_000)  # manual flushes only
    seqs = []
    orig = db.append

    def slow_append(df, **k):
        # record the seq each commit will consume; the sleep widens the
        # window so unlocked flushes would reliably collide here
        seqs.append(db.meta["next_ingest_seq"])
        time.sleep(0.15)
        return orig(df, **k)

    db.append = slow_append
    try:

        def worker(i):
            buf.add([({"__name__": "c", "i": str(i)}, i * 1000, float(i))])
            buf.flush()

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(4)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        buf.close()
    finally:
        db.append = orig
    assert len(seqs) == len(set(seqs)), f"duplicate ingest_seq: {seqs}"
    assert db.querier(0, 10**9).select([]).count() == 4


def test_write_buffer_spill_replays_exactly_once(spark, tmp_path):
    """Durable WriteBuffer (spill_path): a 2xx-acked batch survives a
    process crash inside the flush window — the next process replays
    the spill exactly once (content-hash dedup), commits it, and a
    further restart replays nothing. A .flushing segment left by a
    crash mid-flush replays too."""
    import os

    from tsdb_spark.api import WriteBuffer

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    spill = str(tmp_path / "wal.jsonl")
    buf = WriteBuffer(db, flush_ms=3_600_000, spill_path=spill)
    buf.add(
        rows=[({"__name__": "d"}, 1_000, 1.0), ({"__name__": "d"}, 2_000, 2.0)],
        hists=[({"__name__": "dh"}, 1_000,
                (3.0, 6.0, 0.0, 0, [(1, 3.0)], None))],
        exemplars=[({"__name__": "d"}, 1_000, 1.0, {"trace_id": "t1"})],
    )
    buf._stop.set()  # "crash": acked but never flushed, never closed
    assert os.path.getsize(spill) > 0
    assert db.querier(0, 10**9).select([]).count() == 0

    # restart 1: the spilled batch replays and commits
    buf2 = WriteBuffer(db, flush_ms=3_600_000, spill_path=spill)
    assert buf2.replayed == 4
    assert buf2.flush() == 3  # 2 floats + 1 histogram
    assert db.querier(0, 10**9).select([]).count() == 2
    [h] = db.hist_frame(0, 10**9).collect()
    assert h["h"]["count"] == 3.0
    buf2._stop.set()

    # restart 2: the committed segment is gone — nothing replays
    buf3 = WriteBuffer(db, flush_ms=3_600_000, spill_path=spill)
    assert buf3.replayed == 0 and buf3.flush() == 0
    assert db.querier(0, 10**9).select([]).count() == 2
    buf3.close()


def test_write_buffer_spill_mid_flush_segment_and_dedup(spark, tmp_path):
    """A crash BETWEEN the journal rotation and the commit leaves a
    .flushing segment: restart replays it. Identical lines across the
    live spill and the segment (a re-queued batch journaled twice)
    ingest once — the content-hash dedup."""
    import os
    import shutil

    from tsdb_spark.api import WriteBuffer

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    spill = str(tmp_path / "wal.jsonl")
    buf = WriteBuffer(db, flush_ms=3_600_000, spill_path=spill)
    buf.add(rows=[({"__name__": "m"}, 5_000, 9.0)])
    buf._stop.set()
    # simulate the mid-flush crash: the journal was rotated (and, for
    # the dedup half of this test, the same line also re-journaled)
    shutil.copy(spill, f"{spill}.flushing")
    buf2 = WriteBuffer(db, flush_ms=3_600_000, spill_path=spill)
    assert buf2.replayed == 1  # duplicate line replayed ONCE
    assert buf2.flush() == 1
    assert db.querier(0, 10**9).select([]).count() == 1
    assert not os.path.exists(f"{spill}.flushing")
    buf2.close()


def test_write_buffer_spill_recovery_is_itself_durable(spark, tmp_path):
    """A crash DURING replay loses nothing: recovered lines are
    rewritten to an fsynced segment BEFORE the original segments are
    removed (at every instant either the originals or the rebuilt
    segment exist), and a .recovered segment left by a crash
    mid-recovery replays on the next start."""
    import os

    from tsdb_spark.api import WriteBuffer

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    spill = str(tmp_path / "wal.jsonl")
    buf = WriteBuffer(db, flush_ms=3_600_000, spill_path=spill)
    buf.add(rows=[({"__name__": "r"}, 1_000, 1.0),
                  ({"__name__": "r"}, 2_000, 2.0)])
    buf._stop.set()

    # crash #1: recovery runs, process dies again before ANY flush —
    # the acked batch must still be on disk (the old code deleted the
    # segments before re-journaling, leaving a loss window here)
    buf2 = WriteBuffer(db, flush_ms=3_600_000, spill_path=spill)
    assert buf2.replayed == 2
    buf2._stop.set()
    assert os.path.getsize(spill) > 0

    # crash #2: mid-recovery, after the originals were consumed but
    # before the rebuilt segment was renamed live — only .recovered
    # exists; the next start must scan it
    os.replace(spill, f"{spill}.recovered")
    buf3 = WriteBuffer(db, flush_ms=3_600_000, spill_path=spill)
    assert buf3.replayed == 2
    assert not os.path.exists(f"{spill}.recovered")
    assert buf3.flush() == 2
    assert db.querier(0, 10**9).select([]).count() == 2  # exactly once
    buf3._stop.set()

    # committed: nothing replays, nothing ingests twice
    buf4 = WriteBuffer(db, flush_ms=3_600_000, spill_path=spill)
    assert buf4.replayed == 0 and buf4.flush() == 0
    assert db.querier(0, 10**9).select([]).count() == 2
    buf4.close()


def test_rw2_metadata_feeds_api_metadata(spark, tmp_path):
    """rw2 TimeSeries metadata (type/help/unit) SHOULD be used by
    receivers (spec § metadata): a v2 POST populates the same
    /api/v1/metadata surface scraped HELP/TYPE comments do."""
    import json

    from tsdb_spark.api import serve
    from tsdb_spark.sources.remotewrite import encode_write_request_v2

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    md: dict = {}
    srv = serve(db, "127.0.0.1", 0, scrape_metadata=md)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/write",
            data=encode_write_request_v2(RW2_SERIES),
            headers={
                "Content-Encoding": "snappy",
                "Content-Type": "application/x-protobuf;"
                "proto=io.prometheus.write.v2.Request",
                "X-Prometheus-Remote-Write-Version": "2.0.0",
            },
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 204
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v1/metadata", timeout=10
        ) as r:
            data = json.loads(r.read())["data"]
        [entry] = data["rw2_float"]
        assert entry == {"type": "counter", "help": "a float series",
                         "unit": "seconds"}
    finally:
        srv.shutdown()
