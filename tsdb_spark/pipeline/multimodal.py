"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The model for image/audio/video at 100TB: payloads are `binary` columns
(or object-store URIs) with a typed metadata struct alongside; decode /
feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages — per-element binary decoding is genuinely outside
relational algebra, so this is the sanctioned pandas path (everything
around it — partitioning, pruning, joins — stays declarative).

The container has no image/audio codecs, so `decode_image` /
`sample_frames` / `audio_features` use deterministic fake decodes with the real
Spark-side plumbing — schema, batch iteration, output contract — in
place and exercised by `payload_features`, whose deterministic "decode"
(byte length + md5 digest) a SQL oracle can verify.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURES_SCHEMA = "doc_id long, n_bytes long, digest string"


def with_payload(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Attach an opaque binary payload + metadata struct to each row —
    the ingest shape of a multimodal table. (Here the payload is the
    utf-8 encoding of the text; for real media it would be the raw
    bytes, same schema.)"""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("text/plain").alias("mime"),
        F.octet_length(payload).alias("n_bytes"),
    )
    return docs.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def payload_features(table: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    The deterministic stand-in for a media decoder: per payload, its
    byte length and md5 digest. The mapInPandas contract (batch
    iterator in, schema'd frame out) is exactly what a real decoder
    plugs into — swap the body, keep the plumbing."""

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return table.select("doc_id", "payload").mapInPandas(extract, FEATURES_SCHEMA)


def _fake_pixels(payload: bytes, width: int, height: int) -> list[float]:
    """Deterministic stand-in for decode+resize: the pixel array derives
    from the payload digest in 256-pixel blocks (block b's value =
    hash64('img:'+digest, b) % 256, scaled to [0,1]) — reproducible in
    SQL with one md5 per block, while the pandas side still builds and
    ships the full float array through Arrow like a real decoder."""
    import numpy as np

    digest = hashlib.md5(payload).hexdigest()
    n_px = width * height * 3
    n_blocks = (n_px + 255) // 256
    vals = np.array(
        [
            int(hashlib.md5(f"img:{digest}:{b}".encode()).hexdigest()[:15], 16) % 256
            for b in range(n_blocks)
        ],
        dtype="float64",
    )
    return (np.repeat(vals, 256)[:n_px] / 255.0).tolist()


DECODE_SCHEMA = "doc_id long, width int, height int, pixels array<double>"


def decode_image(table: DataFrame, width: int, height: int, decoder=None) -> DataFrame:
    """Image decode + resize to (width, height) as an Arrow-batched
    mapInPandas stage: (doc_id, width, height, pixels array<double>).

    `decoder(payload, width, height) -> list[float]` plugs a real codec
    in; the default is the DETERMINISTIC FAKE `_fake_pixels` (no image
    codec ships in this container). The plumbing — batch iteration,
    Arrow transfer of wide float arrays, schema contract — is exactly
    what a real decoder runs through."""
    decode = decoder or _fake_pixels

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "pixels": pdf["payload"].map(
                        lambda b: decode(bytes(b), width, height)
                    ),
                }
            )

    return table.select("doc_id", "payload").mapInPandas(run, DECODE_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx long, ts_ms long, frame_digest string"


def sample_frames(table: DataFrame, every_ms: int = 1000, decoder=None) -> DataFrame:
    """Video frame sampling every `every_ms` ms as a one-to-many
    mapInPandas stage: (doc_id, frame_idx, ts_ms, frame_digest).

    The DETERMINISTIC FAKE container treats the payload as a clip of
    `n_bytes` milliseconds whose frame at index i has digest
    md5('frm:<payload digest>:<i>') — a real extractor returns frame
    bytes/features in the same exploded shape. The interesting plumbing
    (input row fan-out to a variable number of output rows inside one
    Arrow batch) is real either way."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, tss, digs = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                digest = hashlib.md5(raw).hexdigest()
                for i in range(len(raw) // every_ms + 1):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    digs.append(hashlib.md5(f"frm:{digest}:{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame_digest": digs}
            )

    return table.select("doc_id", "payload").mapInPandas(run, FRAMES_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, win_idx long, n_samples long, energy long, "
    "zero_crossings long, peak long"
)


def audio_features(table: DataFrame, window: int = 64) -> DataFrame:
    """Audio feature extraction as an Arrow-batched mapInPandas stage:
    the payload is treated as 8-bit PCM mono (center 128) and every
    `window`-sample frame yields integer DSP features — energy
    (sum of squared amplitudes), zero-crossing count (strict sign
    flips), and peak amplitude.

    DETERMINISTIC-FAKE decode like the image/video paths (no audio
    codec ships in this container): the "PCM" is the raw payload bytes,
    so a SQL oracle reproduces every feature; a real decoder would
    replace only the byte-source line. One-to-many fan-out per row, all
    arithmetic integer-exact, vectorized per Arrow batch."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, wins, ns, es, zs, ps = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                pcm = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64) - 128
                for w in range((len(pcm) + window - 1) // window):
                    fr = pcm[w * window : (w + 1) * window]
                    sg = np.sign(fr)
                    ids.append(doc_id)
                    wins.append(w)
                    ns.append(len(fr))
                    es.append(int((fr * fr).sum()))
                    zs.append(int(((sg[:-1] * sg[1:]) < 0).sum()))
                    ps.append(int(np.abs(fr).max()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "win_idx": wins,
                    "n_samples": ns,
                    "energy": es,
                    "zero_crossings": zs,
                    "peak": ps,
                }
            )

    return table.select("doc_id", "payload").mapInPandas(run, AUDIO_SCHEMA)
