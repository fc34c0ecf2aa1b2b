"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The model for image/audio/video at 100TB: payloads are `binary` columns
(or object-store URIs) with a typed metadata struct alongside; decode /
feature-extract / resize / frame-sample run as Arrow-batched
`mapInPandas` stages — per-element binary decoding is genuinely outside
relational algebra, so this is the sanctioned pandas path (everything
around it — partitioning, pruning, joins — stays declarative).

The container has no image/audio codecs, so `decode_image` /
`sample_frames` are explicit stubs (NotImplementedError) with the real
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


def decode_image(table: DataFrame, width: int, height: int) -> DataFrame:
    """STUB — image decode + resize to (width, height).

    The real implementation decodes `payload` with an image codec in
    the same mapInPandas shape as `payload_features` and returns
    (doc_id, pixels array<float>, meta). No codec ships in this
    container."""
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "use payload_features for the plumbing contract"
    )


def sample_frames(table: DataFrame, every_ms: int) -> DataFrame:
    """STUB — video frame sampling every `every_ms` milliseconds; same
    contract as decode_image."""
    raise NotImplementedError(
        "video codecs not available in this environment; "
        "use payload_features for the plumbing contract"
    )
