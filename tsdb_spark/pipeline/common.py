"""Shared deterministic hashing for the pipeline operators.

Every sketch here (MinHash, SimHash, LSH buckets, winnowing) needs a
keyed 64-bit hash that (a) runs JVM-side as a native expression and
(b) can be reproduced bit-for-bit by the DuckDB oracle. md5 is the one
cryptographic hash both engines expose with identical output; we take
the first 15 hex digits (60 bits, always non-negative in an int64).

DuckDB equivalent of ``hash64(col, seed)``:

    CAST(concat('0x', substr(md5(concat('seed:', col)), 1, 15)) AS BIGINT)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash64(col: Column | str, seed: int | str = 0) -> Column:
    """Keyed 60-bit hash of a string column, seed-prefixed.

    `conv(hex, 16, 10)` parses the 15-digit hex prefix of the md5 as an
    unsigned integer — 60 bits, so the long cast never overflows and the
    value is identical to DuckDB's '0x…'::BIGINT parse.
    """
    c = F.col(col) if isinstance(col, str) else col
    keyed = F.concat(F.lit(f"{seed}:"), c)
    return F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("long")


def hash64_sql(expr: str, seed: int | str = 0) -> str:
    """The DuckDB rendering of hash64 — used to build oracle SQL."""
    return (
        f"CAST(concat('0x', substr(md5(concat('{seed}:', {expr})), 1, 15)) AS BIGINT)"
    )


def materialize(df):
    """Persist AND eagerly compute a frame that downstream plans scan
    more than once (LSH self-joins, verify joins).

    A lazy ``persist()`` is not enough: the scans arrive as sibling
    stages of ONE job, the scheduler runs them concurrently, and every
    one misses the still-empty cache — the expensive sketch expression
    then runs once per scan. One eager pass populates the cache before
    the fan-out; at cluster scale this is the same pattern as
    checkpointing a shared intermediate.

    SERIALIZED storage, not the DataFrame default (deserialized): these
    frames carry corpus-scale array columns (shingle sets, signatures),
    and a deserialized cache block must unroll a whole partition as JVM
    objects in one piece — the 64x soak OOMed exactly there
    (MemoryStore.putIteratorAsValues, SCALE.md r6). Serialized blocks
    unroll incrementally against the unified-memory watermark and spill
    to disk instead of dying; the decode cost on re-scan is noise next
    to the sketch expression being cached away."""
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    return df
