"""Regression locks for the r4 append rework (the 570k -> 894k
samples/s step): the hot/cold codec split, the shared batch cache, and
the observed-metric bucket tracking. Each property is load-bearing for
ingest throughput at scale; a refactor that silently loses one costs
~20-50% of write throughput (measured — see SCALE.md)."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tsdb_spark import DB, eq

WIDTH = 3_600_000


def _rows(spark, series, t0, n, step=60_000, v0=0.0):
    data = [({"__name__": series}, t0 + i * step, v0 + i) for i in range(n)]
    return spark.createDataFrame(data, "labels MAP<STRING,STRING>, t LONG, v DOUBLE")


def _codecs(root):
    out = set()
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                meta = pq.ParquetFile(os.path.join(dirpath, f)).metadata
                for rg in range(meta.num_row_groups):
                    out.add(meta.row_group(rg).column(0).compression)
    return out


def test_hot_append_writes_lz4_compact_rewrites_zstd(spark, tmp_path):
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    db.append(_rows(spark, "m", 0, 240))  # 4 buckets
    # pyarrow names LZ4_RAW "LZ4" (legacy lz4hadoop shows as "UNKNOWN")
    assert _codecs(db._samples_path) == {"LZ4"}
    db.compact(4 * WIDTH)
    # the cold rewrite recompresses with the session default (zstd)
    assert _codecs(db._samples_path) == {"ZSTD"}


def test_append_batch_is_cached_and_released(spark, tmp_path):
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    def n_persistent():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    before = n_persistent()
    db.append(_rows(spark, "m", 0, 50))
    # the batch cache must NOT leak past the append call (the series dim
    # cache itself persists by design — allow exactly that one)
    assert n_persistent() <= before + 1


def test_overlap_tracking_via_observation(spark, tmp_path):
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    db.append(_rows(spark, "m", 0, 240))  # buckets 0..3
    # second batch lands inside bucket 1 only -> exactly that one flagged
    db.append(_rows(spark, "m", WIDTH + 5, 60, v0=900.0))
    assert db.overlapping_buckets == [WIDTH]
    # correctness through the dirty read path: +5ms offsets never collide
    n = db.querier(0, 10**13).select([eq("__name__", "m")]).count()
    assert n == 300


def test_failed_samples_job_leaves_no_phantom_dim(spark, tmp_path):
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    bad = spark.createDataFrame(
        [({"__name__": "x"}, 1, 1.0)], "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
    ).withColumn("v", F.raise_error(F.lit("boom")).cast("double"))
    with pytest.raises(Exception):
        db.append(bad)
    assert db.series().count() == 0
    assert not os.path.isdir(db._series_path) or db.series().count() == 0
