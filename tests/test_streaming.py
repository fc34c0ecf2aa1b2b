"""Streaming ingest: checkpointed file-source stream → foreachBatch →
DB.append. Covers T1 (bounded lateness), T3 (auto-flush via the leveled
planner), T5 (restart/replay semantics — the WAL analog)."""

import pytest
import os

import pytest
from pyspark.sql import functions as F

from tsdb_spark import labels as L
from tsdb_spark.db import DB
from tsdb_spark.streaming import StreamIngestor

ROWS_SCHEMA = "labels MAP<STRING,STRING>, t LONG, v DOUBLE"


def _write_chunk(spark, src_dir, rows, name):
    df = spark.createDataFrame(rows, ROWS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(src_dir, name))


def _drain(spark, src_dir, ingestor, ckpt):
    stream = spark.readStream.schema(ROWS_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src_dir + "/*")
    q = ingestor.start(stream, ckpt, trigger={"availableNow": True})
    q.awaitTermination(120)
    assert not q.isActive


def _store_ts(db):
    return {
        r["t"]: r["v"]
        for r in db.querier(-(10**15), 10**15).select([L.eq("m", "a")]).collect()
    }


def test_stream_ingest_and_restart_resumes(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    db = DB.create(spark, str(tmp_path / "store"), block_width_ms=1000)
    ing = StreamIngestor(db)

    _write_chunk(spark, src, [({"m": "a"}, 100, 1.0), ({"m": "a"}, 1100, 2.0)], "c0")
    _drain(spark, src, ing, ckpt)
    assert _store_ts(db) == {100: 1.0, 1100: 2.0}
    epoch_after_first = db.meta["last_stream_epoch"]

    # restart with the same checkpoint: old file NOT reprocessed, new
    # file picked up where the offsets left off (T5)
    _write_chunk(spark, src, [({"m": "a"}, 2100, 3.0)], "c1")
    ing2 = StreamIngestor(db)
    _drain(spark, src, ing2, ckpt)
    assert _store_ts(db) == {100: 1.0, 1100: 2.0, 2100: 3.0}
    assert db.meta["last_stream_epoch"] > epoch_after_first

    # drain with no new data: a no-op, nothing duplicated
    seq = db.meta["next_ingest_seq"]
    _drain(spark, src, StreamIngestor(db), ckpt)
    assert _store_ts(db) == {100: 1.0, 1100: 2.0, 2100: 3.0}
    assert db.meta["next_ingest_seq"] == seq


def test_replayed_epoch_skipped_and_reappend_invisible(spark, tmp_path):
    db = DB.create(spark, str(tmp_path / "store"), block_width_ms=1000)
    ing = StreamIngestor(db)
    batch = spark.createDataFrame([({"m": "a"}, 100, 1.0)], ROWS_SCHEMA)
    ing.process_batch(batch, 0)
    assert _store_ts(db) == {100: 1.0}
    # exact replay of a committed epoch: skipped outright
    ing.process_batch(batch, 0)
    assert db.meta["next_ingest_seq"] == 2
    # crash-window replay (samples committed, epoch lost): the second
    # append lands, but vertical dedup hides the identical copies
    db.meta["last_stream_epoch"] = -1
    ing.process_batch(batch, 0)
    assert db.meta["next_ingest_seq"] == 3
    assert _store_ts(db) == {100: 1.0}


def test_bounded_lateness_rejects_old_samples(spark, tmp_path):
    db = DB.create(spark, str(tmp_path / "store"), block_width_ms=1000)
    ing = StreamIngestor(db, lateness_ms=500)
    ing.process_batch(
        spark.createDataFrame([({"m": "a"}, 1000, 1.0)], ROWS_SCHEMA), 0
    )
    # hwm=1000 → min_valid=500: t=400 dropped, t=600 and t=1200 kept
    ing.process_batch(
        spark.createDataFrame(
            [({"m": "a"}, 400, 9.0), ({"m": "a"}, 600, 2.0), ({"m": "a"}, 1200, 3.0)],
            ROWS_SCHEMA,
        ),
        1,
    )
    assert _store_ts(db) == {1000: 1.0, 600: 2.0, 1200: 3.0}
    assert db.meta["stream_high_water_ms"] == 1200


def test_auto_flush_promotes_filled_ranges(spark, tmp_path):
    # width 100 → ranges [100, 300, 900]; streaming past t=300 leaves
    # buckets 0,100,200 behind the frontier → the planner merges them
    db = DB.create(spark, str(tmp_path / "store"), block_width_ms=100)
    ing = StreamIngestor(db, compact_every=1)
    for epoch, t in enumerate((10, 110, 210, 310)):
        ing.process_batch(
            spark.createDataFrame([({"m": "a"}, t, float(t))], ROWS_SCHEMA), epoch
        )
    buckets = sorted(int(d.split("=")[1]) for d in db._bucket_dirs())
    assert buckets == [0, 300]
    assert db.width_of(0) == 300
    assert _store_ts(db) == {10: 10.0, 110: 110.0, 210: 210.0, 310: 310.0}


def test_exact_dedup_stream_survives_restart(spark, tmp_path):
    from tsdb_spark.streaming import exact_dedup_stream

    schema = "labels_str STRING, t LONG, v DOUBLE"
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))
    os.makedirs(src)

    def drain():
        stream = spark.readStream.schema(schema).parquet(src + "/*")
        exact_dedup_stream(stream, out, ckpt, delay_ms=3600_000).awaitTermination(120)

    c0 = [("a", 100, 1.0), ("a", 200, 2.0), ("b", 100, 3.0), ("a", 200, 2.0)]
    spark.createDataFrame(c0, schema).coalesce(1).write.parquet(src + "/c0")
    drain()
    # restart: chunk 1 re-delivers two rows of chunk 0 plus one new row —
    # the dedup-key state must survive the checkpointed restart
    c1 = [("a", 200, 2.0), ("b", 100, 3.0), ("b", 300, 4.0)]
    spark.createDataFrame(c1, schema).coalesce(1).write.parquet(src + "/c1")
    drain()

    got = {(r["labels_str"], r["t"], r["v"]) for r in spark.read.parquet(out).collect()}
    assert got == {("a", 100, 1.0), ("a", 200, 2.0), ("b", 100, 3.0), ("b", 300, 4.0)}
    assert spark.read.parquet(out).count() == 4  # no duplicate rows either


@pytest.mark.slow  # maintenance-cadence soak (r11 lane split)
def test_stream_vacuum_every(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    db = DB.create(spark, str(tmp_path / "store"), block_width_ms=1000)
    ing = StreamIngestor(db, vacuum_every=10)
    # 10 micro-batches into one bucket = 10 files; the 10th commit
    # triggers the vacuum pass, which defragments past the threshold
    for i in range(10):
        _write_chunk(spark, src, [({"m": "a"}, 100 + i, float(i))], f"c{i}")
    stream = spark.readStream.schema(ROWS_SCHEMA).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src + "/*")
    q = ing.start(stream, ckpt, trigger={"availableNow": True})
    q.awaitTermination(180)
    part = os.path.join(db._samples_path, "t_bucket=0")
    n_files = sum(1 for f in os.listdir(part) if not f.startswith(("_", ".")))
    assert n_files <= 8  # defragmented (was 10 pre-vacuum)
    assert _store_ts(db) == {100 + i: float(i) for i in range(10)}


def test_stream_shuffle_partitions_restores_on_error(spark):
    from tsdb_spark.streaming import stream_shuffle_partitions

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with pytest.raises(RuntimeError):
        with stream_shuffle_partitions(spark, 3):
            assert spark.conf.get(key) == "3"
            raise RuntimeError("stream failed")
    assert spark.conf.get(key) == before


def test_hist_ingest_stream(spark, tmp_path):
    """Streaming native-histogram ingest (hist_ingest_stream): complete
    watermark-finalized windows land in the histograms table; a second
    drain over new data continues; the final window (not yet passed by
    the watermark) stays pending — partial windows can never land."""
    from tsdb_spark.nativehist import int_bucket_idx
    from tsdb_spark.streaming import hist_ingest_stream, stream_shuffle_partitions

    src = str(tmp_path / "hsrc")
    ckpt = str(tmp_path / "hckpt")
    os.makedirs(src)
    db = DB.create(spark, str(tmp_path / "hstore"), block_width_ms=60_000)

    # window width 60s, watermark delay 0: a window emits once a later
    # sample moves event time past its end
    rows = [
        ({"__name__": "lat", "s": "a"}, 1_000, 3.0),     # w[0,60s)
        ({"__name__": "lat", "s": "a"}, 2_000, 0.0),     # zero bucket
        ({"__name__": "lat", "s": "a"}, 61_000, 7.0),    # w[60s,120s)
        ({"__name__": "lat", "s": "a"}, 121_000, 1.0),   # w[120s,...) pending
    ]
    _write_chunk(spark, src, rows, "h0")

    def drain():
        with stream_shuffle_partitions(spark):
            stream = spark.readStream.schema(ROWS_SCHEMA).parquet(src + "/*")
            q = hist_ingest_stream(
                db, stream, ckpt, width_ms=60_000, delay_ms=0,
                idx_expr=int_bucket_idx(F.col("v")),
                trigger={"availableNow": True},
            )
            q.awaitTermination(120)
            assert not q.isActive

    drain()
    got = {
        r["t"]: r["h"]
        for r in db.hist_frame(0, 10**9).collect()
    }
    # availableNow's final batch advances the watermark to max event
    # time (121s): windows ending 60s and 120s emit, the 121s sample's
    # own window [120s,180s) stays PENDING in state — never half-landed
    assert set(got) == {60_000, 120_000}
    h = got[60_000]
    assert h["count"] == 2.0 and h["sum"] == 3.0 and h["zero_count"] == 1.0
    assert [(b["idx"], b["c"]) for b in h["buckets"]] == [(2, 1.0)]
    h2 = got[120_000]
    assert h2["count"] == 1.0 and h2["sum"] == 7.0
    assert [(b["idx"], b["c"]) for b in h2["buckets"]] == [(3, 1.0)]

    # restart-continue: a later sample pushes the watermark past the
    # pending window, which lands COMPLETE with its checkpointed state
    _write_chunk(spark, src, [({"__name__": "lat", "s": "a"}, 200_000, 2.0)], "h1")
    drain()
    got = {r["t"]: r["h"] for r in db.hist_frame(0, 10**9).collect()}
    assert set(got) == {60_000, 120_000, 180_000}
    h3 = got[180_000]
    assert h3["count"] == 1.0 and h3["sum"] == 1.0
    assert [(b["idx"], b["c"]) for b in h3["buckets"]] == [(0, 1.0)]
