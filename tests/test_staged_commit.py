"""Locks for the r10 staged append commit (reserve/stage/publish).

The r9 serve-mode soak measured 110s of a 190s run WAITING on the store
mutex because every appender held it across its whole Spark write job.
The staged protocol runs the job into a private staging dir unlocked and
takes the mutex only for the seq reservation and the rename-and-meta
publish. These tests pin the properties the protocol must keep:

- concurrent appends commit with distinct seqs, all samples visible,
  overlap tracked, and no duplicate series-dim rows
- the mutex is NOT held during the stage write (the whole point)
- durable_head never advances past an in-flight reservation (a tailing
  forwarder must not skip a batch that publishes out of order)
- a failed stage aborts cleanly: seq becomes a hole, staging dropped
- a crash's leftover staging is GC'd on open, but NOT by a read-only
  handle attaching to a live store
"""

import os
import threading

import pytest

from tsdb_spark import DB, eq

WIDTH = 3_600_000


def _rows(spark, series, t0, n, step=60_000, v0=0.0):
    data = [({"__name__": series}, t0 + i * step, v0 + i) for i in range(n)]
    return spark.createDataFrame(data, "labels MAP<STRING,STRING>, t LONG, v DOUBLE")


def test_concurrent_appends_commit_all_samples(spark, tmp_path):
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    errs = []

    def work(i):
        try:
            db.append(_rows(spark, f"m{i}", 0, 120, v0=i * 1000.0))
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    # every batch fully visible
    q = db.querier(0, 10**13)
    for i in range(4):
        assert q.select([eq("__name__", f"m{i}")]).count() == 120
    # distinct seqs: 4 appends consumed 4 seq values, none in flight
    assert db.meta["next_ingest_seq"] == 5
    assert db.durable_head() == 4
    # the shared buckets were touched by >1 append -> flagged overlapping
    assert set(db.overlapping_buckets) == {0, WIDTH}
    # the dim holds each series exactly once even though all four
    # appends raced their first-ever series through the upsert
    dim = db.series()
    assert dim.count() == dim.select("series_id").distinct().count() == 4
    # no staging leftovers
    assert not os.path.isdir(db._staging_root) or os.listdir(db._staging_root) == []


def test_mutex_not_held_during_stage_write(spark, tmp_path):
    """While one append's Spark job runs, the store mutex must be
    acquirable — another thread grabs it mid-write and proves the lock
    hold is publish-only."""
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    db.append(_rows(spark, "warm", 0, 10))
    acquired_during_write = []
    orig_publish = db._publish_staged
    in_stage = threading.Event()

    def probing_publish(stage_dir, dest):
        # entered only under the mutex; by now the stage job finished.
        return orig_publish(stage_dir, dest)

    def prober():
        in_stage.wait(timeout=30)
        got = db._mutex.acquire(timeout=10)
        if got:
            acquired_during_write.append(True)
            db._mutex.release()

    # signal the prober the moment the staging dir appears (stage write
    # running, publish not yet entered)
    orig_new_stage = db._new_staging_dir

    def signaling_stage():
        d = orig_new_stage()
        in_stage.set()
        return d

    db._new_staging_dir = signaling_stage
    db._publish_staged = probing_publish
    t = threading.Thread(target=prober)
    t.start()
    db.append(_rows(spark, "big", 0, 5000))
    t.join()
    assert acquired_during_write == [True]


def test_durable_head_stops_at_lowest_inflight(spark, tmp_path):
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    db.append(_rows(spark, "a", 0, 5))
    assert db.durable_head() == 1
    # reserve two seqs as if two staged appends were in flight
    s1 = db._reserve_seq()
    s2 = db._reserve_seq()
    assert (s1, s2) == (2, 3)
    # head must stay BELOW both: seq 3 could publish before seq 2
    assert db.durable_head() == 1
    db._inflight.discard(s2)  # later batch lands first
    assert db.durable_head() == 1  # still gated by s1
    db._inflight.discard(s1)
    assert db.durable_head() == 3


def test_failed_stage_aborts_seq_and_staging(spark, tmp_path):
    from pyspark.sql import functions as F

    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    db.append(_rows(spark, "ok", 0, 5))
    bad = spark.createDataFrame(
        [({"__name__": "x"}, 1, 1.0)], "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
    ).withColumn("v", F.raise_error(F.lit("boom")).cast("double"))
    with pytest.raises(Exception):
        db.append(bad)
    # the reserved seq is a hole, not in flight: head moves past it
    assert db._inflight == set()
    assert db.meta["next_ingest_seq"] == 3
    assert db.durable_head() == 2
    # staging cleaned up
    assert not os.path.isdir(db._staging_root) or os.listdir(db._staging_root) == []
    # a later append reuses nothing and lands normally
    db.append(_rows(spark, "ok", WIDTH, 5))
    assert db.querier(0, 10**13).select([eq("__name__", "ok")]).count() == 10


def test_stale_staging_gc_on_open_but_not_readonly(spark, tmp_path):
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    db.append(_rows(spark, "m", 0, 5))
    leftover = os.path.join(db._staging_root, "deadbeef")
    os.makedirs(leftover)
    with open(os.path.join(leftover, "part-0.parquet"), "wb") as f:
        f.write(b"junk")
    # read-only attach (CLI dump against a live store) must not touch
    # another process's in-flight staging
    ro = DB.open_readonly(spark, db.path)
    assert os.path.isdir(leftover)
    assert ro.querier(0, 10**13).select([]).count() == 5
    # a writer re-open abandons the crashed append's staging
    db2 = DB.open(spark, db.path)
    assert not os.path.isdir(leftover)
    assert db2.querier(0, 10**13).select([]).count() == 5


def test_steady_state_append_adds_no_dim_files(spark, tmp_path):
    """The dim-upsert probe skips the write when a batch carries no new
    series — the series dir must stop growing per append."""
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    db.append(_rows(spark, "m", 0, 10))

    def dim_files():
        return [
            f for f in os.listdir(db._series_path) if not f.startswith(("_", "."))
        ]

    before = dim_files()
    rep = db.append(_rows(spark, "m", WIDTH, 10), report=True)
    assert rep.new_series == 0
    assert dim_files() == before


def test_publish_version_invalidates_mid_append_caches(spark, tmp_path):
    """A series()/postings() consumer that resolves between the seq
    reservation and the publish must go stale once the append lands —
    the publish counter is the third version component that guarantees
    it."""
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=WIDTH)
    db.append(_rows(spark, "a", 0, 5))
    v_before = tuple(db._data_version())
    # simulate the mid-append window: reserve (bumps next_ingest_seq)...
    seq = db._reserve_seq()
    v_mid = tuple(db._data_version())
    assert v_mid != v_before
    db.materialize_postings()
    assert db.meta["postings_version"] == db._data_version()
    # ...then publish (bumps publish_count): postings must read stale
    with db._mutex:
        db._inflight.discard(seq)
        db._bump_publish_locked()
        db._write_meta()
    assert tuple(db._data_version()) != v_mid
    assert db.meta["postings_version"] != db._data_version()
