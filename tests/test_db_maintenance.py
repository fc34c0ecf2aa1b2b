"""Warehouse maintenance semantics: floored bucketing (negative t),
per-bucket overlap tracking, clean_tombstones whole-bucket deletes,
compaction, and size/time retention."""

import os

import pytest
from pyspark.sql import functions as F

from tsdb_spark import labels as L
from tsdb_spark.db import DB


def _mkdb(spark, tmp_path, name, width=1000):
    return DB.create(spark, str(tmp_path / name), block_width_ms=width)


def _df(spark, rows):
    return spark.createDataFrame(rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE")


def test_negative_timestamp_bucketing(spark, tmp_path):
    # the reference allows negative t (minValidTime is MinInt64); a t=-1
    # sample must land in bucket -width (floor), not bucket 0 (truncate) —
    # otherwise a query with maxt < 0 prunes it away.
    db = _mkdb(spark, tmp_path, "neg", width=1000)
    db.append(_df(spark, [({"x": "1"}, -1, 1.0), ({"x": "1"}, -1500, 2.0), ({"x": "1"}, 500, 3.0)]))
    buckets = sorted(int(d.split("=")[1]) for d in db._bucket_dirs())
    assert buckets == [-2000, -1000, 0]
    got = {r["t"]: r["v"] for r in db.querier(-2000, -1).select([L.eq("x", "1")]).collect()}
    assert got == {-1: 1.0, -1500: 2.0}


def test_overlap_tracking_is_per_bucket(spark, tmp_path):
    db = _mkdb(spark, tmp_path, "ovl", width=1000)
    # batch 1: buckets 0 and 1000
    db.append(_df(spark, [({"x": "1"}, 100, 1.0), ({"x": "1"}, 1100, 2.0)]))
    assert db.overlapping_buckets == []
    # batch 2: bucket 2000 only — brand-new bucket, NO overlap
    db.append(_df(spark, [({"x": "1"}, 2100, 3.0)]))
    assert db.overlapping_buckets == []
    # batch 3: rewrites t=100 in bucket 0 → only bucket 0 overlaps
    db.append(_df(spark, [({"x": "1"}, 100, 9.0)]))
    assert db.overlapping_buckets == [0]
    # read resolves the duplicate later-ingest-wins, other buckets untouched
    got = {r["t"]: r["v"] for r in db.querier(0, 9999).select([L.eq("x", "1")]).collect()}
    assert got == {100: 9.0, 1100: 2.0, 2100: 3.0}
    # compaction clears the tracking
    db.compact()
    assert db.overlapping_buckets == []
    got = {r["t"]: r["v"] for r in db.querier(0, 9999).select([L.eq("x", "1")]).collect()}
    assert got == {100: 9.0, 1100: 2.0, 2100: 3.0}


def test_select_plan_no_shuffle_when_clean(spark, tmp_path):
    # with no overlapping buckets, the select plan must not contain an
    # aggregate (dedup) over the samples scan
    db = _mkdb(spark, tmp_path, "plan", width=1000)
    db.append(_df(spark, [({"x": "1"}, 100, 1.0), ({"x": "1"}, 1100, 2.0)]))
    plan = db.querier(0, 9999).select([L.eq("x", "1")])._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" not in plan


def test_clean_tombstones_removes_emptied_bucket(spark, tmp_path):
    db = _mkdb(spark, tmp_path, "cln", width=1000)
    db.append(_df(spark, [({"x": "1"}, 100, 1.0), ({"x": "1"}, 1100, 2.0)]))
    db.delete(0, 999, [L.eq("x", "1")])  # wipes all of bucket 0
    db.clean_tombstones()
    buckets = sorted(int(d.split("=")[1]) for d in db._bucket_dirs())
    assert buckets == [1000]  # bucket 0 is gone, not stale
    got = {r["t"]: r["v"] for r in db.querier(0, 9999).select([L.eq("x", "1")]).collect()}
    assert got == {1100: 2.0}
    assert db.tombstones().count() == 0


def test_clean_tombstones_partial_bucket(spark, tmp_path):
    db = _mkdb(spark, tmp_path, "cln2", width=1000)
    db.append(_df(spark, [({"x": "1"}, 100, 1.0), ({"x": "1"}, 200, 2.0), ({"x": "2"}, 150, 3.0)]))
    db.delete(150, 250, [L.eq("x", "1")])
    db.clean_tombstones()
    got = {
        (r["labels_str"], r["t"]) for r in db.querier(0, 9999).select([]).collect()
    }
    assert got == {('{x="1"}', 100), ('{x="2"}', 150)}


def test_size_retention(spark, tmp_path):
    db = _mkdb(spark, tmp_path, "size", width=1000)
    rows = [({"x": "1"}, b * 1000 + i, float(i)) for b in range(5) for i in range(50)]
    db.append(_df(spark, rows))
    sizes = {}
    for d in db._bucket_dirs():
        p = os.path.join(db._samples_path, d)
        sizes[d] = sum(
            os.path.getsize(os.path.join(p, f))
            for f in os.listdir(p)
            if not f.startswith(("_", "."))
        )
    total = sum(sizes.values())
    # budget for roughly the newest 2 of 5 buckets → 3 dropped (newest-first
    # accumulation: the first bucket to exceed the budget and all older go)
    newest = sorted(sizes.items(), key=lambda kv: -int(kv[0].split("=")[1]))
    budget = newest[0][1] + newest[1][1]
    dropped = db.retain_max_bytes(budget)
    kept = sorted(int(d.split("=")[1]) for d in db._bucket_dirs())
    assert dropped == 3
    assert kept == [3000, 4000]
    assert total > budget


def test_time_retention_forgets_overlap_tracking(spark, tmp_path):
    db = _mkdb(spark, tmp_path, "ret", width=1000)
    db.append(_df(spark, [({"x": "1"}, 100, 1.0), ({"x": "1"}, 5100, 2.0)]))
    db.append(_df(spark, [({"x": "1"}, 100, 9.0)]))
    assert db.overlapping_buckets == [0]
    assert db.retain_after(5000) == 1
    assert db.overlapping_buckets == []


def test_leveled_plan_merges_filled_parent(spark, tmp_path):
    # base width 100 → ranges [100, 300, 900]; buckets 0,100,200 fill the
    # [0,300) parent and bucket 300 is the fresh one → plan = merge first
    # three at width 300 (compact_test.go:201-209 "Block to fill the
    # entire parent range appeared")
    db = _mkdb(spark, tmp_path, "lvl", width=100)
    assert db.block_ranges == [100, 300, 900]
    rows = [({"m": "a"}, t, float(t)) for t in (10, 110, 210, 310)]
    db.append(_df(spark, rows))
    los, target = db.compact_plan()
    assert (los, target) == ([0, 100, 200], 300)
    before = sorted(
        (r["t"], r["v"]) for r in db.querier(0, 400).select([L.eq("m", "a")]).collect()
    )
    assert db.auto_compact() == [[0, 100, 200]]
    buckets = sorted(int(d.split("=")[1]) for d in db._bucket_dirs())
    assert buckets == [0, 300]
    assert db.width_of(0) == 300 and db.width_of(300) == 100
    after = sorted(
        (r["t"], r["v"]) for r in db.querier(0, 400).select([L.eq("m", "a")]).collect()
    )
    assert before == after
    # pruning must still see the coarse bucket: a window entirely inside
    # its upper half starts below lo=0 only via max_bucket_width
    got = {r["t"] for r in db.querier(200, 250).select([L.eq("m", "a")]).collect()}
    assert got == {210}


def test_leveled_plan_vertical_dirty_first(spark, tmp_path):
    db = _mkdb(spark, tmp_path, "lvldirty", width=100)
    db.append(_df(spark, [({"m": "a"}, 10, 1.0), ({"m": "a"}, 110, 2.0), ({"m": "a"}, 310, 9.0)]))
    db.append(_df(spark, [({"m": "a"}, 10, 3.0)]))  # bucket 0 now dirty
    assert db.overlapping_buckets == [0]
    los, target = db.compact_plan()
    assert (los, target) == ([0], None)  # vertical rewrite in place
    db.compact_selected(los, target)
    assert db.overlapping_buckets == []
    # later-ingest-wins survived the rewrite; no read-time dedup needed now
    got = {r["t"]: r["v"] for r in db.querier(0, 400).select([L.eq("m", "a")]).collect()}
    assert got == {10: 3.0, 110: 2.0, 310: 9.0}


def test_append_into_coarse_bucket_tracks_overlap(spark, tmp_path):
    db = _mkdb(spark, tmp_path, "lvlovl", width=100)
    db.append(_df(spark, [({"m": "a"}, t, float(t)) for t in (10, 110, 210, 310)]))
    db.auto_compact()  # bucket 0 now width 300
    # a base-width append at t=150 lands in NEW dir 100 but time-overlaps
    # the coarse bucket — both must dedup at read
    db.append(_df(spark, [({"m": "a"}, 110, 42.0)]))
    assert set(db.overlapping_buckets) == {0, 100}
    got = {r["t"]: r["v"] for r in db.querier(0, 400).select([L.eq("m", "a")]).collect()}
    assert got == {10: 10.0, 110: 42.0, 210: 210.0, 310: 310.0}


def test_tombstone_heavy_block_rewritten_once(spark, tmp_path):
    db = _mkdb(spark, tmp_path, "lvlts", width=100)
    db.append(_df(spark, [({"m": "a"}, t, float(t)) for t in (10, 110, 210, 310)]))
    db.auto_compact()  # [0,300) merged, width 300 >= ranges[1]
    db.delete(0, 120, [L.eq("m", "a")])
    los, target = db.compact_plan()
    assert (los, target) == ([0], None)  # >5% tombstoned large block
    db.compact_selected(los, target)
    got = {r["t"] for r in db.querier(0, 400).select([L.eq("m", "a")]).collect()}
    assert got == {210, 310}
    # planner is satisfied: the rewritten bucket is marked tombstone-clean
    assert db.compact_plan() == ([], None)


def test_snapshot_hardlink_store(spark, tmp_path):
    db = _mkdb(spark, tmp_path, "snap", width=1000)
    db.append(_df(spark, [({"m": "a"}, 100, 1.0), ({"m": "b"}, 1100, 2.0)]))
    db.delete(0, 50, [L.eq("m", "a")])
    dest = str(tmp_path / "snap_copy")
    db.snapshot(dest)
    snap = DB.open(spark, dest)
    want = {r["t"]: r["v"] for r in db.querier(0, 9999).select([L.neq("m", "")]).collect()}
    got = {r["t"]: r["v"] for r in snap.querier(0, 9999).select([L.neq("m", "")]).collect()}
    assert got == want
    # snapshot is isolated from later writes to the origin
    db.append(_df(spark, [({"m": "a"}, 2100, 9.0)]))
    got2 = {r["t"]: r["v"] for r in snap.querier(0, 9999).select([L.neq("m", "")]).collect()}
    assert got2 == want
    with pytest.raises(ValueError):
        db.snapshot(db.path)


def test_checkpoint_drops_gc_and_trims(spark, tmp_path):
    db = _mkdb(spark, tmp_path, "ckpt", width=1000)
    db.append(_df(spark, [({"m": "old"}, 100, 1.0), ({"m": "keep"}, 2100, 2.0)]))
    db.delete(0, 2050, [L.eq("m", "keep")])  # spans the cutoff
    rep = db.checkpoint(2000)
    assert rep["partitions_dropped"] == 1 and rep["series_removed"] == 1
    # orphan series gone from enumeration
    vals = [r["value"] for r in db.label_values("m").collect()]
    assert vals == ["keep"]
    # the tombstone interval was clipped to [2000, 2050]; t=2100 is
    # outside it and survives
    got = {r["t"] for r in db.querier(0, 9999).select([L.eq("m", "keep")]).collect()}
    assert got == {2100}
    tomb = db.tombstones().collect()
    assert len(tomb) == 1 and tomb[0]["mint"] == 2000 and tomb[0]["maxt"] == 2050


def test_first_wins_amend_policy(spark, tmp_path):
    # order_col gives the reference's first-wins (head.go:1697-1698):
    # the earliest arrival at (series, t) defines v, later amends reject
    db = _mkdb(spark, tmp_path, "firstwins", width=1000)
    rows = spark.createDataFrame(
        [
            ({"x": "1"}, 100, 5.0, 0),
            ({"x": "1"}, 100, 1.0, 1),  # amend: arrives later, rejected
            ({"x": "1"}, 200, 9.0, 2),
            ({"x": "1"}, 200, 9.0, 3),  # exact duplicate, dropped
        ],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE, seq LONG",
    )
    rep = db.append(rows, order_col="seq", report=True)
    got = {r["t"]: r["v"] for r in db.querier(0, 1000).select([L.eq("x", "1")]).collect()}
    assert got == {100: 5.0, 200: 9.0}
    assert rep.duplicates_dropped == 1
    assert rep.amends_rejected == 1


def test_tombstones_total(spark, tmp_path):
    db = _mkdb(spark, tmp_path, "tstotal", width=1000)
    db.append(_df(spark, [({"x": "1"}, 100, 1.0), ({"x": "2"}, 2100, 2.0)]))
    assert db.tombstones_total() == 0
    db.delete(0, 500, [L.eq("x", "1")])
    db.delete(2000, 2500, [L.eq("x", "2")])
    assert db.tombstones_total() == 2


def test_overlapping_block_report(spark, tmp_path):
    # a base-width bucket appended inside a level-promoted coarse bucket
    # must show up as an inter-block overlap in the sweep-line report
    db = _mkdb(spark, tmp_path, "ovreport", width=1000)
    db.append(_df(spark, [({"x": "1"}, 100, 1.0), ({"x": "1"}, 1100, 2.0)]))
    db.compact_selected([0, 1000], target_width_ms=2000)  # one [0,2000) block
    assert db.overlapping_block_report() == {}
    db.append(_df(spark, [({"x": "2"}, 1200, 3.0)]))  # new dir t_bucket=1000
    rep = db.overlapping_block_report()
    assert (1000, 2000) in rep
    assert sorted(rep[(1000, 2000)]) == ["0", "1000"]


def test_overlapping_blocks_sweepline():
    from tsdb_spark.compaction import BlockMeta, overlapping_blocks

    b = lambda lo, hi, d: BlockMeta(mint=lo, maxt=hi, dir=d)
    # disjoint
    assert overlapping_blocks([b(0, 10, "a"), b(10, 20, "b")]) == {}
    # simple pair overlap
    got = overlapping_blocks([b(0, 10, "a"), b(5, 20, "b")])
    assert {k: [m.dir for m in v] for k, v in got.items()} == {(5, 10): ["a", "b"]}
    # three blocks, overlap depth changes mid-range: [5,8) covered by
    # a+b, [8,10) by a+b+c, [10,12) by b+c
    got = overlapping_blocks([b(0, 10, "a"), b(5, 12, "b"), b(8, 14, "c")])
    assert {k: [m.dir for m in v] for k, v in got.items()} == {
        (5, 8): ["a", "b"],
        (8, 10): ["a", "b", "c"],
        (10, 12): ["b", "c"],
    }


def test_dump_and_ls(spark, tmp_path):
    db = _mkdb(spark, tmp_path, "dumpls", width=1000)
    db.append(_df(spark, [({"x": "1"}, 100, 1.0), ({"x": "2"}, 1100, 2.0)]))
    rows = db.dump().collect()
    assert [(r["labels_str"], r["t"], r["v"]) for r in rows] == [
        ('{x="1"}', 100, 1.0),
        ('{x="2"}', 1100, 2.0),
    ]
    ls = {r["t_bucket"]: r for r in db.ls().collect()}
    assert set(ls) == {0, 1000}
    assert ls[0]["num_samples"] == 1 and ls[0]["width_ms"] == 1000
    assert not ls[0]["overlapping"]
    # promote to a coarse bucket, then overlap it: ls must show both
    db.compact_selected([0, 1000], target_width_ms=2000)
    db.append(_df(spark, [({"x": "3"}, 1200, 3.0)]))
    ls2 = {r["t_bucket"]: r for r in db.ls().collect()}
    assert ls2[0]["width_ms"] == 2000 and ls2[0]["overlapping"]


def test_rollup_artifact_freshness(spark, tmp_path):
    db = _mkdb(spark, tmp_path, "roll", width=1000)
    db.append(_df(spark, [({"x": "1"}, 100, 1.0), ({"x": "1"}, 600, 2.0),
                          ({"x": "1"}, 1100, 4.0), ({"x": "2"}, 150, 8.0)]))
    db.materialize_rollup(1000)

    def rows():
        return {
            (r["series_id"], r["w_start"]): (r["n"], r["min_v"], r["max_v"], r["sum_v"])
            for r in db.rollup(0, 1999, 1000).collect()
        }

    fresh = rows()
    assert {k[1] for k in fresh} == {0, 1000}
    assert sorted(v for k, v in fresh.items() if k[1] == 0) == [
        (1, 8.0, 8.0, 8.0), (2, 1.0, 2.0, 3.0)]
    # fresh ⇒ the plan scans the artifact (its physical columns appear in
    # the scan schema), with no aggregate over raw samples
    plan = db.rollup(0, 1999, 1000)._jdf.queryExecution().executedPlan().toString()
    assert "w_start:bigint" in plan and "HashAggregate" not in plan

    # a delete makes the artifact stale: rollup must recompute on the fly
    db.delete(0, 999, [L.eq("x", "2")])
    stale = rows()
    assert sorted(v for k, v in stale.items() if k[1] == 0) == [(2, 1.0, 2.0, 3.0)]
    plan = db.rollup(0, 1999, 1000)._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    # re-materialize folds the tombstone in and is served again
    db.materialize_rollup(1000)
    assert rows() == stale
    # partial windows are excluded: maxt mid-window drops window 1000
    assert {r["w_start"] for r in db.rollup(0, 1500, 1000).collect()} == {0}


def test_vacuum_defragments_without_changing_data(spark, tmp_path):
    db = _mkdb(spark, tmp_path, "vac", width=1000)
    # 10 tiny appends into the same bucket = 10+ files (streaming shape);
    # one of them creates a genuine vertical overlap that must survive
    for i in range(10):
        db.append(_df(spark, [({"x": "1"}, 100 + (i % 9), float(i))]))
    assert db.overlapping_buckets == [0]

    def n_files(lo):
        part = os.path.join(db._samples_path, f"t_bucket={lo}")
        return sum(1 for f in os.listdir(part) if not f.startswith(("_", ".")))

    before = {r["t"]: r["v"] for r in db.querier(0, 999).select([L.eq("x", "1")]).collect()}
    assert n_files(0) >= 10
    assert db.vacuum(max_files_per_bucket=8) == [0]
    assert n_files(0) <= 8
    # second pass: nothing left to do
    assert db.vacuum(max_files_per_bucket=8) == []
    # rows (incl. the overlap resolution at read) identical; flag intact
    after = {r["t"]: r["v"] for r in db.querier(0, 999).select([L.eq("x", "1")]).collect()}
    assert after == before
    assert db.overlapping_buckets == [0]


def test_open_tolerates_crash_orphans(spark, tmp_path):
    # a crash between the rewrite and the swap leaves *.tmp/*.old/*.lvl
    # siblings in the store root — opening and querying must ignore them
    db = _mkdb(spark, tmp_path, "orph", width=1000)
    db.append(_df(spark, [({"x": "1"}, 100, 1.0), ({"x": "1"}, 1100, 2.0)]))
    root = db.path
    for d in ("samples.lvl.deadbeef", "samples.tmp.deadbeef",
              "samples.old.deadbeef", "postings.tmp.deadbeef"):
        os.makedirs(os.path.join(root, d, "t_bucket=0"), exist_ok=True)
    db2 = DB.open(spark, root)
    got = {r["t"]: r["v"] for r in db2.querier(0, 9999).select([L.eq("x", "1")]).collect()}
    assert got == {100: 1.0, 1100: 2.0}
    assert sorted(int(d.split("=")[1]) for d in db2._bucket_dirs()) == [0, 1000]


def test_delete_masks_reappended_samples_until_clean(spark, tmp_path):
    # reference head tombstones apply at READ time to any sample in the
    # interval — including samples appended after the Delete call — until
    # a rewrite drops the tombstone (head.go Delete + tombstone read path)
    db = _mkdb(spark, tmp_path, "remask", width=1000)
    db.append(_df(spark, [({"x": "1"}, 100, 1.0), ({"x": "1"}, 900, 2.0)]))
    db.delete(0, 500, [L.eq("x", "1")])
    db.append(_df(spark, [({"x": "1"}, 200, 9.0)]))  # lands inside the interval
    got = {r["t"]: r["v"] for r in db.querier(0, 999).select([L.eq("x", "1")]).collect()}
    assert got == {900: 2.0}  # masked, like the original
    db.clean_tombstones()
    got = {r["t"]: r["v"] for r in db.querier(0, 999).select([L.eq("x", "1")]).collect()}
    assert got == {900: 2.0}  # the rewrite dropped the masked rows for good
    db.append(_df(spark, [({"x": "1"}, 300, 7.0)]))  # tombstone gone → visible
    got = {r["t"]: r["v"] for r in db.querier(0, 999).select([L.eq("x", "1")]).collect()}
    assert got == {300: 7.0, 900: 2.0}


def test_inplace_rewrite_keeps_promoted_width(spark, tmp_path):
    # a level-promoted bucket rewritten IN PLACE (tombstone/vertical
    # rewrite, target_width=None) must keep its coarse width: dropping
    # the bucket_widths entry makes pruning skip the bucket's upper half
    # and lets retention delete live data
    db = _mkdb(spark, tmp_path, "lvlwidth", width=100)
    db.append(_df(spark, [({"m": "a"}, t, float(t)) for t in (10, 110, 210, 310)]))
    db.auto_compact()  # buckets 0 (width 300) + 310's home
    assert db.width_of(0) == 300
    db.delete(0, 20, [L.eq("m", "a")])
    los, target = db.compact_plan()
    assert 0 in los and target is None
    db.compact_selected(los, target)
    assert db.width_of(0) == 300  # was dropped before the fix
    got = {r["t"] for r in db.querier(150, 400).select([L.eq("m", "a")]).collect()}
    assert got == {210, 310}
    assert db.retain_after(150) == 0  # bucket 0 still spans past 150
    got = {r["t"] for r in db.querier(0, 400).select([L.eq("m", "a")]).collect()}
    assert got == {110, 210, 310}


def test_open_migrates_v1_global_overlap_flag(spark, tmp_path):
    import json

    db = _mkdb(spark, tmp_path, "v1mig", width=1000)
    db.append(_df(spark, [({"x": "1"}, 100, 1.0), ({"x": "1"}, 1100, 2.0)]))
    db.append(_df(spark, [({"x": "1"}, 100, 9.0)]))  # bucket 0 dirty
    meta_path = str(tmp_path / "v1mig" / "_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    # rewrite the meta as a round-1 store would have written it
    meta.pop("overlapping_buckets", None)
    meta["overlapping"] = True
    meta["version"] = 1
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    db2 = DB.open(spark, str(tmp_path / "v1mig"))
    # conservative migration: every live bucket marked overlapping, so
    # vertical dedup still runs (later-wins visible)
    assert db2.meta["version"] == 2
    assert set(db2.overlapping_buckets) == {0, 1000}
    got = {r["t"]: r["v"] for r in db2.querier(0, 2000).select([L.eq("x", "1")]).collect()}
    assert got == {100: 9.0, 1100: 2.0}
    meta["version"] = 3
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError):
        DB.open(spark, str(tmp_path / "v1mig"))


def test_strict_order_append_clears_ts_clean_mark(spark, tmp_path):
    # ts_clean marks tell the planner "tombstones already applied here";
    # ANY append into the bucket (including the strict-order path) must
    # clear the mark so the planner re-checks it
    db = _mkdb(spark, tmp_path, "tsclean", width=1000)
    db.append(
        _df(spark, [({"x": "1"}, 100, 1.0), ({"x": "1"}, 800, 1.5), ({"x": "1"}, 1100, 2.0)])
    )
    db.delete(0, 500, [L.eq("x", "1")])
    db.compact_selected([0], None)
    assert 0 in db.meta.get("ts_clean_buckets", [])
    db.append(_df(spark, [({"x": "2"}, 900, 3.0)]), strict_order=True)
    assert 0 not in db.meta.get("ts_clean_buckets", [])


def test_clean_tombstones_covers_promoted_bucket(spark, tmp_path):
    # affected-bucket selection must intersect tombstone intervals with
    # each dir's TRUE span: a delete inside the upper half of a coarse
    # (level-promoted) bucket has no base-grid dir of its own; missing it
    # would drop the tombstone file without the rewrite and resurrect
    # the masked samples
    db = _mkdb(spark, tmp_path, "cleanlvl", width=100)
    db.append(_df(spark, [({"m": "a"}, t, float(t)) for t in (10, 110, 210, 310)]))
    db.auto_compact()  # bucket 0 promoted to width 300
    assert db.width_of(0) == 300
    db.delete(150, 250, [L.eq("m", "a")])  # upper half of the coarse bucket
    db.clean_tombstones()
    assert not os.path.isdir(db._tombstones_path)
    got = {r["t"] for r in db.querier(0, 400).select([L.eq("m", "a")]).collect()}
    assert got == {10, 110, 310}  # 210 gone for good, not resurrected


def test_compaction_lineage_levels_and_sources(spark, tmp_path):
    """BlockMeta.Compaction parity (block.go:171-200): a width-merge
    records level = max(source levels) + 1 and its source buckets; in-place
    rewrites keep lineage; retention prunes lineage of dropped buckets."""
    from tsdb_spark.db import DB

    W = 3_600_000
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=W)
    rows = [
        ({"__name__": "m"}, t, float(t))
        for b in range(3)
        for t in range(b * W, b * W + W, 300_000)
    ]
    db.append(spark.createDataFrame(rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE"))
    assert db.bucket_levels == {}  # fresh buckets are implicitly level 1
    ls = {r["t_bucket"]: r for r in db.ls().collect()}
    assert all(r["level"] == 1 and r["sources"] == [] for r in ls.values())

    db.compact_selected([0, W, 2 * W], target_width_ms=3 * W)
    assert db.bucket_levels == {0: 2}
    assert db.bucket_sources == {0: [0, W, 2 * W]}
    (row,) = db.ls().collect()
    assert row["level"] == 2 and sorted(row["sources"]) == [0, W, 2 * W]

    # a second-generation merge accumulates the original sources
    db.append(
        spark.createDataFrame(
            [({"__name__": "m"}, 3 * W + 1, 1.0)],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
        )
    )
    db.compact_selected([0, 3 * W], target_width_ms=9 * W)
    assert db.bucket_levels == {0: 3}
    assert db.bucket_sources == {0: [0, W, 2 * W, 3 * W]}

    # dropping the bucket prunes its lineage
    db.retain_after(10 * W)
    assert db.bucket_levels == {} and db.bucket_sources == {}


def test_multi_window_merge_attributes_sources_per_output(spark, tmp_path):
    # ADVICE r3: a width-merge that emits several coarse buckets must
    # attribute to each output only the source buckets its window covers
    db = _mkdb(spark, tmp_path, "multiwin", width=1000)
    rows = [({"m": "a"}, t, float(t)) for t in range(0, 4000, 500)]
    db.append(_df(spark, rows))
    db.compact_selected([0, 1000, 2000, 3000], target_width_ms=2000)
    assert db.bucket_sources == {0: [0, 1000], 2000: [2000, 3000]}
    assert db.bucket_levels == {0: 2, 2000: 2}


def test_emptied_bucket_sheds_stale_lineage(spark, tmp_path):
    # ADVICE r3: a rewrite that empties a lineage-carrying bucket must
    # prune its meta — a later fresh bucket at the same lo must not
    # inherit the old level/sources in ls()
    db = _mkdb(spark, tmp_path, "stale", width=1000)
    db.append(_df(spark, [({"m": "a"}, t, float(t)) for t in (100, 1100)]))
    db.compact_selected([0, 1000], target_width_ms=2000)  # level-2 at lo=0
    assert db.bucket_levels == {0: 2}
    db.delete(0, 2000, [L.eq("m", "a")])  # tombstone the whole block
    db.compact_selected([0], None)  # in-place rewrite drops every row
    assert db.bucket_levels == {} and db.bucket_sources == {}
    assert db.bucket_widths == {}
    # fresh append at the same lo starts a clean level-1 bucket
    db.append(_df(spark, [({"m": "b"}, 100, 1.0)]))
    (row,) = db.ls().collect()
    assert row["level"] == 1 and row["sources"] == [] and row["width_ms"] == 1000


def test_replay_append_matches_sequential(spark, tmp_path):
    # one seq_col replay == k sequential appends: same query results,
    # same later-wins resolution vs existing data, same seq advance
    a = _mkdb(spark, tmp_path, "replay_a", width=1000)
    b = _mkdb(spark, tmp_path, "replay_b", width=1000)
    batches = [
        [({"x": "1"}, 100, 1.0), ({"x": "2"}, 150, 2.0)],
        [({"x": "1"}, 100, 7.0)],  # cross-batch collision → later batch wins
        [({"x": "1"}, 300, 3.0), ({"x": "3"}, 2100, 4.0)],
    ]
    for rows in batches:
        b.append(_df(spark, rows))
    replay = spark.createDataFrame(
        [(lbl, t, v, i) for i, rows in enumerate(batches) for (lbl, t, v) in rows],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE, b LONG",
    )
    rep = a.append(replay, seq_col="b", report=True)
    assert rep.amends_rejected == 1  # the collision resolved at write
    assert a.meta["next_ingest_seq"] == b.meta["next_ingest_seq"]
    for db in (a, b):
        got = sorted(
            (r["labels_str"], r["t"], r["v"])
            for r in db.querier(0, 9999).select([L.neq("x", "")]).collect()
        )
        assert got == [
            ('{x="1"}', 100, 7.0),
            ('{x="1"}', 300, 3.0),
            ('{x="2"}', 150, 2.0),
            ('{x="3"}', 2100, 4.0),
        ]
    # replay resolves collisions at write: its buckets never enter the
    # overlap ledger, while k separate appends must (reads dedup there)
    assert a.overlapping_buckets == []
    assert b.overlapping_buckets == [0]
    # later-wins vs existing data stays per logical batch: a replayed
    # batch overwriting a pre-existing (series, t) must win the vertical
    # dedup exactly as a separate later append would
    c = _mkdb(spark, tmp_path, "replay_c", width=1000)
    c.append(_df(spark, [({"x": "1"}, 100, 10.0)]))
    c.append(
        spark.createDataFrame(
            [({"x": "1"}, 100, 20.0, 0)],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE, b LONG",
        ),
        seq_col="b",
    )
    got = {r["t"]: r["v"] for r in c.querier(0, 999).select([L.eq("x", "1")]).collect()}
    assert got == {100: 20.0}


def test_replay_append_fragments_files_per_batch(spark, tmp_path):
    # replay file layout mirrors k separate appends: each logical batch
    # writes its own file(s) inside the bucket it touches
    db = _mkdb(spark, tmp_path, "replay_frag", width=100000)
    db.append(
        spark.createDataFrame(
            [({"m": "frag", "i": str(i)}, 1000 + i, float(i), i) for i in range(5)],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE, b LONG",
        ),
        seq_col="b",
        validate=False,
    )
    bucket_dir = os.path.join(db._samples_path, "t_bucket=0")
    files = [f for f in os.listdir(bucket_dir) if f.endswith(".parquet")]
    assert len(files) >= 2  # fragmented, not one coalesced file
    seqs = {r["ingest_seq"] for r in spark.read.parquet(bucket_dir).collect()}
    assert seqs == {1, 2, 3, 4, 5}


def test_rollup_at_step_artifact_vs_fallback(spark, tmp_path):
    # the re-aggregated artifact answer must equal the on-the-fly answer
    # (and the fallback path must be taken when no width divides)
    from tsdb_spark.db import DB

    W = 3_600_000
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=6 * W)
    rows = spark.createDataFrame(
        [({"m": "x"}, i * 600_000, float(i % 17)) for i in range(72)],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
    )
    db.append(rows)
    db.materialize_rollup(W)
    assert db.fresh_rollup_widths() == [W]

    def norm(df):
        return sorted(
            (r["series_id"], r["w_start"], r["n"], r["min_v"], r["max_v"], round(r["sum_v"], 6))
            for r in df.collect()
        )

    served = norm(db.rollup_at_step(0, 12 * W - 1, 2 * W))   # 2h from 1h artifact
    fallback = norm(db.rollup(0, 12 * W - 1, 2 * W))          # direct expression
    assert served == fallback and len(served) > 0
    # step not divisible by any artifact -> fallback, still correct
    odd = norm(db.rollup_at_step(0, 12 * W - 1, 90 * 60 * 1000))
    assert odd == norm(db.rollup(0, 12 * W - 1, 90 * 60 * 1000))
    # UNALIGNED maxt: the re-agg path must exclude the partial edge
    # window exactly like the direct path does
    ragged = norm(db.rollup_at_step(0, 11 * W, 2 * W))
    assert ragged == norm(db.rollup(0, 11 * W, 2 * W))
    # append invalidates freshness
    db.append(rows.limit(1).withColumn("t", F.lit(100 * W)))
    assert db.fresh_rollup_widths() == []


def test_refresh_rollup_rewrites_only_dirty_partitions(spark, tmp_path):
    from tsdb_spark.db import DB

    W = 3_600_000
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=W)

    def rows(t0, n):
        return spark.createDataFrame(
            [({"m": "x"}, t0 + i * 60_000, float(i)) for i in range(n)],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
        )

    db.append(rows(0, 180))          # buckets 0,1,2
    db.materialize_rollup(W)
    assert db.fresh_rollup_widths() == [W]
    art = db._rollup_dir(W)
    files_before = {
        d: sorted(os.listdir(os.path.join(art, d)))
        for d in os.listdir(art) if d.startswith("t_bucket=")
    }
    # dirty ONLY bucket 2 with a second append
    db.append(rows(2 * W + 5, 10))
    assert db.fresh_rollup_widths() == []        # stale now
    rewritten = db.refresh_rollup(W)
    assert rewritten == [2 * W], rewritten
    files_after = {
        d: sorted(os.listdir(os.path.join(art, d)))
        for d in os.listdir(art) if d.startswith("t_bucket=")
    }
    # untouched partitions keep their exact files; the dirty one changed
    assert files_after[f"t_bucket=0"] == files_before["t_bucket=0"]
    assert files_after[f"t_bucket={W}"] == files_before[f"t_bucket={W}"]
    assert files_after[f"t_bucket={2*W}"] != files_before[f"t_bucket={2*W}"]
    # the refreshed artifact serves the exact aggregate
    assert db.fresh_rollup_widths() == [W]
    got = sorted(
        (r["w_start"], r["n"]) for r in db.rollup(0, 3 * W - 1, W).collect()
    )
    exp = sorted(
        (r["w_start"], r["n"]) for r in db._rollup_frame(W)
        .filter((F.col("w_start") >= 0) & (F.col("w_start") + W - 1 <= 3 * W - 1))
        .select("w_start", "n").collect()
    )
    assert got == exp
    # delete bumps data_seq -> refresh falls back to a full rebuild
    db.delete(0, 1, [L.eq("m", "x")])
    db.refresh_rollup(W)
    assert db.fresh_rollup_widths() == [W]


def test_refresh_rollup_straddling_window_low_edge(spark, tmp_path):
    # width NOT dividing block width: a sample appended at block bucket b
    # updates the rollup window w0 = b - b%width < b, whose artifact
    # partition is the one BELOW b's. refresh_rollup must rewrite that
    # partition too, and the refreshed artifact must equal a fresh
    # full recompute (the pre-fix code marked only b's partition, served
    # the stale straddling window as fresh).
    W = 45 * 60 * 1000          # 45 min rollup
    BW = 2 * 3_600_000          # 2 h blocks; grid = max(BW, W) = BW
    db = DB.create(spark, str(tmp_path / "straddle"), block_width_ms=BW)
    db.append(_df(spark, [({"m": "x"}, t, 1.0) for t in range(0, 4 * BW, W)]))
    db.materialize_rollup(W)
    # dirty ONLY block bucket BW: t=BW+60s lands in window 1.5h..2.25h,
    # which starts inside artifact partition 0
    db.append(_df(spark, [({"m": "x"}, BW + 60_000, 5.0)]))
    rewritten = db.refresh_rollup(W)
    assert 0 in rewritten and BW in rewritten, rewritten
    assert db.fresh_rollup_widths() == [W]

    def norm(df):
        return sorted(
            (r["series_id"], r["w_start"], r["n"], r["min_v"], r["max_v"],
             round(r["sum_v"], 6))
            for r in df.select(
                "series_id", "w_start", "n", "min_v", "max_v", "sum_v"
            ).collect()
        )

    served = norm(db.rollup(-(2**62), 2**62 - 1, W))
    fresh = norm(db._rollup_frame(W))
    assert served == fresh
    # the straddling window itself carries the new sample
    w0 = BW - BW % W
    row = [r for r in served if r[1] == w0]
    assert row and row[0][2] == 2 and row[0][5] == 6.0, row


def test_refresh_rollup_scan_is_partition_pruned(spark, tmp_path):
    # the incremental refresh must push the dirty span into the raw
    # samples scan (partition pruning), not re-aggregate the full store
    # and filter post-hoc on the derived t_bucket
    W = 3_600_000
    db = DB.create(spark, str(tmp_path / "pruned"), block_width_ms=W)
    db.append(_df(spark, [({"m": "x"}, i * W + 1, 1.0) for i in range(8)]))
    db.materialize_rollup(W)
    db.append(_df(spark, [({"m": "x"}, 5 * W + 2, 2.0)]))
    grid = max(db.block_width_ms, W)
    plan = db._rollup_frame(W, 5 * W, 5 * W + grid + W - 1)._jdf.queryExecution().executedPlan().toString()
    import re as _re
    scans = [m for m in _re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)]
    samples_scans = [s for s in scans if "t_bucket" in s]
    assert samples_scans, f"no t_bucket partition filter in plan:\n{plan[:2000]}"
    rewritten = db.refresh_rollup(W)
    assert rewritten == [5 * W], rewritten
    assert db.fresh_rollup_widths() == [W]


def test_tombstones_mask_side_tables_and_clean_rewrites(spark, tmp_path):
    """delete() masks histogram and exemplar rows at read like samples
    (F12); clean_tombstones rewrites the side tables too, so dropping
    the tombstones file never resurrects masked rows."""
    from tsdb_spark.nativehist import build_histograms

    db = _mkdb(spark, tmp_path, "side", width=1000)
    db.append(_df(spark, [
        ({"__name__": "m", "s": "a"}, 100, 1.0),
        ({"__name__": "m", "s": "a"}, 1500, 2.0),
        ({"__name__": "m", "s": "b"}, 100, 3.0),
    ]))
    obs = spark.createDataFrame(
        [({"__name__": "m", "s": "a"}, 100, 0.5),
         ({"__name__": "m", "s": "a"}, 1500, 1.5),
         ({"__name__": "m", "s": "b"}, 100, 2.5)],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
    ).withColumn("labels_str", L.labels_str_expr("labels"))
    db.append_histograms(
        build_histograms(obs, 1000).select("labels", "t", "h"))
    db.append_exemplars(spark.createDataFrame(
        [({"__name__": "m", "s": "a"}, 100, 1.0, {"trace_id": "t1"}),
         ({"__name__": "m", "s": "a"}, 1500, 2.0, {"trace_id": "t2"}),
         ({"__name__": "m", "s": "b"}, 100, 3.0, {"trace_id": "t3"})],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE, "
        "exemplar MAP<STRING,STRING>"))

    def hist_ts():
        return sorted(
            (r["labels"]["s"], r["t"])
            for r in db.hist_frame(0, 10_000).collect())

    def ex_ids():
        return sorted(
            r["exemplar"]["trace_id"]
            for r in db.exemplars_frame(0, 10_000).collect())

    # delete series s=a within [0, 1000]: masks the first hist window
    # (stamped at its END boundary t=1000) and the t1 exemplar; keeps
    # the later window/exemplar and everything of s=b
    db.delete(0, 1000, [L.eq("s", "a")])
    assert hist_ts() == [("a", 2000), ("b", 1000)]
    assert ex_ids() == ["t2", "t3"]

    # clean: tombstones file goes away, the masked rows must NOT return
    db.clean_tombstones()
    assert not os.path.isdir(db._tombstones_path)
    assert hist_ts() == [("a", 2000), ("b", 1000)]
    assert ex_ids() == ["t2", "t3"]


def test_concurrent_appends_are_serialized(spark, tmp_path):
    """Two driver threads appending to one store concurrently used to
    corrupt each other's Hadoop committer staging dir (TASK_WRITE_FAILED
    observed live in the scrape+rules serve mode); the store's _mutex
    serializes mutators, so every batch lands and reads agree."""
    import threading

    db = _mkdb(spark, tmp_path, "conc", width=1000)
    errs = []

    def writer(tag, n):
        try:
            for i in range(n):
                db.append(_df(spark, [
                    ({"m": tag}, i * 100, float(i)),
                ]))
        except Exception as e:  # noqa: BLE001 — the test asserts none
            errs.append(e)

    threads = [
        threading.Thread(target=writer, args=("a", 4)),
        threading.Thread(target=writer, args=("b", 4)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    rows = db.querier(-(10**9), 10**9).select([]).collect()
    got = {(r["labels_str"], r["t"]) for r in rows}
    assert len(got) == 8
