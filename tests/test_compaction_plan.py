"""Plan-table tests mirroring the reference's TestSplitByRange
(compact_test.go:33-137) and TestLeveledCompactor_plan
(compact_test.go:164-360). Pure logic — no Spark session needed."""

import pytest

from tsdb_spark.compaction import (
    BlockMeta,
    exponential_ranges,
    plan,
    select_overlapping,
    split_by_range,
)

RANGES = [20, 60, 180, 540, 1620]


def B(name, mint, maxt, num_series=0, num_tombstones=0, failed=False, dirty=False):
    return BlockMeta(
        mint=mint,
        maxt=maxt,
        dir=name,
        num_series=num_series,
        num_tombstones=num_tombstones,
        failed=failed,
        dirty=dirty,
    )


def names(blocks):
    return [b.dir for b in blocks]


def test_exponential_ranges():
    assert exponential_ranges(20, 5, 3) == [20, 60, 180, 540, 1620]
    assert exponential_ranges(7_200_000, 3, 3) == [7_200_000, 21_600_000, 64_800_000]


@pytest.mark.parametrize(
    "tr,ranges,expected",
    [
        # compact_test.go:36-110 table, spans as (mint, maxt)
        (60, [(0, 10)], [[(0, 10)]]),
        (60, [(0, 60)], [[(0, 60)]]),
        (60, [(0, 10), (9, 15), (30, 60)], [[(0, 10), (9, 15), (30, 60)]]),
        (60, [(70, 90), (125, 130), (130, 180), (1000, 1001)],
         [[(70, 90)], [(125, 130), (130, 180)], [(1000, 1001)]]),
        # mis-aligned or too-large blocks are ignored
        (60, [(50, 70), (70, 80)], [[(70, 80)]]),
        (72, [(0, 144), (144, 216), (216, 288)], [[(144, 216)], [(216, 288)]]),
        # negative alignment edge cases
        (60, [(-10, -5)], [[(-10, -5)]]),
        (60, [(-60, -50), (-10, -5)], [[(-60, -50), (-10, -5)]]),
        (60, [(-60, -50), (-10, -5), (0, 15)],
         [[(-60, -50), (-10, -5)], [(0, 15)]]),
    ],
)
def test_split_by_range(tr, ranges, expected):
    blocks = [BlockMeta(mint=lo, maxt=hi) for lo, hi in ranges]
    got = [[(b.mint, b.maxt) for b in g] for g in split_by_range(blocks, tr)]
    assert got == expected


# TestLeveledCompactor_plan (compact_test.go:164-330), same ranges [20,60,180,540,1620]
PLAN_CASES = {
    "outside range": ([B("1", 0, 20)], []),
    "wait for four blocks": ([B("1", 0, 20), B("2", 20, 40)], []),
    "ignore fresh one": (
        [B("1", 0, 20), B("2", 20, 40), B("3", 40, 60)], []),
    "full parent range appeared": (
        [B("1", 0, 20), B("2", 20, 40), B("3", 40, 60), B("4", 60, 80)],
        ["1", "2", "3"]),
    "gap, fresh still ignored": (
        [B("1", 0, 20), B("2", 20, 40), B("3", 60, 80)], []),
    "gap closed by newer block": (
        [B("1", 0, 20), B("2", 20, 40), B("3", 60, 80), B("4", 80, 100)],
        ["1", "2"]),
    "mixed levels, 5 fresh": (
        [B("1", 0, 20), B("2", 20, 40), B("3", 40, 60), B("4", 60, 120),
         B("5", 120, 180)],
        ["1", "2", "3"]),
    "compact 20+60+60 across gap": (
        [B("2", 20, 40), B("4", 60, 120), B("5", 960, 980), B("6", 120, 180),
         B("7", 720, 960)],
        ["2", "4", "6"]),
    "no tombstone rewrite without fresh block": (
        [B("1", 0, 540, num_series=10, num_tombstones=3)], []),
    "tombstone rewrite when fresh appears": (
        [B("1", 0, 540, num_series=10, num_tombstones=3), B("2", 540, 560)],
        ["1"]),
    "small blocks never tombstone-rewritten": (
        [B("1", 0, 60, num_series=10, num_tombstones=3), B("2", 60, 80)], []),
    "empty block does not loop forever": (
        [B("1", 0, 540, num_series=0, num_tombstones=0), B("2", 540, 560)], []),
    "fresh is max maxt not newest ulid": (
        [B("5", 0, 360), B("6", 540, 560), B("7", 360, 420), B("8", 420, 540)],
        ["7", "8"]),
    "overlapping blocks 1": (
        [B("1", 0, 20), B("2", 19, 40), B("3", 40, 60)], ["1", "2"]),
    "overlapping blocks 2": (
        [B("1", 0, 20), B("2", 20, 40), B("3", 30, 50)], ["2", "3"]),
    "overlapping blocks 3": (
        [B("1", 0, 20), B("2", 10, 40), B("3", 30, 50)], ["1", "2", "3"]),
    "failed block blocks its group": (
        [B("1", 0, 20, failed=True), B("2", 20, 40), B("3", 40, 60),
         B("4", 60, 80)], []),
}


@pytest.mark.parametrize("name", PLAN_CASES)
def test_plan_table(name):
    blocks, expected = PLAN_CASES[name]
    assert names(plan(blocks, RANGES)) == expected


def test_plan_dirty_buckets_first():
    # our vertical-overlap rendering: contiguous run of dirty buckets wins
    blocks = [
        B("1", 0, 20), B("2", 20, 40, dirty=True), B("3", 40, 60, dirty=True),
        B("4", 80, 100, dirty=True), B("5", 100, 120),
    ]
    assert names(plan(blocks, RANGES)) == ["2", "3"]


def test_select_overlapping_cluster_stops():
    blocks = [B("1", 0, 20), B("2", 19, 40), B("3", 50, 60), B("4", 55, 70)]
    assert names(select_overlapping(blocks)) == ["1", "2"]


def test_contained_overlap_group_merges_at_own_span(spark, tmp_path):
    """Seed-367 regression: base dirs appended INSIDE a promoted coarse
    bucket must plan a re-merge at the group's own span — the old rule
    (target strictly wider than every member) forced a width whose
    aligned window swallowed live buckets outside the group and tripped
    the clobber guard mid-auto_compact."""
    from tsdb_spark import eq
    from tsdb_spark.db import DB

    W = 1000
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=W)

    def rows(ts):
        return spark.createDataFrame(
            [({"m": "x"}, t, float(t)) for t in ts],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
        )

    # base buckets 0..8, then promote [3000,6000) to one coarse bucket
    db.append(rows(range(0, 9000, 500)))
    db.compact_selected([3000, 4000, 5000], 3000)
    assert db.bucket_widths == {3000: 3000}
    # new base appends INSIDE the promoted window -> contained overlap
    db.append(rows([4100, 5100]))
    assert set(db.overlapping_buckets) >= {3000, 4000, 5000}
    los, width = db.compact_plan()
    # planning must converge without ever clobbering a live bucket
    rounds = db.auto_compact()
    assert rounds, "planner found nothing to do on an overlapping layout"
    assert db.overlapping_buckets == []
    got = sorted(
        r["t"] for r in db.querier(0, 10**9).select([eq("m", "x")]).select("t").collect()
    )
    assert got == sorted(set(range(0, 9000, 500)) | {4100, 5100})
