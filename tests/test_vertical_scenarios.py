"""TestVerticalCompaction scenario table transcribed (db_test.go:1793-2060,
cases 0-4): overlapping source blocks, expected merged samples.

Precedence note: the reference's compactor merges blocks sorted by mint
with the later-mint block winning duplicate timestamps (compact.go
populateBlock chains mergedVerticalSeriesSet with b = next block).
Our store's precedence is later-INGEST-wins (explicit ingest_seq);
appending the scenario blocks in mint order makes the two rules
coincide — which is exactly the order the reference's merger processes
them in. Each case is checked twice: at read time (vertical dedup over
the overlapping buckets) and after compaction (physical merge),
plus the overlap report (expOverlappingBlocks analog).
"""

import pytest

from tsdb_spark import labels as L
from tsdb_spark.db import DB

# each case: list of blocks (in mint order), each block = [(t, v), ...];
# expected merged [(t, v), ...] — values transcribed verbatim
CASES = [
    # Case 0: |------|
    #             |---------|
    (
        [
            [(0, 0), (1, 0), (2, 0), (4, 0), (5, 0), (7, 0), (8, 0), (9, 0)],
            [(3, 99), (5, 99), (6, 99), (7, 99), (8, 99), (9, 99), (10, 99),
             (11, 99), (12, 99), (13, 99), (14, 99)],
        ],
        [(0, 0), (1, 0), (2, 0), (3, 99), (4, 0), (5, 99), (6, 99), (7, 99),
         (8, 99), (9, 99), (10, 99), (11, 99), (12, 99), (13, 99), (14, 99)],
    ),
    # Case 1: |---------------|
    #             |-------|
    (
        [
            [(0, 0), (1, 0), (2, 0), (4, 0), (5, 0), (7, 0), (8, 0), (9, 0),
             (11, 0), (13, 0), (17, 0)],
            [(3, 99), (5, 99), (6, 99), (7, 99), (8, 99), (9, 99), (10, 99)],
        ],
        [(0, 0), (1, 0), (2, 0), (3, 99), (4, 0), (5, 99), (6, 99), (7, 99),
         (8, 99), (9, 99), (10, 99), (11, 0), (13, 0), (17, 0)],
    ),
    # Case 2: |---------------|
    #             |-------|
    #                          |-----------|
    (
        [
            [(0, 0), (1, 0), (2, 0), (4, 0), (5, 0), (7, 0), (8, 0), (9, 0),
             (11, 0), (13, 0), (17, 0)],
            [(3, 99), (5, 99), (6, 99), (7, 99), (8, 99), (9, 99)],
            [(14, 59), (15, 59), (17, 59), (20, 59), (21, 59), (22, 59)],
        ],
        [(0, 0), (1, 0), (2, 0), (3, 99), (4, 0), (5, 99), (6, 99), (7, 99),
         (8, 99), (9, 99), (11, 0), (13, 0), (14, 59), (15, 59), (17, 59),
         (20, 59), (21, 59), (22, 59)],
    ),
    # Case 3 (mint order: block1, block3, block2):
    # |----------|
    #        |---------|
    #                      |-----------|
    (
        [
            [(0, 0), (1, 0), (2, 0), (4, 0), (5, 0), (8, 0), (9, 0)],
            [(5, 99), (6, 99), (7, 99), (8, 99), (9, 99), (10, 99), (13, 99),
             (15, 99), (16, 99), (17, 99)],
            [(14, 59), (15, 59), (17, 59), (20, 59), (21, 59), (22, 59)],
        ],
        [(0, 0), (1, 0), (2, 0), (4, 0), (5, 99), (6, 99), (7, 99), (8, 99),
         (9, 99), (10, 99), (13, 99), (14, 59), (15, 59), (16, 99), (17, 59),
         (20, 59), (21, 59), (22, 59)],
    ),
    # Case 4 (mint order: block1, block3, block2):
    # |-------------------------|
    #     |----------------|
    #          |------|
    (
        [
            [(0, 0), (1, 0), (2, 0), (4, 0), (5, 0), (8, 0), (9, 0), (10, 0),
             (13, 0), (15, 0), (16, 0), (17, 0), (20, 0), (22, 0)],
            [(3, 99), (5, 99), (6, 99), (8, 99), (9, 99), (10, 99), (13, 99),
             (15, 99), (16, 99), (17, 99)],
            [(7, 59), (8, 59), (9, 59), (10, 59), (11, 59)],
        ],
        [(0, 0), (1, 0), (2, 0), (3, 99), (4, 0), (5, 99), (6, 99), (7, 59),
         (8, 59), (9, 59), (10, 59), (11, 59), (13, 99), (15, 99), (16, 99),
         (17, 99), (20, 0), (22, 0)],
    ),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_vertical_scenarios(spark, tmp_path, case):
    blocks, expected = CASES[case]
    db = DB.create(spark, str(tmp_path / f"v{case}"), block_width_ms=10)
    for blk in blocks:
        df = spark.createDataFrame(
            [({"a": "b"}, t, float(v)) for t, v in blk],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
        )
        db.append(df)
    assert db.overlapping_block_report()  # expOverlappingBlocks >= 1

    def got():
        return sorted(
            (r["t"], r["v"])
            for r in db.querier(0, 100).select([L.eq("a", "b")]).collect()
        )

    exp = [(t, float(v)) for t, v in expected]
    assert got() == exp, f"case {case}: read-time vertical dedup"
    db.compact(30)
    assert db.overlapping_block_report() == {}
    assert got() == exp, f"case {case}: post-compaction merge"
