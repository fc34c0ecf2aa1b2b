"""Randomized model-based e2e test — the TestDB_e2e pattern
(db_test.go:639-795): fixed label sets × random samples; an in-memory
oracle; selectors × random [mint, maxt] ranges checked for exact
equality of returned sample sets."""

import math
import random

import pytest
from pyspark.sql import functions as F

from tsdb_spark import labels as L
from tsdb_spark.db import DB

random.seed(42)

LABEL_SETS = [  # db_test.go:648-657 shape
    {"a": "b"},
    {"a": "b", "c": "d"},
    {"a": "c"},
    {"a": "b", "e": "f"},
    {"c": "d"},
    {"c": "d", "e": "f"},
    {"e": "f"},
    {"a": "c", "c": "d"},
]

N_PER_SERIES = 120


def canon(labels):
    return "{" + ",".join(f'{k}="{v}"' for k, v in sorted(labels.items())) + "}"


@pytest.fixture(scope="module")
def dataset():
    rows = []
    oracle = {}  # labels_str -> [(t, v)]
    for ls in LABEL_SETS:
        t = 0
        sams = []
        for _ in range(N_PER_SERIES):
            t += random.randint(1, 60_000)
            v = round(random.uniform(-100, 100), 3)
            sams.append((t, v))
        oracle[canon(ls)] = sams
        rows += [(ls, t, v) for (t, v) in sams]
    return rows, oracle


@pytest.fixture(scope="module")
def db(spark, dataset, tmp_path_factory):
    rows, _ = dataset
    path = str(tmp_path_factory.mktemp("e2edb"))
    db = DB.create(spark, path, block_width_ms=3_600_000)
    df = spark.createDataFrame(rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE")
    rep = db.append(df, report=True)
    assert rep.appended == len(rows)
    assert rep.new_series == len(LABEL_SETS)
    return db


SELECTORS = [  # db_test.go:687-691
    [L.eq("a", "b")],
    [L.re_match("a", "b|c")],
    [L.eq("a", "b"), L.eq("c", "d")],
    [L.neq("e", "")],
    [L.eq("c", "d"), L.eq("e", "")],
]


def expected_for(oracle, matchers, mint, maxt):
    import re

    def m_ok(ls_map, m):
        val = ls_map.get(m.name, "")
        if m.type == "=":
            return val == m.value
        if m.type == "!=":
            return val != m.value
        hit = re.match(f"^(?:{m.value})$", val) is not None
        return hit if m.type == "=~" else not hit

    out = set()
    for ls in LABEL_SETS:
        if all(m_ok(ls, m) for m in matchers):
            for t, v in oracle[canon(ls)]:
                if mint <= t <= maxt:
                    out.add((canon(ls), t, v))
    return out


@pytest.mark.slow
def test_db_e2e_random_ranges(db, dataset):
    _, oracle = dataset
    max_t = max(t for sams in oracle.values() for t, _ in sams)
    for matchers in SELECTORS:
        for _ in range(40):  # reference uses 1000; 40×5 selectors is plenty at CI scale
            mint = random.randint(0, max_t)
            maxt = mint + random.randint(0, max_t - mint)
            got = {
                (r["labels_str"], r["t"], r["v"])
                for r in db.querier(mint, maxt).select(matchers).collect()
            }
            want = expected_for(oracle, matchers, mint, maxt)
            assert got == want, f"matchers={matchers} range=[{mint},{maxt}]"


def test_label_enumeration(db):
    names = [r["name"] for r in db.label_names().collect()]
    assert names == ["a", "c", "e"]
    vals = [r["value"] for r in db.label_values("a").collect()]
    assert vals == ["b", "c"]


def test_select_sorted_order(db, dataset):
    _, oracle = dataset
    rows = db.querier(0, 10**15).select_sorted([L.eq("a", "b")]).collect()
    keys = [(r["labels_str"], r["t"]) for r in rows]
    assert keys == sorted(keys)


def test_block_stats(db, dataset):
    rows, _ = dataset
    stats = db.block_stats().collect()
    assert sum(r["num_samples"] for r in stats) == len(rows)
    for r in stats:
        assert r["t_bucket"] <= r["min_t"] <= r["max_t"] < r["t_bucket"] + 3_600_000


def test_nan_values_roundtrip(spark, tmp_path):
    # duplicate NaNs are valid samples (db_test.go:366); NaN must survive
    db = DB.create(spark, str(tmp_path / "nan"), block_width_ms=1000)
    df = spark.createDataFrame(
        [({"x": "1"}, 5, math.nan), ({"x": "1"}, 6, 1.0)],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
    )
    db.append(df)
    got = {r["t"]: r["v"] for r in db.querier(0, 100).select([L.eq("x", "1")]).collect()}
    assert math.isnan(got[5]) and got[6] == 1.0


def test_federated_select_later_store_wins(spark, tmp_path):
    from tsdb_spark.db import federated_select
    from tsdb_spark import eq

    rows = lambda vals: spark.createDataFrame(
        [({"m": "x", "site": s}, t, float(v)) for s, t, v in vals],
        "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
    )
    a = DB.create(spark, str(tmp_path / "a"), block_width_ms=100)
    a.append(rows([("1", 10, 1.0), ("1", 20, 2.0), ("2", 10, 9.0)]))
    b = DB.create(spark, str(tmp_path / "b"), block_width_ms=100)
    b.append(rows([("1", 20, 200.0), ("1", 30, 3.0)]))
    # store B deletes its t=30 sample; the delete must not leak to A
    b.delete(25, 35, [eq("m", "x")])

    out = {
        (r["labels_str"], r["t"]): r["v"]
        for r in federated_select([a, b], [eq("site", "1")], 0, 100).collect()
    }
    assert out == {
        ('{m="x",site="1"}', 10): 1.0,   # only in A
        ('{m="x",site="1"}', 20): 200.0, # overlap → B wins
        # t=30 tombstoned in B and absent from A → gone
    }
    # (dict equality above also proves the site=2 series was matcher-filtered)


def test_readonly_open_refuses_mutation(spark, tmp_path):
    db = DB.create(spark, str(tmp_path / "ro"), block_width_ms=100)
    db.append(
        spark.createDataFrame(
            [({"m": "x"}, 10, 1.0)], "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
        )
    )
    ro = DB.open_readonly(spark, str(tmp_path / "ro"))
    # the whole query surface works...
    assert ro.querier(0, 100).select([]).count() == 1
    assert ro.label_names().count() == 1
    # ...every mutation is refused (DBReadOnly analog, db.go:265-429)
    import pytest as _pytest

    for call in (
        lambda: ro.append(ro.samples()),
        lambda: ro.delete(0, 50, []),
        lambda: ro.compact(),
        lambda: ro.retain_after(50),
        lambda: ro.clean_tombstones(),
        lambda: ro.checkpoint(50),
        lambda: ro.vacuum(),
        lambda: ro.gc_series(),
    ):
        with _pytest.raises(PermissionError):
            call()
    # and the underlying store is untouched
    assert DB.open(spark, str(tmp_path / "ro")).samples().count() == 1


def test_block_boundary_parity(spark, tmp_path):
    """db_test.go:1343 TestChunkAtBlockBoundary + :1399
    TestQuerierWithBoundaryChunks, transcribed: data never spans bucket
    boundaries on disk, a boundary-timestamp sample lands in the bucket
    STARTING there, and a [W, 2W] query prunes to exactly two buckets."""
    import os

    import pyarrow.parquet as pq

    from tsdb_spark import eq
    from tsdb_spark.db import DB

    W = 3_600_000
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=W)
    rows = [({"foo": "bar"}, i * W + off, 0.0) for i in range(3) for off in (0, 1000)]
    db.append(
        spark.createDataFrame(rows, "labels MAP<STRING,STRING>, t LONG, v DOUBLE")
    )
    # on-disk containment: every file's t stays inside its bucket
    root = db._samples_path
    seen = set()
    for d in os.listdir(root):
        if not d.startswith("t_bucket="):
            continue
        lo = int(d.split("=")[1])
        seen.add(lo)
        for dirpath, _, files in os.walk(os.path.join(root, d)):
            for fn in files:
                if fn.endswith(".parquet"):
                    ts = pq.read_table(os.path.join(dirpath, fn), columns=["t"])["t"]
                    for t in ts.to_pylist():
                        assert lo <= t < lo + W, (lo, t)
    assert seen == {0, W, 2 * W}
    # the [W, 2W] closed-interval query touches exactly buckets {W, 2W}
    q = db.querier(W, 2 * W)
    touched = {
        r["t_bucket"]
        for r in q._pruned_samples().select("t_bucket").distinct().collect()
    }
    assert touched == {W, 2 * W}, touched
    got = sorted(r["t"] for r in q.select([eq("foo", "bar")]).select("t").collect())
    assert got == [W, W + 1000, 2 * W], got


def test_min_valid_time_refuses_covered_timestamps(spark, tmp_path):
    """db_test.go:2167 TestBlockRanges: a sample whose timestamp is
    covered by an already-persisted range must be refused when the
    caller enforces the reference's head contract (min_valid_time =
    last persisted maxt; the engine's default instead ACCEPTS it as a
    vertical overlap resolved at read — the documented deviation)."""
    from tsdb_spark import eq
    from tsdb_spark.db import DB

    W = 3_600_000
    db = DB.create(spark, str(tmp_path / "db"), block_width_ms=W)
    db.append(
        spark.createDataFrame(
            [({"a": "b"}, 3, 1.0)], "labels MAP<STRING,STRING>, t LONG, v DOUBLE"
        )
    )
    rep = db.append(
        spark.createDataFrame(
            [({"a": "b"}, 2, 9.0), ({"a": "b"}, 4, 2.0), ({"a": "b"}, 5, 3.0)],
            "labels MAP<STRING,STRING>, t LONG, v DOUBLE",
        ),
        min_valid_time=4,
        report=True,
    )
    assert rep.out_of_bounds_rejected == 1 and rep.appended == 2
    got = sorted((r["t"], r["v"]) for r in db.querier(0, 10).select([eq("a", "b")]).select("t", "v").collect())
    assert got == [(3, 1.0), (4, 2.0), (5, 3.0)], got
